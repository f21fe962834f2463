"""Pallas ADPCM kernel vs the XLA reference kernel (bit-exact).

Interpreter-mode Pallas compiles take many minutes for this kernel, so the
CPU suite skips it; the compiled kernel is validated bit-for-bit on real
TPU by bench.py (_validate_pallas) on every benchmark run, across all
three (filter_count, shift_range) variants.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psxavenc_tpu.ops import adpcm as ops
from psxavenc_tpu.ops import adpcm_pallas as pk
from tests.conftest import rand_pcm


@pytest.mark.slow
@pytest.mark.parametrize("shift_range", [12, 8])
def test_pallas_interpret_matches_xla(shift_range):
    """CPU-CI coverage for the Mosaic ADPCM kernel: interpret mode with a
    reduced candidate unroll (filter_count=2 — the same kernel code path,
    fewer statically-unrolled candidates; the full fc=5 interpret compile
    takes ~8 minutes, fc=2 ~40s). Both shift ranges run (4-bit XA/SPU and
    8-bit XA pack/clip paths). The production (5,12)/(4,12)/(4,8)
    variants are compiled and cross-checked on real TPU by bench.py's
    _validate_pallas on every benchmark run."""
    B, T = 128, 2
    samples = rand_pcm(B * T * 28, seed=78).reshape(B, T, 28).astype(
        np.int32)
    limits = np.full((B, T), 28, np.int32)
    limits[0, -1] = 11
    limits[1, -1] = 0
    rng = np.random.default_rng(1)
    p1 = rng.integers(-0x8000, 0x8000, B).astype(np.int32)
    p2 = rng.integers(-0x8000, 0x8000, B).astype(np.int32)
    args = (jnp.asarray(samples), jnp.asarray(limits), jnp.asarray(p1),
            jnp.asarray(p2))
    h_ref, nib_ref, s1_ref, s2_ref = ops.encode_units_scan(
        *args, filter_count=2, shift_range=shift_range)
    h, words, s1, s2 = pk.encode_units_pallas(
        *args, filter_count=2, shift_range=shift_range, interpret=True)
    assert np.array_equal(np.asarray(h), np.asarray(h_ref))
    assert np.array_equal(np.asarray(s1), np.asarray(s1_ref))
    assert np.array_equal(np.asarray(s2), np.asarray(s2_ref))
    w = np.asarray(words).astype(np.uint32)
    vbits = 4 if shift_range == 12 else 8
    per_word = 32 // vbits
    mask = (1 << vbits) - 1
    vals = np.zeros((B, T, 28), np.uint32)
    for k in range(w.shape[2]):
        for m in range(per_word):
            idx = per_word * k + m
            if idx < 28:
                vals[:, :, idx] = (w[:, :, k] >> (vbits * m)) & mask
    assert np.array_equal(vals & mask,
                          np.asarray(nib_ref).astype(np.uint32) & mask)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="compiled Pallas needs a TPU; interpreter mode "
                           "takes minutes")
@pytest.mark.parametrize("filter_count,shift_range", [
    (5, 12), (4, 12), (4, 8),
])
def test_pallas_matches_xla(filter_count, shift_range):
    B, T = 128, 4
    samples = rand_pcm(B * T * 28, seed=77).reshape(B, T, 28).astype(
        np.int32)
    limits = np.full((B, T), 28, np.int32)
    limits[0, -1] = 11
    limits[1, -1] = 0
    rng = np.random.default_rng(0)
    p1 = rng.integers(-0x8000, 0x8000, B).astype(np.int32)
    p2 = rng.integers(-0x8000, 0x8000, B).astype(np.int32)
    args = (jnp.asarray(samples), jnp.asarray(limits), jnp.asarray(p1),
            jnp.asarray(p2))

    h_ref, nib_ref, s1_ref, s2_ref = ops.encode_units_scan(
        *args, filter_count=filter_count, shift_range=shift_range)
    h_pal, words, s1, s2 = pk.encode_units_pallas(
        *args, filter_count=filter_count, shift_range=shift_range)

    assert np.array_equal(np.asarray(h_pal), np.asarray(h_ref))
    assert np.array_equal(np.asarray(s1), np.asarray(s1_ref))
    assert np.array_equal(np.asarray(s2), np.asarray(s2_ref))
    w = np.asarray(words).astype(np.uint32)
    vbits = 4 if shift_range == 12 else 8
    per_word = 32 // vbits
    vals = np.zeros((B, T, 28), np.uint32)
    for k in range(w.shape[2]):
        for m in range(per_word):
            idx = per_word * k + m
            if idx < 28:
                vals[:, :, idx] = (w[:, :, k] >> (vbits * m)) & \
                    ((1 << vbits) - 1)
    mask = 0xFFFF >> shift_range
    assert np.array_equal(vals & mask,
                          np.asarray(nib_ref).astype(np.uint32) & mask)