"""JAX ADPCM kernel vs the scalar Python model (and C semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from psxavenc_tpu.ops import adpcm as ops
from tests.refmodel import adpcm as ref
from tests.conftest import rand_pcm


def _random_states(rng, n):
    # Decoded-sample state is always in int16 range.
    return [ref.ChannelState(int(rng.integers(-0x8000, 0x8000)),
                             int(rng.integers(-0x8000, 0x8000)))
            for _ in range(n)]


@pytest.mark.parametrize("filter_count,shift_range", [
    (ops.SPU_FILTER_COUNT, ops.SHIFT_RANGE_4BPS),
    (ops.XA_FILTER_COUNT, ops.SHIFT_RANGE_4BPS),
    (ops.XA_FILTER_COUNT, ops.SHIFT_RANGE_8BPS),
])
def test_encode_unit_matches_model(filter_count, shift_range):
    rng = np.random.default_rng(1)
    B, T = 16, 12
    samples = rand_pcm(B * T * 28, seed=2).reshape(B, T, 28).astype(np.int32)
    limits = np.full((B, T), 28, dtype=np.int32)
    # Exercise partial units (EOF tails) and fully-masked units.
    limits[0, -1] = 13
    limits[1, -1] = 0
    limits[2, -2:] = [5, -23]
    states = _random_states(rng, B)

    p1 = np.array([s.prev1 for s in states], dtype=np.int32)
    p2 = np.array([s.prev2 for s in states], dtype=np.int32)
    hdrs, nibs, fp1, fp2 = ops.encode_units_scan(
        jnp.asarray(samples), jnp.asarray(limits), jnp.asarray(p1),
        jnp.asarray(p2), filter_count=filter_count, shift_range=shift_range)
    hdrs, nibs = np.asarray(hdrs), np.asarray(nibs)
    # Per-unit states; the final state is at the last unit.
    fp1, fp2 = np.asarray(fp1)[:, -1], np.asarray(fp2)[:, -1]

    for b in range(B):
        st = states[b]
        for t in range(T):
            h, n = ref.encode(st, [int(v) for v in samples[b, t]],
                              int(limits[b, t]), 1, filter_count, shift_range)
            assert h == hdrs[b, t], (b, t)
            assert list(n) == list(nibs[b, t]), (b, t)
        assert st.prev1 == fp1[b]
        assert st.prev2 == fp2[b]


def test_model_spu_blocks_against_hand_values():
    # A silent block must produce header 0 (filter 0, shift 0 after search
    # finds min_shift 12 -> candidates 11,12 clipped; all-zero data has MSE 0
    # for every candidate, first wins: filter 0, shift 11).
    st = ref.ChannelState()
    hdr, nibs = ref.encode(st, [0] * 28, 28, 1, 5, 12)
    assert nibs == [0] * 28
    assert hdr == 0x0B  # shift 11 (= min_shift 12 - 1), filter 0


@pytest.mark.parametrize("filter_count,shift_range", [
    (ops.SPU_FILTER_COUNT, ops.SHIFT_RANGE_4BPS),
    (ops.XA_FILTER_COUNT, ops.SHIFT_RANGE_4BPS),
    (ops.XA_FILTER_COUNT, ops.SHIFT_RANGE_8BPS),
    (ops.SPU_FILTER_COUNT, ops.SHIFT_RANGE_8BPS),
])
def test_native_encoder_matches_scan(filter_count, shift_range):
    """The no-TPU fallback tier (psxn_adpcm_encode_units) is bit-exact
    with the JAX scan: headers, nibbles, and every per-unit state, over
    random units, partial/masked limits, and nonzero initial state."""
    from psxavenc_tpu import native

    rng = np.random.default_rng(7)
    B, T = 5, 61
    units = rng.integers(-0x8000, 0x8000, (B, T, 28)).astype(np.int16)
    limits = rng.integers(0, 29, (B, T)).astype(np.int32)
    limits[:, :2] = 28
    p1 = rng.integers(-0x8000, 0x8000, B).astype(np.int32)
    p2 = rng.integers(-0x8000, 0x8000, B).astype(np.int32)

    hn, vn, s1n, s2n = native.adpcm_encode_units(
        units, limits, p1, p2, filter_count, shift_range)
    hx, vx, s1x, s2x = ops.encode_units_scan(
        jnp.asarray(units, jnp.int32), jnp.asarray(limits),
        jnp.asarray(p1), jnp.asarray(p2), filter_count=filter_count,
        shift_range=shift_range)
    assert np.array_equal(hn, np.asarray(hx).astype(np.uint8))
    assert np.array_equal(vn, np.asarray(vx).astype(np.uint8))
    assert np.array_equal(s1n, np.asarray(s1x))
    assert np.array_equal(s2n, np.asarray(s2x))
