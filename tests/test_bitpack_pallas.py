"""Pallas placement kernel vs the XLA scatter placement (interpret mode,
tiny shapes, runs on CPU so a Mosaic regression fails pytest, not just
bench.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from psxavenc_tpu.ops import bitpack
from psxavenc_tpu.ops import bitpack_pallas as bpk


def _random_frame_symbols(rng, nbe, s=65):
    bits = rng.integers(0, 23, (nbe, s)).astype(np.int32)
    bits[rng.random((nbe, s)) < 0.6] = 0
    bits = np.minimum(bits, 22)
    # Keep each block within the BCAP window (the fast path handles only
    # those; overflow falls back before the kernel is reached).
    while True:
        tot = bits.sum(axis=1)
        over = tot > 16 * bitpack.BLOCK_CAP_WORDS
        if not over.any():
            break
        bits[over, rng.integers(0, s)] = 0
    codes = np.zeros((nbe, s), np.uint32)
    mask = bits > 0
    codes[mask] = rng.integers(0, 1 << 30, mask.sum())
    codes[mask] &= (1 << bits[mask].astype(np.uint32)) - 1
    return codes, bits


@pytest.mark.parametrize("seed,nbe", [(0, 24), (1, 7), (2, 40)])
def test_place_streams_pallas_interpret(seed, nbe):
    rng = np.random.default_rng(seed)
    codes, bits = _random_frame_symbols(rng, nbe)
    offs = np.cumsum(bits, axis=1) - bits
    block_bits = bits.sum(axis=1)
    goff = np.cumsum(block_bits) - block_bits
    total = int(bits.sum())
    cap = (total + 15) // 16 + 4

    streams = bitpack._pack_block_streams(
        jnp.asarray(codes), jnp.asarray(bits), jnp.asarray(offs),
        bcap=bitpack.BLOCK_CAP_WORDS)
    want = bitpack._place_streams(streams, jnp.asarray(goff),
                                  capacity_words=cap)
    got = bpk.place_streams_pallas(
        streams[None].astype(jnp.int32),
        jnp.asarray(goff, jnp.int32)[None],
        jnp.asarray([total], jnp.int32),
        capacity_words=cap, interpret=True)[0]
    assert np.array_equal(np.asarray(got),
                          np.asarray(want).astype(np.int32)), \
        np.argwhere(np.asarray(got) != np.asarray(want))[:8]


def test_place_streams_pallas_word_aligned():
    """sh == 0 boundaries and an empty middle block."""
    nbe = 9
    bits = np.zeros((nbe, 65), np.int32)
    codes = np.zeros((nbe, 65), np.uint32)
    bits[:, 0] = 16
    codes[:, 0] = (np.arange(nbe) * 0x101 + 1).astype(np.uint32)
    bits[4, 0] = 0
    codes[4, 0] = 0
    offs = np.cumsum(bits, axis=1) - bits
    block_bits = bits.sum(axis=1)
    goff = np.cumsum(block_bits) - block_bits
    total = int(bits.sum())
    cap = (total + 15) // 16 + 2

    streams = bitpack._pack_block_streams(
        jnp.asarray(codes), jnp.asarray(bits), jnp.asarray(offs),
        bcap=bitpack.BLOCK_CAP_WORDS)
    want = bitpack._place_streams(streams, jnp.asarray(goff),
                                  capacity_words=cap)
    got = bpk.place_streams_pallas(
        streams[None].astype(jnp.int32),
        jnp.asarray(goff, jnp.int32)[None],
        jnp.asarray([total], jnp.int32),
        capacity_words=cap, interpret=True)[0]
    assert np.array_equal(np.asarray(got),
                          np.asarray(want).astype(np.int32))


@pytest.mark.parametrize("seed,nbe", [(4, 24), (5, 40)])
def test_pack_block_streams_pallas_interpret(seed, nbe):
    """Phase-1 kernel == the XLA per-block packer, streams + bit counts."""
    rng = np.random.default_rng(seed)
    codes, bits = _random_frame_symbols(rng, nbe)
    offs = np.cumsum(bits, axis=1) - bits
    want = np.asarray(bitpack._pack_block_streams(
        jnp.asarray(codes), jnp.asarray(bits), jnp.asarray(offs),
        bcap=bitpack.BLOCK_CAP_WORDS))
    got_s, got_b = bpk.pack_block_streams_pallas(
        jnp.asarray(codes)[None], jnp.asarray(bits)[None], interpret=True)
    assert np.array_equal(np.asarray(got_s)[0].astype(np.uint32), want)
    assert np.array_equal(np.asarray(got_b)[0], bits.sum(axis=1))


@pytest.mark.parametrize("seed,nbe", [(6, 24), (7, 120)])
def test_place_streams_gather_pallas_interpret(seed, nbe):
    """Gather-style placement == the XLA scatter placement."""
    rng = np.random.default_rng(seed)
    codes, bits = _random_frame_symbols(rng, nbe)
    offs = np.cumsum(bits, axis=1) - bits
    block_bits = bits.sum(axis=1)
    goff = np.cumsum(block_bits) - block_bits
    total = int(bits.sum())
    cap = (total + 15) // 16 + 4

    streams = bitpack._pack_block_streams(
        jnp.asarray(codes), jnp.asarray(bits), jnp.asarray(offs),
        bcap=bitpack.BLOCK_CAP_WORDS)
    want = bitpack._place_streams(streams, jnp.asarray(goff),
                                  capacity_words=cap)
    got = bpk.place_streams_gather_pallas(
        streams[None].astype(jnp.int32),
        jnp.asarray(goff, jnp.int32)[None],
        jnp.asarray([total], jnp.int32),
        capacity_words=cap, interpret=True)[0]
    assert np.array_equal(np.asarray(got),
                          np.asarray(want).astype(np.int32)), \
        np.argwhere(np.asarray(got) != np.asarray(want))[:8]


@pytest.mark.parametrize("seed,nbe", [(8, 24), (9, 120)])
def test_place_streams_mxu_pallas_interpret(seed, nbe):
    """MXU one-hot-matmul placement == the XLA scatter placement."""
    rng = np.random.default_rng(seed)
    codes, bits = _random_frame_symbols(rng, nbe)
    offs = np.cumsum(bits, axis=1) - bits
    block_bits = bits.sum(axis=1)
    goff = np.cumsum(block_bits) - block_bits
    total = int(bits.sum())
    cap = (total + 15) // 16 + 4

    streams = bitpack._pack_block_streams(
        jnp.asarray(codes), jnp.asarray(bits), jnp.asarray(offs),
        bcap=bitpack.BLOCK_CAP_WORDS)
    want = bitpack._place_streams(streams, jnp.asarray(goff),
                                  capacity_words=cap)
    got = bpk.place_streams_mxu_pallas(
        streams[None].astype(jnp.int32),
        jnp.asarray(goff, jnp.int32)[None],
        jnp.asarray([total], jnp.int32),
        capacity_words=cap, interpret=True)[0]
    assert np.array_equal(np.asarray(got),
                          np.asarray(want).astype(np.int32)), \
        np.argwhere(np.asarray(got) != np.asarray(want))[:8]
