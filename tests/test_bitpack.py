"""Device bit packer vs the native C++ packer (which is itself validated
against the reference via whole-file golden tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from psxavenc_tpu import native
from psxavenc_tpu.ops import bitpack


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pack_matches_native(seed):
    rng = np.random.default_rng(seed)
    n = 5000
    bits = rng.integers(0, 23, n).astype(np.int32)
    bits[rng.random(n) < 0.3] = 0
    codes = np.zeros(n, np.uint32)
    mask = bits > 0
    codes[mask] = rng.integers(0, 1 << 30, mask.sum())
    codes[mask] &= (1 << bits[mask].astype(np.uint32)) - 1

    total = int(bits.sum())
    cap_words = (total + 15) // 16 + 4
    words, total_bits = bitpack.pack_bits(jnp.asarray(codes),
                                          jnp.asarray(bits),
                                          capacity_words=cap_words)
    assert int(total_bits) == total
    dev_bytes = np.asarray(bitpack.words_to_bytes(words))

    max_size = 8 + 2 * cap_words + 16
    used, buf = native.bs_pack(codes, bits.astype(np.uint8), max_size)
    assert used == 8 + 2 * ((total + 15) // 16)
    native_payload = buf[8:used]
    assert np.array_equal(dev_bytes[:used - 8], native_payload)


def _rand_block_symbols(rng, nbe, s, fat_rows=()):
    """Random (NBe, S) symbol streams shaped like real BS blocks."""
    bits = rng.integers(0, 23, (nbe, s)).astype(np.int32)
    bits[rng.random((nbe, s)) < 0.5] = 0
    for r in fat_rows:   # force a block past the bcap window
        bits[r, :] = 22
    codes = np.zeros((nbe, s), np.uint32)
    mask = bits > 0
    codes[mask] = rng.integers(0, 1 << 30, mask.sum())
    codes[mask] &= (1 << bits[mask].astype(np.uint32)) - 1
    return codes, bits


@pytest.mark.parametrize("seed,fat", [(0, ()), (1, ()), (2, (7,)),
                                      (3, (0, 19))])
def test_pack_blocks_matches_flat(seed, fat):
    """Block packer == flat per-symbol packer, incl. the overflow
    fallback path (fat rows exceed the 256-bit block window)."""
    rng = np.random.default_rng(seed)
    nbe, s = 20, 65
    codes, bits = _rand_block_symbols(rng, nbe, s, fat_rows=fat)
    total = int(bits.sum())
    cap_words = (total + 15) // 16 + 4
    w_ref, t_ref = bitpack.pack_bits(jnp.asarray(codes.reshape(-1)),
                                     jnp.asarray(bits.reshape(-1)),
                                     capacity_words=cap_words)
    w, t = bitpack.pack_bits_blocks(jnp.asarray(codes), jnp.asarray(bits),
                                    capacity_words=cap_words)
    assert int(t) == int(t_ref) == total
    assert np.array_equal(np.asarray(w), np.asarray(w_ref)), \
        np.argwhere(np.asarray(w) != np.asarray(w_ref))[:5]


def test_pack_blocks_word_aligned_boundaries():
    """Blocks whose streams end exactly on word boundaries (sh == 0)."""
    nbe, s = 8, 65
    bits = np.zeros((nbe, s), np.int32)
    codes = np.zeros((nbe, s), np.uint32)
    bits[:, 0] = 16
    codes[:, 0] = np.arange(1, nbe + 1, dtype=np.uint32) * 0x1111
    bits[:, 1] = 16
    codes[:, 1] = 0xBEEF
    cap_words = 2 * nbe + 2
    w_ref, _ = bitpack.pack_bits(jnp.asarray(codes.reshape(-1)),
                                 jnp.asarray(bits.reshape(-1)),
                                 capacity_words=cap_words)
    w, t = bitpack.pack_bits_blocks(jnp.asarray(codes), jnp.asarray(bits),
                                    capacity_words=cap_words)
    assert int(t) == 32 * nbe
    assert np.array_equal(np.asarray(w), np.asarray(w_ref))


def test_pack_empty():
    words, total = bitpack.pack_bits(jnp.zeros(4, jnp.uint32),
                                     jnp.zeros(4, jnp.int32),
                                     capacity_words=8)
    assert int(total) == 0
    assert np.all(np.asarray(words) == 0)