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


def test_pack_empty():
    words, total = bitpack.pack_bits(jnp.zeros(4, jnp.uint32),
                                     jnp.zeros(4, jnp.int32),
                                     capacity_words=8)
    assert int(total) == 0
    assert np.all(np.asarray(words) == 0)