"""Device-side BS bitstream packing.

The reference packs Huffman codes on the CPU one symbol at a time
(mdec.c:321-385). TPU-native: with per-symbol bit lengths known, the bit
offset of every symbol is an exclusive cumsum, and each (code, offset)
lands in at most three 16-bit words — a scatter-add (no overlaps: distinct
symbols touch disjoint bit ranges, so add == or). The whole frame packs in
one fused pass and only the final bytes leave the device.

Bit order matches the reference exactly: 16-bit groups filled MSB-first,
stored as little-endian byte pairs starting after the 8-byte frame header.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("capacity_words",))
def pack_bits(codes, bits, *, capacity_words):
    """Pack a symbol stream into 16-bit words.

    Args:
      codes: (S,) uint32 code values (right-aligned, ``bits`` wide).
      bits: (S,) int32 bit lengths (0 = skip).
      capacity_words: static output capacity in 16-bit words.

    Returns:
      words: (capacity_words,) int32 with u16 payload values (word 0 is the
        first word after the frame header),
      total_bits: int32.
    """
    codes = codes.astype(jnp.uint32)
    bits = bits.astype(jnp.int32)
    offsets = jnp.cumsum(bits) - bits  # exclusive
    total_bits = offsets[-1] + bits[-1] if bits.shape[0] else jnp.int32(0)
    end = (offsets + bits).astype(jnp.int32)

    words = jnp.zeros((capacity_words,), jnp.uint32)
    w0 = offsets >> 4
    for part in range(3):
        w = w0 + part
        win_start = w << 4
        win_end = win_start + 16
        # Overlap of [offset, end) with this word's bit window.
        lo = jnp.maximum(offsets, win_start)
        hi = jnp.minimum(end, win_end)
        n = hi - lo
        valid = (n > 0) & (bits > 0)
        # Take the n bits of `code` whose global positions are [lo, hi):
        # code's LSB sits at global bit end-1.
        rsh = jnp.clip(end - hi, 0, 31).astype(jnp.uint32)
        nbits = jnp.clip(n, 0, 31).astype(jnp.uint32)
        chunk = (codes >> rsh) & ((jnp.uint32(1) << nbits) - jnp.uint32(1))
        # Place at the word's MSB-first position.
        lsh = jnp.clip(win_end - hi, 0, 31).astype(jnp.uint32)
        val = jnp.where(valid, chunk << lsh, jnp.uint32(0))
        idx = jnp.where(valid, w, capacity_words)  # drop out-of-range
        words = words.at[idx].add(val, mode="drop")
    return words.astype(jnp.int32), total_bits


def words_to_bytes(words):
    """(W,) u16-valued ints -> (2W,) uint8 little-endian pairs."""
    w = words.astype(jnp.uint32)
    lo = (w & 0xFF).astype(jnp.uint8)
    hi = ((w >> 8) & 0xFF).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=-1).reshape(-1)
