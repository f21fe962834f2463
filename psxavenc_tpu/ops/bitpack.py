"""Device-side BS bitstream packing.

The reference packs Huffman codes on the CPU one symbol at a time
(mdec.c:321-385). TPU-native, two levels:

- ``pack_bits`` — the flat per-symbol scatter (each code spans at most
  three 16-bit words at its cumsum offset; disjoint bit ranges make
  add == or). Simple and always exact, but XLA scatter costs ~7 ns per
  scattered element, so it serves as the semantics reference and the
  universal fallback.
- ``pack_frames_blocks`` — the production path: symbols pack densely
  inside private 16-word per-block windows (pure vector ops, no
  scatter), then whole u32 word-pairs place at their final position
  (``_place_streams`` scatter here, or the Mosaic kernels in
  ops/bitpack_pallas.py). Falls back to ``pack_bits`` when any block
  stream exceeds its window.

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


BLOCK_CAP_WORDS = 16  # per-block stream capacity (256 bits); see pack_blocks


def _pack_block_streams(codes, bits, offs, *, bcap):
    """Dense per-block packing: (NBe, S) symbols -> (NBe, bcap) u16 streams.

    Every block's symbols land within a private bcap-word window, so the
    placement is a data-independent windowed shift/mask over the full
    (NBe, bcap) tile per symbol — no scatter. Word w of a block holds the
    in-block bits [16w, 16w+16), MSB-first like the reference's packer
    (mdec.c:321-333).
    """
    NBe, S = codes.shape
    ws = (jnp.arange(bcap, dtype=jnp.int32) << 4)[None, :]  # word bit start

    def body(i, acc):
        c = jax.lax.dynamic_index_in_dim(codes, i, 1, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(bits, i, 1, keepdims=False)
        o = jax.lax.dynamic_index_in_dim(offs, i, 1, keepdims=False)
        end = (o + b)[:, None]
        o = o[:, None]
        lo = jnp.maximum(o, ws)
        hi = jnp.minimum(end, ws + 16)
        n = hi - lo
        valid = n > 0
        rsh = jnp.clip(end - hi, 0, 31).astype(jnp.uint32)
        nb_ = jnp.clip(n, 0, 31).astype(jnp.uint32)
        chunk = (c.astype(jnp.uint32)[:, None] >> rsh) & \
            ((jnp.uint32(1) << nb_) - jnp.uint32(1))
        lsh = jnp.clip(ws + 16 - hi, 0, 31).astype(jnp.uint32)
        return acc | jnp.where(valid, chunk << lsh, jnp.uint32(0))

    # Carry init derived from a (possibly shard_map-varying) operand so
    # the loop is well-typed under manual axes.
    acc = jnp.zeros((NBe, bcap), jnp.uint32) + codes[:, :1] * 0
    return jax.lax.fori_loop(0, S, body, acc)


def _place_streams(streams, goff, *, capacity_words):
    """Word-granular ragged concat: per-block streams -> frame words.

    Each block's stream is bit-shifted by its global offset's sub-word part
    (dense vector ops), then its bcap+1 shifted words scatter-add at the
    word offset. Adjacent blocks share boundary words with bit-disjoint
    contributions, so add == or. Scatter elements per frame: NBe*(bcap+1),
    ~11x fewer than the per-symbol packer's 3 per symbol slot.
    """
    vals32, e0 = streams_to_u32(streams, goff)
    cap32 = (capacity_words + 1) // 2
    idx = e0[:, None] + jnp.arange(vals32.shape[1], dtype=jnp.int32)
    idx = jnp.minimum(idx, cap32)  # clip tail overhang to drop slot
    out32 = jnp.zeros((cap32,), jnp.uint32)
    out32 = out32.at[idx.reshape(-1)].add(vals32.reshape(-1), mode="drop")
    words = jnp.stack([out32 & 0xFFFF, out32 >> 16],
                      axis=-1).reshape(-1)
    return words[:capacity_words]


def streams_to_u32(streams, goff):
    """Per-block placed u32 values: bit-shift each block's BCAP-word
    stream to its global sub-word offset, even-align, and pack
    little-endian u16 pairs.

    This is THE definition of stream placement shared by the XLA u32
    scatter and the Mosaic gather kernel (they must stay bitwise
    identical). Works on (..., NBe, bcap) with any leading batch dims.

    Returns (vals32 (..., NBe, bcap//2 + 1) uint32, e0 (..., NBe) int32
    u32-granular offsets, monotone along the block axis).
    """
    bcap = streams.shape[-1]
    s = streams.astype(jnp.uint32)
    sh = (goff & 15).astype(jnp.uint32)[..., None]
    s_prev = jnp.concatenate(
        [jnp.zeros_like(s[..., :1]), s[..., :-1]], axis=-1)
    # Stream bits [16i-sh, 16(i+1)-sh) form contrib word i; sh == 0 makes
    # the uint32 `<< 16` term vanish under the & 0xFFFF mask.
    c_main = ((s >> sh) | ((s_prev << (16 - sh)) & 0xFFFF))
    c_tail = (s[..., -1:] << (16 - sh)) & 0xFFFF
    contrib = jnp.concatenate([c_main, c_tail], axis=-1)
    w0 = goff >> 4
    zcol = jnp.zeros_like(contrib[..., :1])
    shifted = jnp.where((w0 & 1).astype(bool)[..., None],
                        jnp.concatenate([zcol, contrib], axis=-1),
                        jnp.concatenate([contrib, zcol], axis=-1))
    pairs = shifted.reshape(shifted.shape[:-1] + ((bcap + 2) // 2, 2))
    vals32 = pairs[..., 0] | (pairs[..., 1] << 16)
    return vals32, (goff >> 5).astype(jnp.int32)


@partial(jax.jit, static_argnames=("capacity_words", "bcap",
                                   "pallas_place", "pallas_pack"))
def pack_frames_blocks(codes, bits, *, capacity_words,
                       bcap=BLOCK_CAP_WORDS, pallas_place=False,
                       pallas_pack=False):
    """Pack a batch of per-block symbol streams into frame bitstreams.

    TPU-native replacement for the flat per-symbol scatter: symbols pack
    densely inside fixed bcap-word per-block windows (pure vector ops),
    then whole 16-bit words move to their final position — either an XLA
    word scatter or, with ``pallas_place``, the Mosaic sliding-window
    placement kernel (ops/bitpack_pallas.py). Falls back to the exact
    flat scatter (``pack_bits``) for the rare batch with a block whose
    stream exceeds bcap*16 bits (possible within budget for a lone busy
    macroblock; mdec.c has no such limit).

    Args:
      codes: (B, NBe, S) uint32 right-aligned code values per block.
      bits: (B, NBe, S) int32 bit lengths (0 = skip).
      capacity_words: static output capacity in 16-bit words.

    Returns (words (B, capacity_words) int32, total_bits (B,)) exactly
    like :func:`pack_bits` vmapped over the flattened streams.
    """
    B, NBe, S = codes.shape
    codes = codes.astype(jnp.uint32)
    bits = bits.astype(jnp.int32)
    offs = jnp.cumsum(bits, axis=2) - bits
    block_bits = offs[:, :, -1] + bits[:, :, -1]          # (B, NBe)
    goff = jnp.cumsum(block_bits, axis=1) - block_bits
    total_bits = goff[:, -1] + block_bits[:, -1]
    overflow = jnp.any(block_bits > 16 * bcap)

    def fast(codes, bits, offs):
        if pallas_pack:
            from . import bitpack_pallas

            assert bcap == bitpack_pallas.BCAP
            streams, _ = bitpack_pallas.pack_block_streams_pallas(
                codes, bits)
            streams = streams.astype(jnp.uint32)
        else:
            streams = _pack_block_streams(
                codes.reshape(B * NBe, S), bits.reshape(B * NBe, S),
                offs.reshape(B * NBe, S), bcap=bcap).reshape(B, NBe, bcap)
        if pallas_place:
            from . import bitpack_pallas

            return bitpack_pallas.place_streams_pallas(
                streams, goff, total_bits,
                capacity_words=capacity_words).astype(jnp.uint32)
        return jax.vmap(
            lambda st, go: _place_streams(
                st, go, capacity_words=capacity_words))(streams, goff)

    def slow(codes, bits, offs):
        words, _ = jax.vmap(
            lambda c, b: pack_bits(c, b, capacity_words=capacity_words)
        )(codes.reshape(B, -1), bits.reshape(B, -1))
        return words.astype(jnp.uint32)

    words = jax.lax.cond(overflow, slow, fast, codes, bits, offs)
    return words.astype(jnp.int32), total_bits


def pack_bits_blocks(codes, bits, *, capacity_words,
                     bcap=BLOCK_CAP_WORDS):
    """Single-frame wrapper over :func:`pack_frames_blocks`."""
    words, total_bits = pack_frames_blocks(
        codes[None], bits[None], capacity_words=capacity_words, bcap=bcap)
    return words[0], total_bits[0]


def words_to_bytes(words):
    """(W,) u16-valued ints -> (2W,) uint8 little-endian pairs."""
    w = words.astype(jnp.uint32)
    lo = (w & 0xFF).astype(jnp.uint8)
    hi = ((w >> 8) & 0xFF).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=-1).reshape(-1)
