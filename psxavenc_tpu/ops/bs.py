"""MDEC BS frame encoding ops: quantize, zigzag run-length, Huffman sizing.

The reference (psxavenc/mdec.c:580-755) finds the quantization scale by
re-encoding the whole frame at scale 1, 2, ... until the bitstream fits the
frame budget. TPU-native formulation: cost whole batches of
frames at many scales at once — exact Huffman bit lengths in closed form
(no table gathers on the hot path), scales evaluated 8 at a time with an
early exit once every frame fits — and select the first fitting scale,
provably the same choice as the serial retry loop. Only the winning
scale's symbols leave the device.

Bit/byte accounting matches mdec.c exactly:
- DIVIDE_ROUNDED is round-half-away-from-zero (mdec.c:434-439), implemented
  in exact integer arithmetic (sign(n) * ((|n| + d/2) // d)).
- Coefficients clamp to [-0x200, +0x1FE] after int16 wrap (mdec.c:257-267).
- A frame fits iff 8 + 2*ceil(total_bits/16) <= frame_max_size, which is
  exactly when the reference's incremental packer never trips its bail-out
  (flush k starts at byte 8+2(k-1) and fails when that +1 >= max,
  mdec.c:321-333).

Huffman table data is the PSX MDEC code set (run/level AC codes, DC delta
codes for BS v3) as published in the MDEC format documentation; see
mdec.c:39-222 for the reference's copy of the same constants.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- constants

# PSX default quantization matrix (mdec.c:189-198).
QUANT_PSX = np.array([
    2, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83,
], dtype=np.int32)

# Inverse zigzag: scan position -> row-major block index (mdec.c:213-222).
ZAGZIG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# MDEC AC Huffman code set: (run, |level|) -> (prefix_bits, prefix_value).
# One trailing sign bit follows each prefix. (mdec.c:39-157 carries the
# same table.)
AC_TABLE = {
    (0, 1): (2, 0x3), (1, 1): (3, 0x3), (0, 2): (4, 0x4), (2, 1): (4, 0x5),
    (0, 3): (5, 0x05), (4, 1): (5, 0x06), (3, 1): (5, 0x07),
    (7, 1): (6, 0x04), (6, 1): (6, 0x05), (1, 2): (6, 0x06),
    (5, 1): (6, 0x07),
    (2, 2): (7, 0x04), (9, 1): (7, 0x05), (0, 4): (7, 0x06),
    (8, 1): (7, 0x07),
    (13, 1): (8, 0x20), (0, 6): (8, 0x21), (12, 1): (8, 0x22),
    (11, 1): (8, 0x23), (3, 2): (8, 0x24), (1, 3): (8, 0x25),
    (0, 5): (8, 0x26), (10, 1): (8, 0x27),
    (16, 1): (10, 0x008), (5, 2): (10, 0x009), (0, 7): (10, 0x00A),
    (2, 3): (10, 0x00B), (1, 4): (10, 0x00C), (15, 1): (10, 0x00D),
    (14, 1): (10, 0x00E), (4, 2): (10, 0x00F),
    (0, 11): (12, 0x010), (8, 2): (12, 0x011), (4, 3): (12, 0x012),
    (0, 10): (12, 0x013), (2, 4): (12, 0x014), (7, 2): (12, 0x015),
    (21, 1): (12, 0x016), (20, 1): (12, 0x017), (0, 9): (12, 0x018),
    (19, 1): (12, 0x019), (18, 1): (12, 0x01A), (1, 5): (12, 0x01B),
    (3, 3): (12, 0x01C), (0, 8): (12, 0x01D), (6, 2): (12, 0x01E),
    (17, 1): (12, 0x01F),
    (10, 2): (13, 0x0010), (9, 2): (13, 0x0011), (5, 3): (13, 0x0012),
    (3, 4): (13, 0x0013), (2, 5): (13, 0x0014), (1, 7): (13, 0x0015),
    (1, 6): (13, 0x0016), (0, 15): (13, 0x0017), (0, 14): (13, 0x0018),
    (0, 13): (13, 0x0019), (0, 12): (13, 0x001A), (26, 1): (13, 0x001B),
    (25, 1): (13, 0x001C), (24, 1): (13, 0x001D), (23, 1): (13, 0x001E),
    (22, 1): (13, 0x001F),
    (0, 31): (14, 0x0010), (0, 30): (14, 0x0011), (0, 29): (14, 0x0012),
    (0, 28): (14, 0x0013), (0, 27): (14, 0x0014), (0, 26): (14, 0x0015),
    (0, 25): (14, 0x0016), (0, 24): (14, 0x0017), (0, 23): (14, 0x0018),
    (0, 22): (14, 0x0019), (0, 21): (14, 0x001A), (0, 20): (14, 0x001B),
    (0, 19): (14, 0x001C), (0, 18): (14, 0x001D), (0, 17): (14, 0x001E),
    (0, 16): (14, 0x001F),
    (0, 40): (15, 0x0010), (0, 39): (15, 0x0011), (0, 38): (15, 0x0012),
    (0, 37): (15, 0x0013), (0, 36): (15, 0x0014), (0, 35): (15, 0x0015),
    (0, 34): (15, 0x0016), (0, 33): (15, 0x0017), (0, 32): (15, 0x0018),
    (1, 14): (15, 0x0019), (1, 13): (15, 0x001A), (1, 12): (15, 0x001B),
    (1, 11): (15, 0x001C), (1, 10): (15, 0x001D), (1, 9): (15, 0x001E),
    (1, 8): (15, 0x001F),
    (1, 18): (16, 0x0010), (1, 17): (16, 0x0011), (1, 16): (16, 0x0012),
    (1, 15): (16, 0x0013), (6, 3): (16, 0x0014), (16, 2): (16, 0x0015),
    (15, 2): (16, 0x0016), (14, 2): (16, 0x0017), (13, 2): (16, 0x0018),
    (12, 2): (16, 0x0019), (11, 2): (16, 0x001A), (31, 1): (16, 0x001B),
    (30, 1): (16, 0x001C), (29, 1): (16, 0x001D), (28, 1): (16, 0x001E),
    (27, 1): (16, 0x001F),
}

# DC delta prefix codes for BS v3 (mdec.c:159-187): chroma and luma trees,
# (prefix_bits, prefix_value, delta_bits).
DC_C_TABLE = [(2, 0x1, 0), (2, 0x2, 1), (3, 0x6, 2), (4, 0xE, 3),
              (5, 0x1E, 4), (6, 0x3E, 5), (7, 0x7E, 6), (8, 0xFE, 7)]
DC_Y_TABLE = [(2, 0x0, 0), (2, 0x1, 1), (3, 0x5, 2), (3, 0x6, 3),
              (4, 0xE, 4), (5, 0x1E, 5), (6, 0x3E, 6), (7, 0x7E, 7)]

INDEX_CR, INDEX_CB, INDEX_Y = 0, 1, 2

BS_V2, BS_V3, BS_V3DC = 0, 1, 2


def _build_ac_luts():
    """64K-entry (bits, code) LUTs keyed by (run<<10)|(level&0x3FF)
    (mdec.c:256-284). Default entry = 22-bit escape 0b000001 + raw 16."""
    bits = np.full(0x10000, 22, dtype=np.int32)
    code = ((1 << 16) | np.arange(0x10000, dtype=np.int64)).astype(np.uint32)
    for (run, level), (c_bits, c_value) in AC_TABLE.items():
        for sign, val in ((0, level), (1, -level)):
            key = (run << 10) | (val & 0x3FF)
            bits[key] = c_bits + 1
            code[key] = (c_value << 1) | sign
    return bits, code


def _build_dc_luts():
    """(3, 512) (bits, code) LUTs keyed by delta & 0x1FF per block type
    (mdec.c:270-318). The one unmapped key (delta -256, reference UB:
    reads uninitialized memory; reachable only from pathological
    alternating +-512 DC content under BS v3) deterministically reuses
    delta -255's widest negative code."""
    bits = np.zeros((3, 512), dtype=np.int32)
    code = np.zeros((3, 512), dtype=np.uint32)
    specials = {INDEX_CR: (2, 0x0), INDEX_CB: (2, 0x0), INDEX_Y: (3, 0x4)}
    for idx in range(3):
        b, c = specials[idx]
        bits[idx, 0] = b
        code[idx, 0] = c
        table = DC_Y_TABLE if idx == INDEX_Y else DC_C_TABLE
        for c_bits, c_value, dc_bits in table:
            n_bits = c_bits + 1 + dc_bits
            pos_offset = 1 << dc_bits
            neg_offset = pos_offset * 2 - 1
            for j in range(1 << dc_bits):
                pos = (j + pos_offset) & 0x1FF
                neg = (j - neg_offset) & 0x1FF
                bits[idx, pos] = n_bits
                code[idx, pos] = (c_value << (dc_bits + 1)) | \
                    (1 << dc_bits) | j
                bits[idx, neg] = n_bits
                code[idx, neg] = (c_value << (dc_bits + 1)) | j
        bits[idx, 256] = bits[idx, 257]     # delta -256 -> -255's code
        code[idx, 256] = code[idx, 257]
    return bits, code


AC_BITS_LUT, AC_CODE_LUT = _build_ac_luts()
DC_BITS_LUT, DC_CODE_LUT = _build_dc_luts()

# Clamp map: int16 wrap then clamp to [-0x200, +0x1FE] (mdec.c:257-267).


def _clamp_coeff(q):
    w = ((q & 0xFFFF) ^ 0x8000) - 0x8000  # int16 reinterpretation
    return jnp.clip(w, -0x200, 0x1FE)


def _div_rounded(n, d):
    """round(n/d) half away from zero, exact integers (mdec.c:438)."""
    an = jnp.abs(n)
    q = (an + (d >> 1)) // d
    return jnp.where(n < 0, -q, q)


def ac_bits_closed_form(run, mag):
    """AC Huffman code length as arithmetic on (run, |level|).

    TPU gathers from the 64K LUT dominate the scale sweep (~75x the rest of
    the compute), so the bit-length function — all the sweep needs — is
    expressed as a closed-form step function over the MDEC code table
    instead: ~50 VPU compare/add ops, no memory traffic. Verified
    exhaustively against the LUT in tests/test_bs_ops.py. Escape codes
    (anything outside the table) are 6+16 = 22 bits (mdec.c:258).
    """
    r = run
    a = mag

    def ge(x, t):
        return (x >= t).astype(jnp.int32)

    b1 = (3 + ge(r, 1) + ge(r, 2) + ge(r, 3) + ge(r, 5) + ge(r, 8)
          + ge(r, 10) + 2 * ge(r, 14) + 2 * ge(r, 17) + ge(r, 22)
          + 3 * ge(r, 27))
    b1 = jnp.where(r > 31, 22, b1)
    b2 = (5 + 2 * ge(r, 1) + ge(r, 2) + ge(r, 3) + 2 * ge(r, 4)
          + 2 * ge(r, 6) + ge(r, 9) + 3 * ge(r, 11))
    b2 = jnp.where(r > 16, 22, b2)
    b3 = 6 + 3 * ge(r, 1) + 2 * ge(r, 2) + 2 * ge(r, 3) + ge(r, 5) \
        + 3 * ge(r, 6)
    b3 = jnp.where(r > 6, 22, b3)
    b4 = jnp.where(r > 3, 22, 8 + 3 * ge(r, 1) + 2 * ge(r, 2) + ge(r, 3))
    b5 = jnp.where(r > 2, 22, 9 + 4 * ge(r, 1) + ge(r, 2))
    b6 = jnp.where(r > 1, 22, 9 + 5 * ge(r, 1))
    b7 = jnp.where(r > 1, 22, 11 + 3 * ge(r, 1))
    big0 = jnp.where(a <= 40, 13 + ge(a, 12) + ge(a, 16) + ge(a, 32), 22)
    big1 = jnp.where(a <= 18, 16 + ge(a, 15), 22)
    big = jnp.where(r == 0, big0, jnp.where(r == 1, big1, 22))

    bits = jnp.where(
        a == 1, b1, jnp.where(
            a == 2, b2, jnp.where(
                a == 3, b3, jnp.where(
                    a == 4, b4, jnp.where(
                        a == 5, b5, jnp.where(
                            a == 6, b6, jnp.where(a == 7, b7, big)))))))
    return bits


# Closed-form AC code constants: per magnitude class, the prefix values are
# piecewise linear in run (or, for the run-0/1 families, in |level|) with a
# handful of irregular low indices. The irregular constants are 6-bit values
# packed 5 per int32 word so extraction is a couple of compares plus one
# variable shift instead of a gather. Derived from AC_TABLE and verified
# exhaustively against AC_CODE_LUT in tests/test_bs_ops.py.
_ACC_W1 = (0x61C50C3, 0x51C4147, 0xE8228E7, 0x1969F20D, 0x597)   # a=1, r<22
_ACC_W2 = (0xF904184, 0x11455789, 0x10)                          # a=2, r<11
_ACC_W37 = (0x1270B945, 0x14306512, 0x2151B993, 0x15296)  # a=3..7 packed
_ACC_W8 = (0x41361D,)                                     # r=0, a=8..11


def _packed6(words, idx):
    """Extract 6-bit constant #idx from int32 words holding 5 values each."""
    w = idx // 5
    sh = (idx % 5) * 6
    acc = jnp.zeros_like(idx)
    for wi, cw in enumerate(words):
        acc = jnp.where(w == wi, jnp.int32(cw), acc)
    return (acc >> sh) & 0x3F


def _pack10(vals):
    """Pack 10-bit values 3 per int32 word (see :func:`_packed10`)."""
    words = []
    for i in range(0, len(vals), 3):
        w = 0
        for j, v in enumerate(vals[i:i + 3]):
            assert 0 <= v < 1 << 10
            w |= int(v) << (10 * j)
        words.append(w)
    return tuple(words)


def _combo10(r, a):
    """(prefix<<4 | bits-3) combo for a table entry — prefix is 6 bits,
    total code length (prefix+sign) is 3..17 so bits-3 fits 4 bits."""
    c_bits, c_value = AC_TABLE[(r, a)]
    return (c_value << 4) | (c_bits + 1 - 3)


# Fused (bits, code) constants for the emission path: the per-class
# prefix AND length ride one packed word, so the emitter's class
# where-chain runs once instead of once for bits and once for codes.
# Generated from AC_TABLE at import; verified exhaustively against
# AC_BITS_LUT/AC_CODE_LUT in tests/test_bs_ops.py.
_ACBC_W1 = _pack10([_combo10(r, 1) for r in range(22)])
_ACBC_W2 = _pack10([_combo10(r, 2) for r in range(11)])
_ACBC_W37 = _pack10([_combo10(r, a)
                     for a, rmax in ((3, 6), (4, 3), (5, 2), (6, 1),
                                     (7, 1))
                     for r in range(rmax + 1)])
_ESC10 = 0x7FFF                      # unrepresentable combo = escape


def _packed10(words, idx):
    """Extract 10-bit constant #idx from int32 words holding 3 each."""
    w = idx // 3
    sh = (idx % 3) * 10
    acc = jnp.zeros_like(idx)
    for wi, cw in enumerate(words):
        acc = jnp.where(w == wi, jnp.int32(cw), acc)
    return (acc >> sh) & 0x3FF


def ac_bits_code_closed_form(run, ac):
    """Fused AC Huffman (bits, code) for winner emission: ONE magnitude-
    class where-chain yields a packed (prefix<<4 | bits-3) combo, then
    bits/code unpack from it — ~30% fewer VPU ops than running
    :func:`ac_bits_closed_form` and :func:`ac_code_closed_form`
    separately (their class chains and per-class selectors are
    duplicates). Matches both LUTs exhaustively (tests/test_bs_ops.py).
    """
    r = run
    a = jnp.abs(ac)
    sign = (ac < 0).astype(jnp.uint32)

    # a == 1: runs 0..21 packed; 22..26 and 27..31 are linear prefix
    # ramps at 14 and 17 total bits; longer runs escape.
    c1 = jnp.where(
        r < 22, _packed10(_ACBC_W1, jnp.minimum(r, 21)),
        jnp.where(r < 27, ((0x1F - (r - 22)) << 4) | (14 - 3),
                  ((0x1F - (r - 27)) << 4) | (17 - 3)))
    c1 = jnp.where(r > 31, _ESC10, c1)
    # a == 2: runs 0..10 packed; 11..16 linear at 17 bits.
    c2 = jnp.where(r < 11, _packed10(_ACBC_W2, jnp.minimum(r, 10)),
                   ((0x1A - (r - 11)) << 4) | (17 - 3))
    c2 = jnp.where(r > 16, _ESC10, c2)
    # a == 3..7: 18 packed combos addressed by per-class offset + run.
    off37 = jnp.where(a == 3, 0, jnp.where(a == 4, 7, jnp.where(
        a == 5, 11, jnp.where(a == 6, 14, 16))))
    rmax37 = jnp.where(a == 3, 6, jnp.where(a == 4, 3,
                                            jnp.where(a == 5, 2, 1)))
    c37 = _packed10(_ACBC_W37, jnp.clip(off37 + r, 0, 17))
    c37 = jnp.where(r > rmax37, _ESC10, c37)
    # a >= 8: run-0/1 families, linear prefix ramps (same shapes as
    # ac_code_closed_form's p8r0/p8r1 with the length ramps of
    # ac_bits_closed_form's big0/big1 folded in).
    p8r0 = jnp.where(a < 12, _packed6(_ACC_W8, jnp.clip(a - 8, 0, 3)),
                     jnp.where(a < 16, 0x1A - (a - 12),
                               jnp.where(a < 32, 0x1F - (a - 16),
                                         0x18 - (a - 32))))
    b8r0 = 13 + (a >= 12).astype(jnp.int32) + (a >= 16) + (a >= 32)
    p8r1 = jnp.where(a < 15, 0x1F - (a - 8), 0x13 - (a - 15))
    b8r1 = 16 + (a >= 15).astype(jnp.int32)
    c8 = jnp.where(r == 0, (p8r0 << 4) | (b8r0 - 3),
                   (p8r1 << 4) | (b8r1 - 3))
    # Pure boolean algebra (a where over mixed weak-bool branches lowers
    # to an i8->i1 trunci Mosaic rejects).
    esc8 = (((r == 0) & (a > 40)) | ((r == 1) & (a > 18)) | (r > 1))
    c8 = jnp.where(esc8, _ESC10, c8)

    combo = jnp.where(a == 1, c1, jnp.where(a == 2, c2,
                      jnp.where(a <= 7, c37, c8)))
    is_esc = combo == _ESC10
    bits = jnp.where(is_esc, 22, (combo & 0xF) + 3)
    prefix = (combo >> 4).astype(jnp.uint32)
    escape = jnp.uint32(1 << 16) | (
        ((r << 10) | (ac & 0x3FF)).astype(jnp.uint32))
    code = jnp.where(is_esc, escape, (prefix << 1) | sign)
    return bits, code


def ac_code_closed_form(run, ac, bits):
    """AC Huffman code value as arithmetic on (run, level) — the emission
    analog of :func:`ac_bits_closed_form` (no 64K-LUT gather on the winner
    pass). ``bits`` is the closed-form bit length (22 = escape). Matches
    AC_CODE_LUT exhaustively (tests/test_bs_ops.py)."""
    r = run
    a = jnp.abs(ac)
    sign = (ac < 0).astype(jnp.uint32)

    p1 = jnp.where(r < 22, _packed6(_ACC_W1, jnp.minimum(r, 21)),
                   jnp.where(r < 27, 0x1F - (r - 22), 0x1F - (r - 27)))
    p2 = jnp.where(r < 11, _packed6(_ACC_W2, jnp.minimum(r, 10)),
                   0x1A - (r - 11))
    off37 = jnp.where(a == 3, 0, jnp.where(a == 4, 7, jnp.where(
        a == 5, 11, jnp.where(a == 6, 14, 16))))
    p37 = _packed6(_ACC_W37, jnp.clip(off37 + r, 0, 17))
    p8r0 = jnp.where(a < 12, _packed6(_ACC_W8, jnp.clip(a - 8, 0, 3)),
                     jnp.where(a < 16, 0x1A - (a - 12),
                               jnp.where(a < 32, 0x1F - (a - 16),
                                         0x18 - (a - 32))))
    p8r1 = jnp.where(a < 15, 0x1F - (a - 8), 0x13 - (a - 15))
    p8 = jnp.where(r == 0, p8r0, p8r1)
    prefix = jnp.where(a == 1, p1, jnp.where(a == 2, p2,
                       jnp.where(a <= 7, p37, p8))).astype(jnp.uint32)

    escape = jnp.uint32(1 << 16) | (
        ((r << 10) | (ac & 0x3FF)).astype(jnp.uint32))
    return jnp.where(bits == 22, escape, (prefix << 1) | sign)


def dc_bits_code_closed_form(types, keys):
    """BS v3 DC-delta Huffman (bits, code) as arithmetic on the 9-bit
    delta key — the DC analog of :func:`ac_bits_closed_form`: the
    (3, 512)-LUT gathers it replaces were ~2.6 ms of a 64-frame batch on
    TPU (gathers dominate; the table structure is magnitude-class coded,
    mdec.c:159-187). Matches DC_BITS_LUT/DC_CODE_LUT exhaustively over
    every (type, key), incl. the unmapped delta -256 (-> -255's code)
    — tests/test_bs_ops.py.

    types: 0/1 = chroma (Cr/Cb share a tree), 2 = luma.
    """
    sd = ((keys & 0x1FF) ^ 0x100) - 0x100        # sign-extend 9-bit
    sd = jnp.maximum(sd, -255)                   # unmapped -256 -> -255
    mag = jnp.abs(sd)
    db = ((mag >= 2).astype(jnp.int32) + (mag >= 4) + (mag >= 8)
          + (mag >= 16) + (mag >= 32) + (mag >= 64) + (mag >= 128))
    is_y = types == INDEX_Y

    bits_c = jnp.where(db == 0, 3, 2 * db + 2)
    bits = jnp.where(is_y & (db >= 3), 2 * db + 1, bits_c)
    bits = jnp.where(mag == 0, jnp.where(is_y, 3, 2), bits)

    pv_c = jnp.where(db == 0, 1, (1 << (db + 1)) - 2)
    pv_y = jnp.where(db >= 4, (1 << db) - 2,
                     jnp.where(db == 3, 6, jnp.where(db == 2, 5, db)))
    pv = jnp.where(is_y, pv_y, pv_c)
    mask = (1 << (db + 1)) - 1
    suffix = jnp.where(sd > 0, sd & mask, (sd - 1) & mask)
    code = (pv << (db + 1)) | suffix
    code = jnp.where(mag == 0, jnp.where(is_y, 4, 0), code)
    return bits, code.astype(jnp.uint32)


def dc_chain(dc, codec):
    """BS v3/v3dc DC delta chain (mdec.c:455-480). ``dc`` is the clamped
    quantized DC per block in encode order; returns delta & 0x1FF keys.

    Scale-independent (DC quant is always 8*quant[0]), so computed once per
    frame. Reference semantics: per block type (Cr/Cb/Y), delta =
    round_half_away((dc - last)/4), last += 4*delta.

    Log-depth formulation: ``last`` stays a multiple of 4, so each block's
    update is ``last' = f(last)`` where f is a *threshold function* —
    a constant when dc % 4 != 2, and (last < dc ? dc+2 : dc-2) on the exact
    half (dc % 4 == 2). Threshold functions are closed under composition,
    so the three interleaved chains run as associative scans instead of an
    NB-step sequential scan. Verified against the sequential reference
    model in tests/test_bs_ops.py.
    """
    nb = dc.shape[0]
    mb = nb // 6
    types = jnp.minimum(jnp.arange(nb, dtype=jnp.int32) % 6, 2)

    grid = dc.reshape(mb, 6)
    cr = grid[:, 0]
    cb = grid[:, 1]
    y = grid[:, 2:].reshape(-1)
    pad = 4 * mb
    neg_inf = jnp.int32(-(1 << 31) + 1)

    def elems(d, n):
        r = d & 3
        const = jnp.where(r == 0, d, jnp.where(r == 1, d - 1, d + 1))
        t = jnp.where(r == 2, d, neg_inf)
        a = jnp.where(r == 2, d + 2, const)
        b = jnp.where(r == 2, d - 2, const)
        z = jnp.zeros(pad - n, jnp.int32)
        # End-padding with constant elements does not disturb prefixes.
        return (jnp.concatenate([t, neg_inf + z]),
                jnp.concatenate([a, z]), jnp.concatenate([b, z]))

    t3, a3, b3 = (jnp.stack(v) for v in zip(elems(cr, mb), elems(cb, mb),
                                            elems(y, 4 * mb)))

    def compose(p, q):
        # apply p first, then q: q(p(x)) as a threshold function of x.
        tp, ap, bp = p
        tq, aq, bq = q
        return (tp, jnp.where(ap < tq, aq, bq), jnp.where(bp < tq, aq, bq))

    tt, ta, tb = jax.lax.associative_scan(compose, (t3, a3, b3), axis=1)
    # prefix_k(0): last value AFTER block k of each chain.
    last_after = jnp.where(0 < tt, ta, tb)
    last_before = jnp.concatenate(
        [jnp.zeros((3, 1), jnp.int32), last_after[:, :-1]], axis=1)
    deltas3 = (last_after - last_before) >> 2

    d_cr = deltas3[0, :mb]
    d_cb = deltas3[1, :mb]
    d_y = deltas3[2].reshape(mb, 4)
    deltas = jnp.concatenate(
        [d_cr[:, None], d_cb[:, None], d_y], axis=1).reshape(-1)

    if codec == BS_V3DC:
        deltas = jnp.where(deltas < -0x80, deltas + 0x100, deltas)
        deltas = jnp.where(deltas > 0x80, deltas - 0x100, deltas)
    return deltas & 0x1FF, types


def _div_rounded_fast(n, d):
    """Exact round-half-away-from-zero n/d via f32 reciprocal + integer
    correction (integer division by runtime divisors is very slow on TPU).

    Valid for |n| < 2^17 and 1 <= d <= 2^13: the f32 estimate of
    (|n| + d//2)/d is within 0.001 of exact, so one remainder check fixes
    the floor. Exactness covered by tests/test_bs_ops.py.
    """
    an = jnp.abs(n)
    t = an + (d >> 1)
    q0 = (t.astype(jnp.float32) * (1.0 / d.astype(jnp.float32))).astype(
        jnp.int32)
    r = t - q0 * d
    q = q0 + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return jnp.where(n < 0, -q, q)


def _ac_quant(c, qs):
    """Quantize+clamp the AC positions by divisors qs broadcastable to
    c."""
    return _clamp_coeff(_div_rounded_fast(c, qs))


def _runs(nz, axis):
    """Zero-run length before each nonzero scan position along ``axis``
    (size 63, scan positions 1..63)."""
    nd = nz.ndim
    shape = [1] * nd
    shape[axis] = 63
    posb = jnp.arange(1, 64, dtype=jnp.int32).reshape(shape)
    nzpos = jnp.where(nz, posb, 0)
    prev_incl = jax.lax.cummax(nzpos, axis=axis)
    sl = [slice(None)] * nd
    sl[axis] = slice(0, -1)
    zshape = list(nz.shape)
    zshape[axis] = 1
    prev_excl = jnp.concatenate(
        [jnp.zeros(zshape, jnp.int32), prev_incl[tuple(sl)]], axis=axis)
    return posb - prev_excl - 1


def _select(bits_ps, nz_ps, dc_total, frame_max_sizes, nb):
    """First-fit scale selection — THE budget rule (a frame fits iff
    8 + 2*ceil(total_bits/16) <= budget, mdec.c:321-333); the single
    implementation shared by the emitting and fused paths."""
    per_scale_bits = bits_ps + dc_total[:, None] + 2 * nb + 10
    total_bytes = 8 + 2 * ((per_scale_bits + 15) >> 4)
    fits = total_bytes <= frame_max_sizes[:, None]
    scale_idx = jnp.argmax(fits, axis=1).astype(jnp.int32)
    scale = jnp.where(jnp.any(fits, axis=1), scale_idx + 1, 64).astype(
        jnp.int32)
    take = lambda x: jnp.take_along_axis(x, scale_idx[:, None],
                                         axis=1)[:, 0]
    return scale, scale_idx, take(nz_ps), take(per_scale_bits)


def _select_only(c, bits_ps, nz_ps, dc_bits, dc_code, dc_total,
                 frame_max_sizes, nb):
    """Scale selection without symbol emission (for the fused
    emit+pack kernel path): returns the winner and its exact totals."""
    scale, scale_idx, nz_at, total_at = _select(
        bits_ps, nz_ps, dc_total, frame_max_sizes, nb)
    return {
        "scale": scale,
        "scale_idx": scale_idx,
        "nz_count": nz_at,
        "total_bits": total_at,
        "c": c,
        "dc_bits": dc_bits,
        "dc_code": dc_code,
    }


def emit_symbols_at(c, scale_idx, dc_bits, dc_code):
    """Symbol-stream emission at a known per-frame scale index: returns
    (codes, bits) shaped (B, NB, 65) — DC, 63 ACs in scan order, EOB.
    Used by the fused path's overflow fallback so the sweep never runs
    twice."""
    B, _, nb = c.shape
    q = jnp.asarray(QUANT_PSX)[jnp.asarray(ZAGZIG[1:])]
    qs_w = q[None, :] * (scale_idx + 1)[:, None]        # (B, 63)
    ac_w = _ac_quant(c, qs_w[:, :, None])               # (B, 63, NB)
    nz_w = ac_w != 0
    run_w = _runs(nz_w, axis=1)
    bits_nz = ac_bits_closed_form(run_w, jnp.abs(ac_w))
    bits_w = jnp.where(nz_w, bits_nz, 0).transpose(0, 2, 1)
    code_w = jnp.where(nz_w, ac_code_closed_form(run_w, ac_w, bits_nz),
                       0).transpose(0, 2, 1)

    eob_bits = jnp.full((B, nb, 1), 2, jnp.int32)
    eob_code = jnp.full((B, nb, 1), 0x2, jnp.uint32)
    bits = jnp.concatenate([dc_bits[..., None], bits_w, eob_bits],
                           axis=2)
    codes = jnp.concatenate([dc_code[..., None].astype(jnp.uint32),
                             code_w.astype(jnp.uint32), eob_code],
                            axis=2)
    return codes, bits


@partial(jax.jit, static_argnames=("codec", "pallas_sweep", "emit"))
def encode_frames_symbols(coefs, frame_max_sizes, *, codec,
                          pallas_sweep=False, emit=True):
    """Quantize + symbolize a batch of frames at reference-chosen scales.

    Args:
      coefs: (B, NB, 64) int32 FDCT output in encode order (6 blocks per
        MB, MBs column-major).
      frame_max_sizes: (B,) int32 per-frame byte budgets.
      codec: BS_V2 | BS_V3 | BS_V3DC (static).

    Returns dict of device arrays (leading axis B):
      scale: chosen quant scales (64 where nothing fits — caller errors),
      codes/bits: (B, NB, 65) symbol streams (DC, 63 ACs, EOB),
      nz_count: nonzero AC counts at the chosen scales,
      total_bits: exact bitstream lengths (without the final 10-bit EOF).

    The 63-scale sweep runs as a fori_loop accumulating only per-scale bit
    totals (the full (63, B, NB, 63) tensor never materializes), then the
    winning scale is re-quantized once for symbol emission.
    """
    B, nb, _ = coefs.shape

    # --- DC (scale-independent): quant by 8*quant[0] = 16 (mdec.c:671).
    dc_q = _clamp_coeff(_div_rounded(coefs[:, :, 0], jnp.int32(16)))
    dc_bits, dc_code = _dc_stage(dc_q, codec)

    zz = jnp.asarray(ZAGZIG[1:])           # (63,) block indices, scan order
    # Layout (B, 63 positions, NB): the big MB axis sits on the TPU lane
    # dimension (multiple of 128 for real frame sizes) instead of the
    # 63-wide position axis.
    c = coefs[:, :, zz].transpose(0, 2, 1)  # (B, 63, NB)
    q = jnp.asarray(QUANT_PSX)[zz]          # (63,)

    dc_total = dc_bits.sum(axis=1)

    if pallas_sweep:
        # Fused Mosaic select kernel (ops/bs_pallas.py): one grid step
        # per frame, in-kernel monotone-LB binary search + exact
        # first-fit walk — each frame stops at its own first fit
        # (provably the reference retry loop's choice, mdec.c:663-722).
        from . import bs_pallas

        # Per-frame AC-bit fit threshold: fits iff ac_bits <= thr_ac
        # (the exact inverse of the byte-budget rule in _select:
        # 8 + 2*ceil((ac+extra)/16) <= M  <=>  ac <= 16*((M-8)//2) -
        # extra, both sides integer).
        thr_ac = (((frame_max_sizes - 8) // 2) * 16
                  - (dc_total + 2 * nb + 10))
        scale, ac_bits, nz_at = bs_pallas.select_scale_pallas(c, thr_ac)
        scale_idx = jnp.where(scale <= 63, scale - 1, 0)
        total_at = ac_bits + dc_total + 2 * nb + 10
        out = {
            "scale": scale,
            "scale_idx": scale_idx,
            "nz_count": nz_at,
            "total_bits": total_at,
        }
        if not emit:
            out.update(c=c, dc_bits=dc_bits, dc_code=dc_code)
            return out
        codes, bits = emit_symbols_at(c, scale_idx, dc_bits, dc_code)
        del out["scale_idx"]
        out.update(codes=codes, bits=bits)
        return out

    # Chunked early-exit sweep: scales are costed 8 at a time in order and
    # the loop stops once every frame has found a fitting scale — the
    # typical frame fits within the first chunk or two, like the
    # reference's retry loop usually stops early. Uncomputed scales carry
    # a sentinel that can never fit, so the selection below is identical
    # to a full sweep.
    CHUNK = 8
    sentinel = jnp.int32(1 << 29)

    def chunk_cond(state):
        ci, bits_ps, _ = state
        computed = jnp.arange(63) < ci * CHUNK
        total_bytes = 8 + 2 * ((bits_ps + dc_total[:, None] + 2 * nb + 10
                                + 15) >> 4)
        fits_any = jnp.any((total_bytes <= frame_max_sizes[:, None])
                           & computed[None, :], axis=1)
        return (ci < (63 + CHUNK - 1) // CHUNK) & ~jnp.all(fits_any)

    def chunk_body(state):
        ci, bits_ps, nz_ps = state
        for k in range(CHUNK):
            i = ci * CHUNK + k
            valid = i < 63
            idx = jnp.minimum(i, 62)
            s = i + 1
            ac = _ac_quant(c, (q * jnp.minimum(s, 63))[None, :, None])
            nz = ac != 0
            run = _runs(nz, axis=1)
            bits = jnp.where(nz, ac_bits_closed_form(run, jnp.abs(ac)), 0)
            bsum = bits.sum(axis=(1, 2))
            nsum = nz.sum(axis=(1, 2)).astype(jnp.int32)
            bits_ps = bits_ps.at[:, idx].set(
                jnp.where(valid, bsum, bits_ps[:, idx]))
            nz_ps = nz_ps.at[:, idx].set(
                jnp.where(valid, nsum, nz_ps[:, idx]))
        return ci + 1, bits_ps, nz_ps

    # Varying-typed carry init (see the pallas branch note).
    vzero = (frame_max_sizes * 0)[:, None]
    _, bits_ps, nz_ps = jax.lax.while_loop(
        chunk_cond, chunk_body,
        (jnp.int32(0), jnp.full((B, 63), sentinel, jnp.int32) + vzero,
         jnp.zeros((B, 63), jnp.int32) + vzero))

    if not emit:
        return _select_only(c, bits_ps, nz_ps, dc_bits, dc_code,
                            dc_total, frame_max_sizes, nb)
    return _select_and_emit(c, bits_ps, nz_ps, dc_bits, dc_code,
                            dc_total, frame_max_sizes, nb)


def _select_and_emit(c, bits_ps, nz_ps, dc_bits, dc_code, dc_total,
                     frame_max_sizes, nb):
    scale, scale_idx, nz_at, total_at = _select(
        bits_ps, nz_ps, dc_total, frame_max_sizes, nb)
    # Emit symbols for the chosen scale; both bit lengths and code
    # values are closed-form arithmetic (no 64K-LUT gather anywhere).
    codes, bits = emit_symbols_at(c, scale_idx, dc_bits, dc_code)
    return {
        "scale": scale,
        "codes": codes,
        "bits": bits,
        "nz_count": nz_at,
        "total_bits": total_at,
    }


def _dc_stage(dc_q, codec):
    """Scale-independent DC Huffman stage shared by the coefs and pixel
    paths: (B, NB) clamped quantized DCs -> (dc_bits, dc_code)."""
    B, nb = dc_q.shape
    if codec == BS_V2:
        dc_bits = jnp.full((B, nb), 10, jnp.int32)
        dc_code = (dc_q & 0x3FF).astype(jnp.uint32)
    else:
        keys, types = jax.vmap(lambda d: dc_chain(d, codec))(dc_q)
        dc_bits, dc_code = dc_bits_code_closed_form(types, keys)
    return dc_bits, dc_code


@partial(jax.jit, static_argnames=("codec",))
def select_frames_pixels(pix, frame_max_sizes, *, codec):
    """Scale selection straight from the (B, 64, NB) pixel-row layout
    (see :func:`rearrange_nv21_rows`) via the fused FDCT+select Mosaic
    kernel — the (B, 63, NB) coefficient tensor never exists in HBM.

    The DC coefficient of the islow FDCT is EXACTLY the block's pixel
    sum for centered samples: pass-1 DC is (row sum) << PASS1_BITS
    (|sum| <= 1024 so the int16 store never wraps) and pass-2 descales
    the column sum straight back. So the scale-independent DC stage
    (quant by 16, mdec.c:671, and the v3 delta chain) runs on cheap
    pixel sums, XLA-fused into the same pass that lays out the pixels.
    Identity pinned in tests/test_fdct.py.

    Returns the same dict as encode_frames_symbols(..., emit=False)
    minus the coefficient tensor.
    """
    from . import bs_pallas

    B, P, nb = pix.shape
    assert P == 64
    dc = pix.astype(jnp.int32).sum(axis=1)
    dc_q = _clamp_coeff(_div_rounded(dc, jnp.int32(16)))
    if codec == BS_V2:
        dc_bits, dc_code = _dc_stage(dc_q, codec)
    else:
        # One-launch Mosaic DC chain: the XLA associative_scan's ~40
        # tiny kernels were the whole v2-vs-v3dc device gap.
        dc_bits, dc_code = bs_pallas.dc_stage_pallas(dc_q, codec)
    dc_total = dc_bits.sum(axis=1)

    thr_ac = (((frame_max_sizes - 8) // 2) * 16
              - (dc_total + 2 * nb + 10))
    scale, ac_bits, nz_at, coefs64 = bs_pallas.select_scale_pix_pallas(
        pix, thr_ac)
    scale_idx = jnp.where(scale <= 63, scale - 1, 0)
    return {
        "scale": scale,
        "scale_idx": scale_idx,
        "nz_count": nz_at,
        "total_bits": ac_bits + dc_total + 2 * nb + 10,
        "dc_bits": dc_bits,
        "dc_code": dc_code,
        # The select kernel's own FDCT (B, 64, nb_pad signed zigzag
        # rows; row 63 + pad lanes zero) — feed straight to
        # emit_pack_pallas, no second FDCT anywhere.
        "c64": coefs64,
    }


def pixrows_to_coefs_zz(pix):
    """XLA rearrange of pixel rows to zigzag AC coefficients (B, 63, NB)
    — the fused path's overflow fallback needs the explicit tensor; this
    shares the row-form FDCT with the kernels (bit-identical)."""
    from . import fdct as fdct_ops

    rows = [pix[:, i, :].astype(jnp.int32) for i in range(64)]
    out = fdct_ops.fdct_rows(rows)
    return jnp.stack([out[int(ZAGZIG[p + 1])] for p in range(63)], axis=1)


def encode_frame_symbols(coefs, frame_max_size, *, codec):
    """Single-frame wrapper over :func:`encode_frames_symbols`."""
    out = encode_frames_symbols(coefs[None], jnp.asarray(frame_max_size,
                                                         jnp.int32)[None],
                                codec=codec)
    return {k: v[0] for k, v in out.items()}


def rearrange_nv21_frame(frame, width, height):
    """NV21 bytes -> (NB, 6, 8, 8) int32 macroblock DCT inputs in encode
    order (mdec.c:605-634): MBs column-major (fx outer), blocks ordered
    Cr, Cb, Y1(TL), Y2(TR), Y3(BL), Y4(BR), samples centered by -128."""
    mb_x, mb_y = width // 16, height // 16
    y = frame[: width * height].reshape(height, width).astype(jnp.int32)
    c = frame[width * height:].reshape(height // 2, width // 2, 2).astype(
        jnp.int32)
    cr = c[:, :, 0]
    cb = c[:, :, 1]

    def blocks8(plane, bh, bw):
        # (H, W) -> (bw, bh, 8, 8) with x-major block order.
        return plane.reshape(bh, 8, bw, 8).transpose(2, 0, 1, 3)

    cr_b = blocks8(cr, mb_y, mb_x)              # (mb_x, mb_y, 8, 8)
    cb_b = blocks8(cb, mb_y, mb_x)
    yb = y.reshape(mb_y, 2, 8, mb_x, 2, 8).transpose(3, 0, 1, 4, 2, 5)
    # yb: (mb_x, mb_y, 2(yrow), 2(xcol), 8, 8) — Y1=TL (row0,col0),
    # Y2=TR (row0,col1), Y3=BL, Y4=BR.
    y1, y2 = yb[:, :, 0, 0], yb[:, :, 0, 1]
    y3, y4 = yb[:, :, 1, 0], yb[:, :, 1, 1]
    blocks = jnp.stack([cr_b, cb_b, y1, y2, y3, y4], axis=2)
    return blocks.reshape(mb_x * mb_y, 6, 8, 8) - 128


def rearrange_nv21_rows(frame, width, height):
    """NV21 bytes -> (64, NB) INT8 centered pixels in block-sample
    layout: column n = block n in encode order, row 8r+c = sample (r, c)
    — the input form of the fused FDCT+select/emit kernels
    (ops/bs_pallas.py), one transpose away from
    :func:`rearrange_nv21_frame`. Centered samples span exactly
    [-128, 127], so the tensor rides HBM at 1 byte/sample (4x less
    traffic than the i32 form; p - 128 == int8(p ^ 0x80) bitwise) and
    the kernels widen in VMEM."""
    mb_x, mb_y = width // 16, height // 16
    y = frame[: width * height].reshape(height, width)
    c = frame[width * height:].reshape(height // 2, width // 2, 2)
    cr = c[:, :, 0]
    cb = c[:, :, 1]

    def blocks8(plane, bh, bw):
        return plane.reshape(bh, 8, bw, 8).transpose(2, 0, 1, 3)

    cr_b = blocks8(cr, mb_y, mb_x)
    cb_b = blocks8(cb, mb_y, mb_x)
    yb = y.reshape(mb_y, 2, 8, mb_x, 2, 8).transpose(3, 0, 1, 4, 2, 5)
    y1, y2 = yb[:, :, 0, 0], yb[:, :, 0, 1]
    y3, y4 = yb[:, :, 1, 0], yb[:, :, 1, 1]
    blocks = jnp.stack([cr_b, cb_b, y1, y2, y3, y4], axis=2)
    rows = blocks.reshape(mb_x * mb_y * 6, 64).T
    return (rows.astype(jnp.uint8) ^ 0x80).astype(jnp.int8)
