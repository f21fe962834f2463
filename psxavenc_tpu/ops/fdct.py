"""Bit-exact integer forward DCT (JAX, batched).

The reference delegates its FDCT to FFmpeg's AVDCT (psxavenc/mdec.c:524,548,
640), which with default options on a SIMD-disabled build dispatches to the
classic IJG "islow" integer DCT (jfdctint, CONST_BITS=13, PASS1_BITS=2,
8-bit samples) — the Loeffler/Ligtenberg/Moshovitz 12-multiply algorithm in
13-bit fixed point. Output is the JPEG-convention DCT scaled by 8.

This is a fresh int32 JAX implementation of that public algorithm, written
to vectorize over a leading batch axis: each butterfly step is an
elementwise op over (..., 8) lanes, so thousands of 8x8 blocks run as wide
VPU arithmetic on TPU. Validated bit-for-bit against libavcodec's AVDCT
(FF_DCT_INT) golden vectors in tests/test_fdct.py.
"""

import jax.numpy as jnp

CONST_BITS = 13
# NOTE: classic IJG jfdctint uses PASS1_BITS=2; FFmpeg's jfdctint template
# (the code AVDCT dispatches to) raises it to 4 for extra pass-1 precision.
# Confirmed by disassembling libavcodec's ff_jpeg_fdct_islow_8 (shl $4 on
# the even pass-1 outputs, descale by 9 = CONST_BITS-4 with +0x100
# rounding).
PASS1_BITS = 4

FIX_0_298631336 = 2446
FIX_0_390180644 = 3196
FIX_0_541196100 = 4433
FIX_0_765366865 = 6270
FIX_0_899976223 = 7373
FIX_1_175875602 = 9633
FIX_1_501321110 = 12299
FIX_1_847759065 = 15137
FIX_1_961570560 = 16069
FIX_2_053119869 = 16819
FIX_2_562915447 = 20995
FIX_3_072711026 = 25172


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _pass(d, shift_even_up, descale_bits):
    """One 1-D islow pass over the last axis of an (..., 8) int32 array.

    Pass 1 scales the even outputs up by PASS1_BITS and descales odd terms
    by CONST_BITS-PASS1_BITS; pass 2 descales evens by PASS1_BITS and odds
    by CONST_BITS+PASS1_BITS.
    """
    outs = _pass_rows([d[..., i] for i in range(8)], shift_even_up,
                      descale_bits)
    return jnp.stack(outs, axis=-1)


def _pass_rows(rows, shift_even_up, descale_bits):
    """The same 1-D pass on a list of 8 same-shaped int32 arrays.

    This unstacked form is the building block for layouts that keep the
    8 butterfly inputs as separate array rows (the Pallas kernels and the
    row-major XLA path) — no (..., 8) minor axis, so no relayout traffic.
    """
    d0, d1, d2, d3, d4, d5, d6, d7 = rows

    tmp0, tmp7 = d0 + d7, d0 - d7
    tmp1, tmp6 = d1 + d6, d1 - d6
    tmp2, tmp5 = d2 + d5, d2 - d5
    tmp3, tmp4 = d3 + d4, d3 - d4

    tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
    tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2

    if shift_even_up:
        out0 = (tmp10 + tmp11) << PASS1_BITS
        out4 = (tmp10 - tmp11) << PASS1_BITS
    else:
        out0 = _descale(tmp10 + tmp11, PASS1_BITS)
        out4 = _descale(tmp10 - tmp11, PASS1_BITS)

    z1 = (tmp12 + tmp13) * FIX_0_541196100
    out2 = _descale(z1 + tmp13 * FIX_0_765366865, descale_bits)
    out6 = _descale(z1 - tmp12 * FIX_1_847759065, descale_bits)

    z1 = tmp4 + tmp7
    z2 = tmp5 + tmp6
    z3 = tmp4 + tmp6
    z4 = tmp5 + tmp7
    z5 = (z3 + z4) * FIX_1_175875602

    t4 = tmp4 * FIX_0_298631336
    t5 = tmp5 * FIX_2_053119869
    t6 = tmp6 * FIX_3_072711026
    t7 = tmp7 * FIX_1_501321110
    z1 = z1 * (-FIX_0_899976223)
    z2 = z2 * (-FIX_2_562915447)
    z3 = z3 * (-FIX_1_961570560) + z5
    z4 = z4 * (-FIX_0_390180644) + z5

    out7 = _descale(t4 + z1 + z3, descale_bits)
    out5 = _descale(t5 + z2 + z4, descale_bits)
    out3 = _descale(t6 + z2 + z3, descale_bits)
    out1 = _descale(t7 + z1 + z4, descale_bits)

    return [out0, out1, out2, out3, out4, out5, out6, out7]


def _wrap16(x):
    """int16 reinterpretation (the reference's pass-1 int16 store)."""
    return ((x & 0xFFFF) ^ 0x8000) - 0x8000


def fdct_rows(rows):
    """islow FDCT on 64 separate sample rows.

    Args:
      rows: list of 64 same-shaped int32 arrays; rows[8*r + c] holds
        sample (r, c) of every block (row-major within the 8x8 block,
        blocks vectorized across the array shape).
    Returns:
      list of 64 arrays; out[8*u + v] is coefficient (u, v).

    Bit-identical to :func:`fdct_islow` (same ops, rows addressed
    statically instead of via stacked minor axes) — this is the form the
    Pallas kernels inline, keeping a whole frame's FDCT in VMEM.
    """
    p1 = [None] * 64
    for r in range(8):
        outs = _pass_rows([rows[8 * r + i] for i in range(8)], True,
                          CONST_BITS - PASS1_BITS)
        for i in range(8):
            p1[8 * r + i] = _wrap16(outs[i])
    out = [None] * 64
    for i in range(8):
        outs = _pass_rows([p1[8 * r + i] for r in range(8)], False,
                          CONST_BITS + PASS1_BITS)
        for u in range(8):
            out[8 * u + i] = outs[u]
    return out


def fdct_islow(blocks):
    """islow FDCT over a batch of blocks.

    Args:
      blocks: (..., 8, 8) int32 (row-major, like the reference's in-place
        int16 blocks).
    Returns:
      (..., 8, 8) int32 coefficients (fit in int16).
    """
    blocks = blocks.astype(jnp.int32)
    # Pass 1 operates on rows, pass 2 on columns. The reference's pass 1
    # stores into an int16 array; replicate the wrap so out-of-range inputs
    # degrade identically (valid centered pixels never wrap).
    x = _pass(blocks, True, CONST_BITS - PASS1_BITS)
    x = _wrap16(x)
    x = jnp.swapaxes(x, -1, -2)
    x = _pass(x, False, CONST_BITS + PASS1_BITS)
    return jnp.swapaxes(x, -1, -2)
