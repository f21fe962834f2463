"""Pallas TPU kernel for the BS quantization-scale sweep.

The XLA sweep (ops/bs.py) materializes (B, 63, NB)-sized intermediates per
scale; this kernel keeps a coefficient tile resident in VMEM and runs all
63 scales over it with zero HBM round-trips — the sweep's ~70 ops per
(position, scale) execute out of vector registers.

Grid: (B, NB_tiles); a CHUNK-scale chunk loops inside, starting from a
runtime scale offset so the caller's early-exit loop (ops/bs.py) can stop
after the first fitting chunk. Per-scale bit/nonzero totals accumulate in
VMEM scratch across tiles and are written on the last tile.

Outputs are exact (same f32-reciprocal division, clamp, run-length, and
closed-form Huffman sizing as ops/bs.py) — asserted against the XLA path
in bench.py and tests.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bs as bs_ops

TILE = 512
# 8 scales per sweep invocation: with the lower-bound-positioned dynamic
# chunk start (ops/bs.py), the LB-to-chosen gap is 0-5 scales for typical
# content (<= 13 for pure noise at mid budgets), so one or two 8-scale
# chunks replace the old fixed 16-scale ones.
CHUNK = 8


def _cummax_cols(x):
    """Cumulative max along axis 0 (63 rows) via log-shift."""
    n = x.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, 0)
        shifted = jnp.where(ii >= k, shifted, 0)
        x = jnp.maximum(x, shifted)
        k *= 2
    return x


def _kernel(s0_ref, thr_ref, c_ref, qcol_ref, rcp_ref, out_bits_ref,
            out_nz_ref, acc_bits, acc_nz, fit_state):
    # s0_ref/thr_ref are the scalar-prefetch args. Grid: (B, CHUNK,
    # ntiles), scales OUTER of tiles so a scale's verdict is known
    # before later scales start.
    b = pl.program_id(0)
    i = pl.program_id(1)
    nt = pl.program_id(2)
    ntiles = pl.num_programs(2)

    @pl.when((i == 0) & (nt == 0))
    def _():
        # fit_state = [found_flag, scale_that_fit]
        fit_state[0] = 0
        fit_state[1] = 0

    @pl.when(nt == 0)
    def _():
        acc_bits[...] = jnp.zeros_like(acc_bits)
        acc_nz[...] = jnp.zeros_like(acc_nz)

    s0 = s0_ref[0]
    thr = thr_ref[b]

    # Two exact-safe skips (selection provably unchanged):
    # - once ANY lower scale in this chunk fits, later scales are
    #   irrelevant (first-fit selection) — skipped entirely;
    # - once this scale's partial total exceeds the fit threshold, its
    #   unfit verdict is final — remaining tiles are skipped and the
    #   partial (> thr) is returned.
    partial = jnp.sum(acc_bits[0, :])
    live = (fit_state[0] == 0) & (partial <= thr)

    @pl.when(live)
    def _():
        c = c_ref[0]                               # (63, TILE)
        ac_abs_max = jnp.abs(c)
        q_col = qcol_ref[...]                      # (63, 1) int32
        rcp_base = rcp_ref[...]                    # (63, 1) f32
        pos = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0) + 1
        s = s0 + i + 1
        d = q_col * s
        # Exact round-half-away via f32 reciprocal + integer correction
        # (same construction as bs._div_rounded_fast).
        t = ac_abs_max + (d >> 1)
        rcp = rcp_base * (1.0 / s.astype(jnp.float32))
        q0 = (t.astype(jnp.float32) * rcp).astype(jnp.int32)
        r = t - q0 * d
        mag = q0 + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        # Clamp: values land in [-512, 510]; only |mag| matters for bits
        # (anything > 40 is the 22-bit escape either way).
        nz = mag != 0
        nzpos = jnp.where(nz, pos, 0)
        prev = _cummax_cols(nzpos)
        prev_excl = jnp.where(pos > 1, pltpu.roll(prev, 1, 0), 0)
        run = pos - prev_excl - 1
        bits = jnp.where(nz, bs_ops.ac_bits_closed_form(run, mag), 0)
        acc_bits[0, :] = acc_bits[0, :] + jnp.sum(bits, axis=0,
                                                  keepdims=True)[0]
        acc_nz[0, :] = acc_nz[0, :] + jnp.sum(nz.astype(jnp.int32),
                                              axis=0, keepdims=True)[0]

    @pl.when(nt == ntiles - 1)
    def _():
        total = jnp.sum(acc_bits[0, :])

        # Only a real threshold arms the skip (thr >= 2^29 means the
        # caller wants exact totals for every scale, e.g. tests).
        @pl.when((fit_state[0] == 0) & (total <= thr)
                 & (thr < (1 << 29)))
        def _():
            fit_state[0] = 1
            fit_state[1] = i

        skipped = (fit_state[0] == 1) & (i > fit_state[1])
        lane0 = (jax.lax.broadcasted_iota(jnp.int32,
                                          acc_bits.shape, 1) == 0)
        sentinel = jnp.where(lane0, jnp.int32(1 << 29), 0)
        out_bits_ref[0, 0, 0] = jnp.where(skipped, sentinel,
                                          acc_bits[0, :][None])[0]
        out_nz_ref[0, 0, 0] = jnp.where(skipped, 0,
                                        acc_nz[0, :][None])[0]


# Probed scales for the sweep's lower-bound positioning (0-based scale
# indices). The LB is provably monotone non-increasing in scale (each
# |level|>=k threshold k*q*s - (q*s)//2 is non-decreasing in s), so a
# probe grid is exact-safe: every scale at or below the last infeasible
# probe is infeasible.
LB_PROBES = tuple(range(3, 63, 4))


def _lb_kernel(c_ref, qcol_ref, lb_ref, acc_lb):
    nt = pl.program_id(1)
    ntiles = pl.num_programs(1)

    @pl.when(nt == 0)
    def _():
        acc_lb[...] = jnp.zeros_like(acc_lb)

    c_abs = jnp.abs(c_ref[0])                      # (63, TILE)
    q_col = qcol_ref[...]                          # (63, 1)

    for i, sidx in enumerate(LB_PROBES):
        s = sidx + 1
        d = q_col * s
        half = d >> 1
        # round-half-away: level(|c|) >= k iff |c| >= k*d - d//2
        # (mdec.c:434-439). Minimum Huffman cost by |level| class (best
        # run for each): 1->3, 2->5, 3->6, 4->8, 5+->9 bits, i.e. the
        # ladder weights 3/2/1/2/1.
        lb = (3 * (c_abs >= d - half).astype(jnp.int32)
              + 2 * (c_abs >= 2 * d - half)
              + (c_abs >= 3 * d - half) + 2 * (c_abs >= 4 * d - half)
              + (c_abs >= 5 * d - half))
        acc_lb[i, :] = acc_lb[i, :] + jnp.sum(lb, axis=0)

    @pl.when(nt == ntiles - 1)
    def _():
        lb_ref[0] = acc_lb[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lb_probe_pallas(coefs_zz, *, interpret=False):
    """Provable AC-bitstream lower bounds at the LB_PROBES scales.

    Args: coefs_zz (B, 63, NB) int32 zigzag-ordered AC coefficients.
    Returns (B, len(LB_PROBES)) int32. Used by the scale sweep to place
    its first chunk past scales that provably cannot fit — exact-safe,
    the selected scale is unchanged (tests/test_bs_pallas.py).
    """
    B, P, NB = coefs_zz.shape
    assert P == 63
    nb_pad = -(-NB // TILE) * TILE
    if nb_pad != NB:
        coefs_zz = jnp.pad(coefs_zz, ((0, 0), (0, 0), (0, nb_pad - NB)))
    ntiles = nb_pad // TILE
    nprobe = len(LB_PROBES)
    np_pad = -(-nprobe // 8) * 8

    zz = bs_ops.ZAGZIG[1:]
    qcol = jnp.asarray(bs_ops.QUANT_PSX[zz].astype(np.int32))[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec((1, 63, TILE), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, np_pad, TILE), lambda b, t: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((np_pad, TILE), jnp.int32)],
    )
    (lb,) = pl.pallas_call(
        _lb_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, np_pad, TILE), jnp.int32)],
        interpret=interpret,
    )(coefs_zz, qcol)
    return lb[:, :nprobe].sum(axis=2)


def _cumsum_excl_cols(x):
    """Exclusive prefix sum along axis 0 via Hillis-Steele log-shifts."""
    n = x.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < n:
        shifted = pltpu.roll(x, k, 0)
        x = x + jnp.where(ii >= k, shifted, 0)
        k *= 2
    rolled = pltpu.roll(x, 1, 0)
    return jnp.where(ii > 0, rolled, 0)


def _emit_pack_kernel(scale_ref, c_ref, dcc_ref, dcb_ref, qcol_ref,
                      rcp_ref, streams_ref, bbits_ref):
    b = pl.program_id(0)
    s = scale_ref[b]

    c = c_ref[0]                                   # (63, TILE)
    tp = c.shape[1]
    q_col = qcol_ref[...]
    rcp_base = rcp_ref[...]
    dc_code = dcc_ref[0, 0, :].reshape(1, tp).astype(jnp.uint32)
    dc_bits = dcb_ref[0, 0, :].reshape(1, tp)

    # --- quantize at the winning scale (exact round-half-away via f32
    # reciprocal + integer correction, as bs._div_rounded_fast).
    a = jnp.abs(c)
    d = q_col * s
    t = a + (d >> 1)
    rcp = rcp_base * (1.0 / s.astype(jnp.float32))
    q0 = (t.astype(jnp.float32) * rcp).astype(jnp.int32)
    r = t - q0 * d
    mag = q0 + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    ac = jnp.where(c < 0, -mag, mag)
    ac = jnp.clip(ac, -0x200, 0x1FE)               # mdec.c:262-267
    magc = jnp.abs(ac)

    # --- run lengths, closed-form bit lengths and code values.
    nz = magc != 0
    pos = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0) + 1
    nzpos = jnp.where(nz, pos, 0)
    prev = _cummax_cols(nzpos)
    prev_excl = jnp.where(pos > 1, pltpu.roll(prev, 1, 0), 0)
    run = pos - prev_excl - 1
    bits_nz = bs_ops.ac_bits_closed_form(run, magc)
    bits = jnp.where(nz, bits_nz, 0)
    code = jnp.where(nz, bs_ops.ac_code_closed_form(run, ac, bits_nz),
                     jnp.uint32(0))

    # --- in-block offsets: DC first, ACs in scan order, EOB last.
    offs = dc_bits + _cumsum_excl_cols(bits)       # (63, TILE)
    total = offs[62:63, :] + bits[62:63, :]        # after last AC
    bbits_ref[0, 0, :] = (total + 2)[0]

    # --- dense window packing into the (BCAP, TILE) per-block streams
    # (same placement formula as bitpack._pack_block_streams).
    from . import bitpack_pallas as bpk

    ws = jax.lax.broadcasted_iota(jnp.int32, (bpk.BCAP, tp), 0) << 4
    one = jnp.uint32(1)

    def place(acc, o_row, b_row, c_row):
        end = o_row + b_row
        lo = jnp.maximum(o_row, ws)
        hi = jnp.minimum(end, ws + 16)
        n = hi - lo
        rsh = jnp.clip(end - hi, 0, 31).astype(jnp.uint32)
        nb_ = jnp.clip(n, 0, 31).astype(jnp.uint32)
        chunk = (c_row >> rsh) & ((one << nb_) - one)
        lsh = jnp.clip(ws + 16 - hi, 0, 31).astype(jnp.uint32)
        return acc | jnp.where(n > 0, chunk << lsh, jnp.uint32(0))

    acc = jnp.zeros((bpk.BCAP, tp), jnp.uint32)
    acc = place(acc, jnp.zeros((1, tp), jnp.int32), dc_bits, dc_code)
    for i in range(63):
        acc = place(acc, offs[i:i + 1], bits[i:i + 1],
                    code[i:i + 1].astype(jnp.uint32))
    acc = place(acc, total, jnp.full((1, tp), 2, jnp.int32),
                jnp.full((1, tp), 0x2, jnp.uint32))
    streams_ref[0] = acc.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def emit_pack_pallas(coefs_zz, scale, dc_code, dc_bits, *,
                     interpret=False):
    """Fused winner emission + per-block packing.

    One Mosaic pass from zigzag AC coefficients to per-block bitstream
    windows: quantize at the chosen scale, run-length, closed-form
    Huffman bits/codes, in-block offsets, and the dense window pack —
    the (B, NB, 65) code/bit tensors never touch HBM.

    Args:
      coefs_zz: (B, 63, NB) int32 zigzag AC coefficients.
      scale: (B,) int32 winning quant scale (1..63).
      dc_code: (B, NB) uint32/int32 DC Huffman codes.
      dc_bits: (B, NB) int32 DC code lengths.
    Returns (streams (B, NB, BCAP) int32, block_bits (B, NB) int32),
    identical to emitting symbols and running
    bitpack._pack_block_streams (interpret-mode tested). Blocks over
    BCAP*16 bits truncate; callers gate on block_bits and fall back.
    """
    from . import bitpack_pallas as bpk

    B, P, NB = coefs_zz.shape
    assert P == 63
    nb_pad = -(-NB // TILE) * TILE
    if nb_pad != NB:
        coefs_zz = jnp.pad(coefs_zz, ((0, 0), (0, 0), (0, nb_pad - NB)))
        dc_code = jnp.pad(dc_code, ((0, 0), (0, nb_pad - NB)))
        dc_bits = jnp.pad(dc_bits, ((0, 0), (0, nb_pad - NB)))
    ntiles = nb_pad // TILE

    zz = bs_ops.ZAGZIG[1:]
    qcol = jnp.asarray(bs_ops.QUANT_PSX[zz].astype(np.int32))[:, None]
    rcp = jnp.asarray(
        (1.0 / bs_ops.QUANT_PSX[zz].astype(np.float64)).astype(
            np.float32))[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec((1, 63, TILE), lambda b, t, s: (b, 0, t),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, TILE), lambda b, t, s: (b, 0, t),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, TILE), lambda b, t, s: (b, 0, t),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, t, s: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, t, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, bpk.BCAP, TILE), lambda b, t, s: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE), lambda b, t, s: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
    )
    streams, bbits = pl.pallas_call(
        _emit_pack_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, bpk.BCAP, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, nb_pad), jnp.int32),
        ],
        interpret=interpret,
    )(scale.astype(jnp.int32), coefs_zz,
      dc_code.astype(jnp.int32)[:, None],
      dc_bits.astype(jnp.int32)[:, None], qcol, rcp)
    streams = jnp.transpose(streams, (0, 2, 1))[:, :NB]
    return streams, bbits[:, 0, :NB]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sweep_chunk_pallas(coefs_zz, s0, thr=None, *, interpret=False):
    """AC bit/nonzero totals for scales [s0+1, s0+CHUNK].

    Args:
      coefs_zz: (B, 63, NB) int32 — zigzag-ordered AC coefficients in the
        (positions, blocks) layout of ops.bs.encode_frames_symbols.
      s0: int32 scalar scale offset (scales beyond 63 produce garbage
        rows the caller must mask).
      thr: optional (B,) int32 per-frame AC-bit fit thresholds. Scales
        whose partial sum already exceeds thr stop accumulating (the
        returned value is a partial > thr — still correctly unfit);
        scales with totals <= thr (incl. the selected one) are exact.
        None = exact totals for every scale.
    Returns:
      bits (B, CHUNK) int32, nz (B, CHUNK) int32.
    """
    B, P, NB = coefs_zz.shape
    if thr is None:
        thr = jnp.full((B,), jnp.int32(1 << 30))
    assert P == 63
    nb_pad = -(-NB // TILE) * TILE
    if nb_pad != NB:
        # Zero blocks quantize to all-zero -> contribute nothing.
        coefs_zz = jnp.pad(coefs_zz, ((0, 0), (0, 0), (0, nb_pad - NB)))
    ntiles = nb_pad // TILE

    zz = bs_ops.ZAGZIG[1:]
    qcol = jnp.asarray(bs_ops.QUANT_PSX[zz].astype(np.int32))[:, None]
    rcp = jnp.asarray(
        (1.0 / bs_ops.QUANT_PSX[zz].astype(np.float64)).astype(
            np.float32))[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, CHUNK, ntiles),
        in_specs=[pl.BlockSpec((1, 63, TILE),
                               lambda b, i, t, *_: (b, 0, t),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, i, t, *_: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, i, t, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, 1, 1, TILE),
                         lambda b, i, t, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TILE),
                         lambda b, i, t, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, TILE), jnp.int32),
                        pltpu.VMEM((1, TILE), jnp.int32),
                        pltpu.SMEM((2,), jnp.int32)],
    )
    bits, nz = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, CHUNK, 1, TILE), jnp.int32),
            jax.ShapeDtypeStruct((B, CHUNK, 1, TILE), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(s0, jnp.int32)[None], jnp.asarray(thr, jnp.int32),
      coefs_zz, qcol, rcp)
    bits = bits[:, :, 0]
    nz = nz[:, :, 0]
    return bits.sum(axis=2), nz.sum(axis=2)
