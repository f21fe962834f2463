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


def _kernel(s0_ref, c_ref, qcol_ref, rcp_ref, out_bits_ref, out_nz_ref,
            acc_bits, acc_nz):
    # s0_ref is the scalar-prefetch arg; grid dims shift by one.
    nt = pl.program_id(1)
    ntiles = pl.num_programs(1)

    @pl.when(nt == 0)
    def _():
        acc_bits[...] = jnp.zeros_like(acc_bits)
        acc_nz[...] = jnp.zeros_like(acc_nz)

    c = c_ref[0]                                   # (63, TILE)
    ac_abs_max = jnp.abs(c)
    q_col = qcol_ref[...]                          # (63, 1) int32
    rcp_base = rcp_ref[...]                        # (63, 1) f32

    pos = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0) + 1

    s0 = s0_ref[0]

    def scale_body(i, _):
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
        acc_bits[i, :] = acc_bits[i, :] + jnp.sum(bits, axis=0)
        acc_nz[i, :] = acc_nz[i, :] + jnp.sum(nz.astype(jnp.int32), axis=0)
        return 0

    jax.lax.fori_loop(0, CHUNK, scale_body, 0)

    @pl.when(nt == ntiles - 1)
    def _():
        out_bits_ref[0] = acc_bits[...]
        out_nz_ref[0] = acc_nz[...]


def _nz_kernel(c_ref, qcol_ref, nz_ref, lb_ref, acc_nz, acc_lb):
    nt = pl.program_id(1)
    ntiles = pl.num_programs(1)

    @pl.when(nt == 0)
    def _():
        acc_nz[...] = jnp.zeros_like(acc_nz)
        acc_lb[...] = jnp.zeros_like(acc_lb)

    c_abs = jnp.abs(c_ref[0])                      # (63, TILE)
    q_col = qcol_ref[...]                          # (63, 1)

    def scale_body(i, _):
        s = i + 1
        d = q_col * s
        half = d >> 1
        # round-half-away: level(|c|) >= k iff |c| >= k*d - d//2
        # (mdec.c:434-439). Minimum Huffman cost by |level| class (best
        # run for each): 1->3, 2->5, 3->6, 4->8, 5+->9 bits, i.e. the
        # ladder weights 3/2/1/2/1.
        nz = (c_abs >= d - half).astype(jnp.int32)
        lb = (3 * nz + 2 * (c_abs >= 2 * d - half)
              + (c_abs >= 3 * d - half) + 2 * (c_abs >= 4 * d - half)
              + (c_abs >= 5 * d - half))
        acc_nz[i, :] = acc_nz[i, :] + jnp.sum(nz, axis=0)
        acc_lb[i, :] = acc_lb[i, :] + jnp.sum(lb, axis=0)
        return 0

    jax.lax.fori_loop(0, 63, scale_body, 0)

    @pl.when(nt == ntiles - 1)
    def _():
        nz_ref[0] = acc_nz[...]
        lb_ref[0] = acc_lb[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nz_counts_pallas(coefs_zz, *, interpret=False):
    """Exact per-scale nonzero-AC counts and AC-bit lower bounds for ALL
    63 scales in one pass.

    Args: coefs_zz (B, 63, NB) int32 zigzag-ordered AC coefficients.
    Returns (nz (B, 63) int32, lb_bits (B, 63) int32). lb_bits is a
    provable lower bound on the AC bitstream size (minimum code cost by
    |level| class), used by the scale sweep to skip scales that cannot
    fit — exact-safe, the selected scale is unchanged.
    """
    B, P, NB = coefs_zz.shape
    assert P == 63
    nb_pad = -(-NB // TILE) * TILE
    if nb_pad != NB:
        coefs_zz = jnp.pad(coefs_zz, ((0, 0), (0, 0), (0, nb_pad - NB)))
    ntiles = nb_pad // TILE

    zz = bs_ops.ZAGZIG[1:]
    qcol = jnp.asarray(bs_ops.QUANT_PSX[zz].astype(np.int32))[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec((1, 63, TILE), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 64, TILE), lambda b, t: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 64, TILE), lambda b, t: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((64, TILE), jnp.int32),
                        pltpu.VMEM((64, TILE), jnp.int32)],
    )
    nz, lb = pl.pallas_call(
        _nz_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 64, TILE), jnp.int32),
                   jax.ShapeDtypeStruct((B, 64, TILE), jnp.int32)],
        interpret=interpret,
    )(coefs_zz, qcol)
    return nz[:, :63].sum(axis=2), lb[:, :63].sum(axis=2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sweep_chunk_pallas(coefs_zz, s0, *, interpret=False):
    """Exact AC bit/nonzero totals for scales [s0+1, s0+CHUNK].

    Args:
      coefs_zz: (B, 63, NB) int32 — zigzag-ordered AC coefficients in the
        (positions, blocks) layout of ops.bs.encode_frames_symbols.
      s0: int32 scalar scale offset (scales beyond 63 produce garbage
        rows the caller must mask).
    Returns:
      bits (B, CHUNK) int32, nz (B, CHUNK) int32.
    """
    B, P, NB = coefs_zz.shape
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
        num_scalar_prefetch=1,
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec((1, 63, TILE), lambda b, t, s_ref: (b, 0, t),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, t, s_ref: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, t, s_ref: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, CHUNK, TILE), lambda b, t, s_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, TILE), lambda b, t, s_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((CHUNK, TILE), jnp.int32),
                        pltpu.VMEM((CHUNK, TILE), jnp.int32)],
    )
    bits, nz = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, CHUNK, TILE), jnp.int32),
            jax.ShapeDtypeStruct((B, CHUNK, TILE), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(s0, jnp.int32)[None], coefs_zz, qcol, rcp)
    return bits.sum(axis=2), nz.sum(axis=2)
