"""Pallas TPU kernel for the ADPCM unit encoder.

The XLA version (ops/adpcm.py) expresses the per-unit candidate search as
~700 small vector ops inside a lax.scan step; XLA executes them as many
VPU kernels with intermediate traffic. This kernel fuses the entire search
into one Mosaic program: streams ride the lane dimension, the scan over
time is the (sequential) trailing grid axis with decoder state carried in
VMEM scratch, and every candidate's 28-step quantize/decode recurrence
runs out of vector registers.

Layouts (host side transposes once around the call):
  units  (T, 28, B) int32    limits (T, B) int32    prev* (1, B) int32
  headers out (T, B) int32
  words   out (T, 4, B) int32 — 28 nibbles packed 8 per word, nibble m of
    word k at bit 4m: exactly bytes [2+4k, 2+4k+4) of the SPU block, or
    the XA nibble stream for host assembly.
  s1/s2   out (T, B) int32 — decoder state after each unit.

Semantics are bit-identical to ops/adpcm.py (same candidate order, exact
two-limb MSE tie-breaking); asserted in tests/test_adpcm_pallas.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import adpcm as ref_ops

N = 28


def _kernel(units_ref, limits_ref, prev1_ref, prev2_ref,
            hdr_ref, words_ref, s1_ref, s2_ref, state,
            *, filter_count, shift_range):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        state[0, :] = prev1_ref[0, :]
        state[1, :] = prev2_ref[0, :]


    lim = limits_ref[0, 0, :]                   # (B,)
    u = units_ref[0]                            # (28, B)
    B = u.shape[1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, B), 0)
    raw = jnp.where(ii < lim[None, :], u, 0)

    p1 = state[0, :]
    p2 = state[1, :]

    k1v = ref_ops.FILTER_K1
    k2v = ref_ops.FILTER_K2
    hi_lim = 0x7FFF >> shift_range
    lo_lim = -0x8000 >> shift_range
    sample_mask = 0xFFFF >> shift_range

    # --- min shift per filter (no quantization feedback: raw history).
    # The residual extrema are computed per filter (cheap, wide (28, B)
    # ops), then ALL filters' 12-step threshold searches run as one
    # (F_pad, B) loop instead of filter_count sequential ones.
    prev1_rows = jnp.concatenate([p1[None, :], raw[:-1]], axis=0)
    prev2_rows = jnp.concatenate([p2[None, :], p1[None, :], raw[:-2]],
                                 axis=0)
    smin_rows, smax_rows = [], []
    for f in range(filter_count):
        pred = (int(k1v[f]) * prev1_rows + int(k2v[f]) * prev2_rows
                + 32) >> 6
        resid = raw - pred
        smin_rows.append(jnp.minimum(jnp.min(resid, axis=0), 0))
        smax_rows.append(jnp.maximum(jnp.max(resid, axis=0), 0))
    f_pad = 8
    for _ in range(f_pad - filter_count):
        smin_rows.append(smin_rows[0])
        smax_rows.append(smax_rows[0])
    smin_all = jnp.stack(smin_rows)              # (8, B)
    smax_all = jnp.stack(smax_rows)
    rs = jnp.full((f_pad, B), shift_range, jnp.int32)
    for r in range(shift_range - 1, -1, -1):
        ok = ((smax_all >> r) <= hi_lim) & ((smin_all >> r) >= lo_lim)
        rs = jnp.where(ok, r, rs)
    min_shift_all = shift_range - rs
    min_shifts = [min_shift_all[f] for f in range(filter_count)]

    # --- candidate search, ALL candidates per recurrence step.
    # The 28-step quantize/decode is a dependency chain; running the
    # 13-15 (filter, shift) candidates as sequential chains left the VPU
    # ~5x latency-bound (and ~13x for the 2-lane CLI case). Candidates
    # ride the SUBLANE axis instead: every step's ops process a
    # (Cp, B) tile covering all candidates at once, and the encoded
    # sample words accumulate in-pass per candidate, so no winner
    # re-encode chain is needed — selection just folds the (C, B) rows
    # in reference order (filter-major, shift ascending; first-best
    # strict ties, adpcm.c:158-183).
    C = filter_count * 3
    Cp = 8 if C <= 8 else 16
    k1_rows, k2_rows, sh_rows = [], [], []
    for f in range(filter_count):
        for d in (-1, 0, 1):
            k1_rows.append(jnp.full((B,), int(k1v[f]), jnp.int32))
            k2_rows.append(jnp.full((B,), int(k2v[f]), jnp.int32))
            sh_rows.append(jnp.clip(min_shifts[f] + d, 0, shift_range))
    for _ in range(Cp - C):
        k1_rows.append(k1_rows[0])
        k2_rows.append(k2_rows[0])
        sh_rows.append(sh_rows[0])
    k1c = jnp.stack(k1_rows)                     # (Cp, B)
    k2c = jnp.stack(k2_rows)
    shc = jnp.stack(sh_rows)
    # Hoisted shift reformulation (exact for all shc in [0, shift_range],
    # exhaustively checked): with r = shift_range - shc and
    # bias = (1 << r) >> 1,
    #   (((s - pred) << shc) + half) >> shift_range == (s - pred + bias) >> r
    #   ((enc << shift_range) >> shc)               == enc << r
    # so two of the recurrence's four shifts move out of the 28-step loop.
    rc = shift_range - shc                       # (Cp, B), in [0, sr]
    bias_c = (1 << rc) >> 1                      # 0 when rc == 0

    vbits = 4 if shift_range == 12 else 8
    per_word = 32 // vbits
    n_words = (N + per_word - 1) // per_word

    a1 = jnp.broadcast_to(p1[None, :], (Cp, B)) + jnp.int32(0)
    a2 = jnp.broadcast_to(p2[None, :], (Cp, B)) + jnp.int32(0)
    # Exact squared-error accumulates as (carry count, uint32 wraparound
    # sum): err^2 < 2^32 per step, so the 64-bit total is
    # mse_hi * 2^32 + uint(mse_lo - BIAS) with mse_hi bumped whenever
    # the uint32 add wraps. mse_lo rides PERMANENTLY biased by 2^31
    # (xor with the top bit == adding it mod 2^32, so the biased value
    # obeys the same wraparound adds), which makes the carry check a
    # single native signed compare against the previous accumulator —
    # a+b wraps iff the unsigned result < a, and u<u compares are s<s
    # compares of the biased values. No per-step xors at all; the bias
    # folds into the init constant and cancels in the selection compare
    # (both sides biased). This loop is ~95% of the kernel, so op count
    # here IS the throughput.
    BIAS = jnp.int32(-0x80000000)     # signed<->unsigned compare bias
    mse_hi = jnp.zeros((Cp, B), jnp.int32)
    mse_lo = jnp.full((Cp, B), BIAS, jnp.int32)
    words = [jnp.zeros((Cp, B), jnp.int32) for _ in range(n_words)]
    for i in range(N):
        s = raw[i][None, :]
        pred = (k1c * a1 + k2c * a2 + 32) >> 6
        enc = (s - pred + bias_c) >> rc
        # Keep the sample SIGNED: enc << rc is already the sign-extended
        # 16-bit reconstruction (the nibble masks on at pack time),
        # skipping the mask + sign-extend dance.
        enc = jnp.clip(enc, lo_lim, hi_lim)
        dec = jnp.clip((enc << rc) + pred, -0x8000, 0x7FFF)
        d = dec - s
        sq = d * d       # |d| <= 65535: low 32 bits ARE d^2 exactly
        acc = mse_lo + sq              # uint32 add (wraparound, biased)
        mse_hi = mse_hi + (acc < mse_lo).astype(jnp.int32)
        mse_lo = acc
        words[i // per_word] = words[i // per_word] \
            | ((enc & sample_mask) << (vbits * (i % per_word)))
        a2 = a1
        a1 = dec
    # mse_lo is already biased — signed compares below ARE the unsigned
    # lexicographic (hi, lo) comparison.

    # --- fold rows 0..C-1 in candidate order (strictly-better updates).
    sel_hi, sel_lo = mse_hi[0], mse_lo[0]
    sel_shift = shc[0]
    sel_filter = jnp.zeros((B,), jnp.int32)
    sel_f1, sel_f2 = a1[0], a2[0]
    sel_words = [w[0] for w in words]
    for c in range(1, C):
        better = (mse_hi[c] < sel_hi) | ((mse_hi[c] == sel_hi)
                                         & (mse_lo[c] < sel_lo))
        sel_hi = jnp.where(better, mse_hi[c], sel_hi)
        sel_lo = jnp.where(better, mse_lo[c], sel_lo)
        sel_shift = jnp.where(better, shc[c], sel_shift)
        sel_filter = jnp.where(better, c // 3, sel_filter)
        sel_f1 = jnp.where(better, a1[c], sel_f1)
        sel_f2 = jnp.where(better, a2[c], sel_f2)
        sel_words = [jnp.where(better, w[c], sw)
                     for w, sw in zip(words, sel_words)]

    hdr_ref[0, 0, :] = (sel_shift & 0x0F) | (sel_filter << 4)
    for k in range(n_words):
        words_ref[0, k, :] = sel_words[k]
    s1_ref[0, 0, :] = sel_f1
    s2_ref[0, 0, :] = sel_f2
    state[0, :] = sel_f1
    state[1, :] = sel_f2


@functools.partial(jax.jit, static_argnames=("filter_count", "shift_range",
                                             "interpret"))
def encode_units_pallas(units, limits, prev1, prev2, *, filter_count,
                        shift_range, interpret=False):
    """Pallas ADPCM unit encoder.

    Args match ops.adpcm.encode_units_scan: units (B, T, 28) int32,
    limits (B, T), prev1/prev2 (B,). B must be a multiple of 128.

    Returns headers (B, T) int32, words (B, T, W) int32 (packed sample
    values: W=4 for 4-bit, W=7 for 8-bit), s1/s2 (B, T) per-unit state.
    """
    B, T, _ = units.shape
    assert B % 128 == 0, "stream batch must be a multiple of 128 lanes"
    units_t = jnp.transpose(units, (1, 2, 0)).astype(jnp.int32)
    # (T, 1, B): Mosaic requires the second-minor block dim to equal the
    # array dim (or be a multiple of 8); a singleton satisfies that.
    limits_t = jnp.transpose(
        jnp.clip(limits, -(1 << 30), N).astype(jnp.int32), (1, 0))[:, None]
    p1 = prev1.astype(jnp.int32)[None, :]
    p2 = prev2.astype(jnp.int32)[None, :]

    n_words = 4 if shift_range == 12 else 7
    grid = (1, T)
    kernel = functools.partial(_kernel, filter_count=filter_count,
                               shift_range=shift_range)
    hdr, words, s1, s2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, B), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, B), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_words, B), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda b, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((T, n_words, B), jnp.int32),
            jax.ShapeDtypeStruct((T, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((T, 1, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((2, B), jnp.int32)],
        interpret=interpret,
    )(units_t, limits_t, p1, p2)

    return (jnp.transpose(hdr[:, 0], (1, 0)),
            jnp.transpose(words, (2, 0, 1)),
            jnp.transpose(s1[:, 0], (1, 0)),
            jnp.transpose(s2[:, 0], (1, 0)))
