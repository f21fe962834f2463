"""Pallas TPU kernels for the BS quantization-scale selection + emission.

The XLA sweep (ops/bs.py) materializes (B, 63, NB)-sized intermediates per
scale; these kernels keep a frame's coefficients resident in VMEM and run
the whole scale search over them with zero HBM round-trips.

``select_scale_pallas`` is the production select stage: grid (B,) — one
sequential Mosaic step per frame (TPU grids execute serially, so fat steps
beat the former (B, CHUNK, ntiles) grid whose thousands of tiny steps paid
~1 us of dispatch + redundant DMA each). Per frame the kernel binary-
searches a provable monotone lower bound for the first possibly-fitting
scale (6 cheap ladder passes replace the old probe-grid kernel), then
walks scales upward computing exact closed-form bit totals until the first
fit — each frame stops at ITS OWN first fit instead of synchronizing with
the slowest frame in the batch (the old XLA while-loop over 8-scale
chunks).

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
from . import fdct as fdct_ops

TILE = 512


def _fdct_zz_chunk(pix_ref, ci, f=0):
    """FDCT one TILE-wide chunk of a frame's pixel rows in VMEM.

    pix_ref is the (F, 64, nb_pad) block of centered pixels in
    block-sample layout (row 8r+c = sample (r, c) of each block, blocks
    on lanes); ``f`` picks the frame. Returns a list of 63 (1, TILE)
    int32 AC rows in ZIGZAG order (list index p = scan position p+1) —
    the same values the XLA rearrange+FDCT stage used to round-trip
    through HBM (mdec.c:605-641 runs rearrange+FDCT as one pass there
    too).
    """
    x = pix_ref[f, :, ci * TILE:(ci + 1) * TILE].astype(jnp.int32)
    rows = [x[i:i + 1, :] for i in range(64)]
    out = fdct_ops.fdct_rows(rows)
    return [out[int(bs_ops.ZAGZIG[p + 1])] for p in range(63)]


def _fdct_frame_to_scratch(dst, pix_ref, nchunks, abs_dst=None, f=0):
    """FDCT frame ``f`` of the pixel block into the (64, nb_pad) VMEM
    ref ``dst``, signed zigzag rows (row p = scan position p+1; row 63
    is zero). Stores ride 8-row groups so Mosaic writes full sublane
    tiles. With ``abs_dst``, also store |rows| there (one extra store
    per group — far cheaper than re-taking abs on every search read)."""
    for ci in range(nchunks):
        zz_rows = _fdct_zz_chunk(pix_ref, ci, f)
        zz_rows.append(jnp.zeros_like(zz_rows[0]))
        for g in range(8):
            grp = jnp.concatenate(zz_rows[8 * g:8 * g + 8], axis=0)
            # int16 HBM form: |coef| <= 8192 for valid centered pixels
            # (pass-1 weight-sum bound 16384 < the int16 wrap, pass-2
            # bound 8192 — computed from the islow weight magnitudes),
            # so the (B, 64, nb_pad) tensor rides at half the traffic.
            dst[8 * g:8 * g + 8, ci * TILE:(ci + 1) * TILE] = \
                grp.astype(dst.dtype)
            if abs_dst is not None:
                abs_dst[8 * g:8 * g + 8, ci * TILE:(ci + 1) * TILE] = \
                    jnp.abs(grp)


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


def ladder_lb(ca, d, half):
    """Provable AC-bitstream lower bound terms for one (63, W) tile of
    |coefficients| at divisors ``d`` (63, 1).

    round-half-away: level(|c|) >= k iff |c| >= k*d - d//2
    (mdec.c:434-439). Two provable components, both derived from the AC
    Huffman table (ac_bits_closed_form; validity fuzz-pinned in
    tests/test_bs_pallas.py):

    - class weights = run-0 code length by |level| class:
      1->3, 2->5, 3->6, 4->8, 5..6->9, 7+->11 bits (rung weights
      3/2/1/2/1/2);
    - a run-aware bonus per nonzero with EXACT run r (cummax over scan
      positions): [r>=1]*(min(class,3)-1) + g(r), where
      g = min(r,3) + [r>=5] + [r>=8] + [r>=10] + 2[r>=14] + [r>=17]
      is the largest curve satisfying both validity (every code
      family's length at run r exceeds run-0 by >= bonus, checked for
      all (run, |level|) pairs) and the safety condition
      g(r+d) - g(r) <= 3 + g(d-1) for all r, d (checked exhaustively).

    Monotone non-increasing in s = d/q: each magnitude threshold
    k*q*s - (q*s)//2 is non-decreasing in s, so per-element classes only
    fall. When an element with run re leaves the nonzero set, its own
    terms drop by >= 3 + g(re) while exactly one surviving neighbor's
    run grows by re + 1 — the safety condition bounds that bonus rise
    by the drop. Scales where this bound exceeds the fit threshold
    provably cannot fit (tests pin validity, safety, monotonicity and
    LB <= exact).
    """
    nzi = (ca >= d - half).astype(jnp.int32)
    c2 = (ca >= 2 * d - half).astype(jnp.int32)
    c3 = (ca >= 3 * d - half).astype(jnp.int32)
    lb = (3 * nzi + 2 * c2 + c3 + 2 * (ca >= 4 * d - half)
          + (ca >= 5 * d - half) + 2 * (ca >= 7 * d - half))
    pos = jax.lax.broadcasted_iota(jnp.int32, ca.shape, 0) + 1
    nzpos = jnp.where(nzi > 0, pos, 0)
    prev = _cummax_cols(nzpos)
    prev_excl = jnp.where(pos > 1, pltpu.roll(prev, 1, 0), 0)
    run = pos - prev_excl - 1
    g = (jnp.minimum(run, 3) + (run >= 5) + (run >= 8) + (run >= 10)
         + 2 * (run >= 14) + (run >= 17))
    bonus = jnp.where(run >= 1, c2 + c3, 0) + g
    return lb + nzi * bonus


def _ladder_total(load_abs, q_col, s, nchunks):
    """Sum of :func:`ladder_lb` over a frame at scale ``s`` (traced).
    ``load_abs(ci)`` yields the (63, TILE) |coefficients| chunk."""
    d = q_col * s
    half = d >> 1
    tot = jnp.int32(0)
    for ci in range(nchunks):
        tot = tot + jnp.sum(ladder_lb(load_abs(ci), d, half))
    return tot


def _exact_totals(load_abs, q_col, rcp_base, s, nchunks):
    """Exact AC bit/nonzero totals at scale ``s`` (traced scalar): the
    same f32-reciprocal round-half-away division, run lengths and
    closed-form Huffman sizing as ops/bs.py. Only |mag| matters for bits
    (anything > 40 is the 22-bit escape either way), so the coefficient
    clamp is unnecessary here."""
    d = q_col * s
    half = d >> 1
    rcp = rcp_base * (1.0 / s.astype(jnp.float32))
    bits_tot = jnp.int32(0)
    nz_tot = jnp.int32(0)
    for ci in range(nchunks):
        ca = load_abs(ci)
        t = ca + half
        q0 = (t.astype(jnp.float32) * rcp).astype(jnp.int32)
        r = t - q0 * d
        mag = q0 + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        nz = mag != 0
        pos = jax.lax.broadcasted_iota(jnp.int32, ca.shape, 0) + 1
        nzpos = jnp.where(nz, pos, 0)
        prev = _cummax_cols(nzpos)
        prev_excl = jnp.where(pos > 1, pltpu.roll(prev, 1, 0), 0)
        run = pos - prev_excl - 1
        bits = jnp.where(nz, bs_ops.ac_bits_closed_form(run, mag), 0)
        bits_tot = bits_tot + jnp.sum(bits)
        nz_tot = nz_tot + jnp.sum(nz.astype(jnp.int32))
    return bits_tot, nz_tot


def _select_kernel(thr_ref, c_ref, qcol_ref, rcp_ref, out_ref, seed_ref,
                   *, nchunks):
    """Per-frame first-fit scale selection, one grid step per frame.

    Find the first scale where the monotone ladder LB fits, then walk
    upward with exact totals until the first true fit — provably the
    reference's retry-loop choice (mdec.c:663-722): every scale below
    the LB start has ladder > thr => exact bits > thr => cannot fit.

    The LB search is seeded from the PREVIOUS frame's start (TPU grids
    run sequentially, so SMEM scratch persists across the per-frame grid
    steps): probe the seed, gallop outward with doubling steps until
    bracketed, then bisect. Consecutive video frames have near-identical
    scales, so the typical frame needs ~2-3 ladder evals instead of the
    unseeded binary search's 6; a cold or wrong seed degrades to at
    worst ~2x bisection cost, never to a wrong answer (the bracket
    invariant — LB infeasible at lo, feasible at hi — is maintained by
    every probe)."""
    b = pl.program_id(0)
    thr = thr_ref[b]
    q_col = qcol_ref[...]                          # (63, 1) int32
    rcp_base = rcp_ref[...]                        # (63, 1) f32

    @pl.when(b == 0)
    def _():
        seed_ref[0] = jnp.int32(0)

    def load_abs(ci):
        return jnp.abs(c_ref[0, :, ci * TILE:(ci + 1) * TILE])

    _search_store(thr, q_col, rcp_base, load_abs, out_ref, seed_ref,
                  nchunks)


def _fused_probe(load_abs, q_col, rcp_base, slm, sl, nchunks):
    """One chunk pass computing the ladder LB total at scale ``slm`` AND
    the exact (bits, nz) totals at scale ``sl`` — each |coefficient|
    chunk is loaded once and all three reductions land in one
    vector->scalar sync (the per-frame search is serialization-bound on
    those syncs, not on the vector math)."""
    d1 = q_col * slm
    h1 = d1 >> 1
    d = q_col * sl
    half = d >> 1
    rcp = rcp_base * (1.0 / sl.astype(jnp.float32))
    lad = jnp.int32(0)
    bits_tot = jnp.int32(0)
    nz_tot = jnp.int32(0)
    for ci in range(nchunks):
        ca = load_abs(ci)
        lad = lad + jnp.sum(ladder_lb(ca, d1, h1))
        t = ca + half
        q0 = (t.astype(jnp.float32) * rcp).astype(jnp.int32)
        r = t - q0 * d
        mag = q0 + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        nz = mag != 0
        pos = jax.lax.broadcasted_iota(jnp.int32, ca.shape, 0) + 1
        nzpos = jnp.where(nz, pos, 0)
        prev = _cummax_cols(nzpos)
        prev_excl = jnp.where(pos > 1, pltpu.roll(prev, 1, 0), 0)
        run = pos - prev_excl - 1
        bits = jnp.where(nz, bs_ops.ac_bits_closed_form(run, mag), 0)
        bits_tot = bits_tot + jnp.sum(bits)
        nz_tot = nz_tot + jnp.sum(nz.astype(jnp.int32))
    return lad, bits_tot, nz_tot


def _search_store(thr, q_col, rcp_base, load_abs, out_ref, seed_ref,
                  nchunks, orow=0):
    """The seeded LB search + exact first-fit walk shared by the coefs-
    and pixel-input select kernels (see :func:`_select_kernel`);
    ``orow`` is the output-block row (frame within a fat grid step).

    Speculative fast path: consecutive frames usually choose the SAME
    scale, so one fused pass evaluates the ladder LB at seed-1 and the
    exact totals at seed (single vector->scalar sync). When LB(seed-1)
    is infeasible (proving, by LB monotonicity, that every scale below
    seed cannot fit) and the exact totals at seed fit, the answer is
    seed and both while-loops below run zero iterations. A miss falls
    back to the bisect/gallop + exact walk with the bracket already
    tightened by the fused pass's ladder eval — never to a wrong
    answer (the bracket invariant is maintained) and at worst ~one
    extra exact eval over the unspeculated search."""
    seed = seed_ref[0]
    sl = jnp.where((seed >= 1) & (seed <= 63), seed, jnp.int32(32))
    slm = jnp.maximum(sl - 1, 1)
    lad_lo, ebits, enz = _fused_probe(load_abs, q_col, rcp_base, slm,
                                      sl, nchunks)
    below = lad_lo > thr                # scales <= sl-1 provably unfit
    efit = ebits <= thr
    hit = (below | (sl == 1)) & efit

    # --- lower_bound(feasible) over scales [1, 63]; 64 = none feasible.
    # Bracket invariant: LB(lo) infeasible (0 = sentinel), LB(hi)
    # feasible (64 = sentinel). On a hit the bracket starts converged
    # (start = sl); on a miss it starts with the slm eval applied.
    lo0 = jnp.where(hit, sl - 1, jnp.where(below, slm, jnp.int32(0)))
    hi0 = jnp.where(hit, sl, jnp.where(below, jnp.int32(64), slm))
    probe0 = jnp.clip(jnp.where(below, sl, slm - 1), lo0 + 1, hi0 - 1)

    def bs_cond(st):
        lo, hi, _, _ = st
        return hi - lo > 1

    def bs_body(st):
        lo, hi, probe, step = st
        feas = _ladder_total(load_abs, q_col, probe, nchunks) <= thr
        lo = jnp.where(feas, lo, probe)
        hi = jnp.where(feas, probe, hi)
        galloping_dn = (lo == 0) & (hi < 64)
        galloping_up = (hi == 64) & (lo > 0)
        nxt = jnp.where(galloping_dn, hi - step,
                        jnp.where(galloping_up, lo + step,
                                  (lo + hi) >> 1))
        step = jnp.where(galloping_dn | galloping_up, step * 2, step)
        nxt = jnp.clip(nxt, lo + 1, hi - 1)
        return (lo, hi, nxt, step)

    _, start, _, _ = jax.lax.while_loop(
        bs_cond, bs_body, (lo0, hi0, probe0, jnp.int32(1)))
    # 64 (unfittable) is not probeable; seed the next frame at 63 so it
    # confirms with one eval instead of falling back to cold bisection.
    seed_ref[0] = jnp.minimum(start, 63)

    # --- exact first-fit walk from the LB start. The fused pass's
    # exact eval at sl is reused: on a hit the loop starts found; when
    # it failed and the walk would begin at sl, skip straight to sl+1.
    s0 = jnp.where(hit, sl + 1,
                   jnp.where(jnp.logical_not(efit) & (start == sl),
                             sl + 1, start))

    def sw_cond(st):
        s, found, _, _ = st
        return jnp.logical_not(found) & (s < 64)

    def sw_body(st):
        s, _, bits, nz = st
        b_s, n_s = _exact_totals(load_abs, q_col, rcp_base, s, nchunks)
        fit = b_s <= thr
        return (s + 1, fit, jnp.where(fit, b_s, bits),
                jnp.where(fit, n_s, nz))

    s_end, found, bits, nz = jax.lax.while_loop(
        sw_cond, sw_body,
        (s0, hit, jnp.where(hit, ebits, 0), jnp.where(hit, enz, 0)))
    scale = jnp.where(found, s_end - 1, jnp.int32(64))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[orow, 0] = jnp.where(
        lane == 0, scale,
        jnp.where(lane == 1, bits, jnp.where(lane == 2, nz, 0)))[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def select_scale_pallas(coefs_zz, thr_ac, *, interpret=False):
    """First-fit quantization-scale selection on device.

    Args:
      coefs_zz: (B, 63, NB) int32 zigzag-ordered AC coefficients in the
        (positions, blocks) layout of ops.bs.encode_frames_symbols.
      thr_ac: (B,) int32 per-frame AC-bit fit thresholds (the exact
        inverse of the byte-budget rule, see ops/bs.py).
    Returns (scale, ac_bits, nz): scale (B,) is the first s in 1..63
    whose exact AC bit total fits (64 if none does — caller errors, like
    mdec.c:723); ac_bits/nz (B,) are that scale's exact totals
    (0 when scale == 64).
    """
    B, P, NB = coefs_zz.shape
    assert P == 63
    nb_pad = -(-NB // TILE) * TILE
    if nb_pad != NB:
        # Zero blocks quantize to all-zero -> contribute nothing.
        coefs_zz = jnp.pad(coefs_zz, ((0, 0), (0, 0), (0, nb_pad - NB)))
    nchunks = nb_pad // TILE

    zz = bs_ops.ZAGZIG[1:]
    qcol = jnp.asarray(bs_ops.QUANT_PSX[zz].astype(np.int32))[:, None]
    rcp = jnp.asarray(
        (1.0 / bs_ops.QUANT_PSX[zz].astype(np.float64)).astype(
            np.float32))[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 63, nb_pad), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, *_: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 1, 128), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    (out,) = pl.pallas_call(
        functools.partial(_select_kernel, nchunks=nchunks),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 1, 128), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(thr_ac, jnp.int32), coefs_zz, qcol, rcp)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2]


def _select_pix_kernel(thr_ref, pix_ref, qcol_ref, rcp_ref, out_ref,
                       coefs_ref, seed_ref, abs_scr, *, nchunks, fpp):
    """Pixel-input variant of :func:`_select_kernel`: FDCT each frame's
    centered pixels into the ``coefs_ref`` output block (signed zigzag
    rows; row 63 zero), then run the identical seeded search reading it
    back — the FDCT runs ONCE per frame here and the emit kernel reuses
    the written coefficients, so the XLA rearrange+FDCT stage never
    runs and its HBM round trip shrinks to this kernel's output DMA.
    The search work hides the FDCT almost entirely (the kernel is
    serialization-bound on its scalar fit decisions).

    ``fpp`` frames ride each grid step (sequential inner loop, same
    seed threading/order as fpp=1): TPU grids execute serially and the
    per-frame work is scalar-decision bound, so halving the step count
    shaves the per-step Mosaic dispatch + block DMA bookkeeping."""
    b = pl.program_id(0)
    q_col = qcol_ref[...]
    rcp_base = rcp_ref[...]

    @pl.when(b == 0)
    def _():
        seed_ref[0] = jnp.int32(0)

    for f in range(fpp):
        _fdct_frame_to_scratch(coefs_ref.at[f], pix_ref, nchunks,
                               abs_dst=abs_scr, f=f)

        def load_abs(ci):
            return abs_scr[0:63, ci * TILE:(ci + 1) * TILE]

        _search_store(thr_ref[b * fpp + f], q_col, rcp_base, load_abs,
                      out_ref, seed_ref, nchunks, orow=f)


@functools.partial(jax.jit, static_argnames=("interpret",))
def select_scale_pix_pallas(pix, thr_ac, *, interpret=False):
    """First-fit scale selection straight from pixel rows.

    Args:
      pix: (B, 64, NB) int32 (or narrower) centered pixels in
        block-sample layout (bs.rearrange output transposed: row 8r+c =
        sample (r, c), column = block in encode order).
      thr_ac: (B,) int32 per-frame AC-bit fit thresholds.
    Returns (scale, ac_bits, nz, coefs): selection exactly like
    :func:`select_scale_pallas` on the FDCT of those pixels (asserted
    equal in tests/test_bs_pallas.py), plus the FDCT itself —
    (B, 64, nb_pad) int32 signed zigzag rows (row p = scan position
    p+1, row 63 zero, lane-padded to the TILE multiple) ready to feed
    :func:`emit_pack_pallas` without re-running any FDCT.
    """
    B, P, NB = pix.shape
    assert P == 64
    nb_pad = -(-NB // TILE) * TILE
    if nb_pad != NB:
        # Zero pixel columns FDCT to zero -> contribute nothing.
        pix = jnp.pad(pix, ((0, 0), (0, 0), (0, nb_pad - NB)))
    nchunks = nb_pad // TILE
    fpp = 2 if B % 2 == 0 else 1       # frames per grid step

    zz = bs_ops.ZAGZIG[1:]
    qcol = jnp.asarray(bs_ops.QUANT_PSX[zz].astype(np.int32))[:, None]
    rcp = jnp.asarray(
        (1.0 / bs_ops.QUANT_PSX[zz].astype(np.float64)).astype(
            np.float32))[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // fpp,),
        in_specs=[pl.BlockSpec((fpp, 64, nb_pad),
                               lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, *_: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((fpp, 1, 128), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((fpp, 64, nb_pad),
                                lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((64, nb_pad), jnp.int32)],
    )
    out, coefs = pl.pallas_call(
        functools.partial(_select_pix_kernel, nchunks=nchunks, fpp=fpp),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
                   jax.ShapeDtypeStruct((B, 64, nb_pad), jnp.int16)],
        interpret=interpret,
    )(jnp.asarray(thr_ac, jnp.int32), pix, qcol, rcp)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2], coefs


def _dc_chain_kernel(dcq_ref, bits_ref, code_ref, *, codec, b_rows):
    """BS v3/v3dc DC-delta chain + closed-form Huffman in ONE Mosaic
    launch. The XLA associative_scan (ops/bs.dc_chain) lowers to ~4
    kernels per log level (~40 tiny launches on a 64-frame batch) and
    was the whole v2-vs-v3dc device gap (~0.25 ms); here the identical
    threshold-function Hillis-Steele scan runs as lane rolls over a
    (3B, Lp) layout — rows = the Cr/Cb/Y chains of every frame, lanes =
    chain position (end-padded with constant elements, which cannot
    disturb prefixes). Semantics match ops/bs.dc_chain +
    dc_bits_code_closed_form exactly (mdec.c:455-480, 159-187);
    asserted in tests/test_bs_pallas.py."""
    d = dcq_ref[...]                              # (3B, Lp) int32
    rows, Lp = d.shape
    neg_inf = jnp.int32(-(1 << 31) + 1)

    r = d & 3
    const = jnp.where(r == 0, d, jnp.where(r == 1, d - 1, d + 1))
    on_half = r == 2
    t = jnp.where(on_half, d, neg_inf)
    a = jnp.where(on_half, d + 2, const)
    b = jnp.where(on_half, d - 2, const)

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, Lp), 1)
    k = 1
    while k < Lp:
        tp = pltpu.roll(t, k, 1)
        ap = pltpu.roll(a, k, 1)
        bp = pltpu.roll(b, k, 1)
        m = lane >= k
        # compose(p=element at i-k, q=current): threshold tp, values
        # q(ap), q(bp).
        na = jnp.where(ap < t, a, b)
        nb_ = jnp.where(bp < t, a, b)
        t = jnp.where(m, tp, t)
        a = jnp.where(m, na, a)
        b = jnp.where(m, nb_, b)
        k *= 2

    last_after = jnp.where(0 < t, a, b)           # prefix applied to 0
    rolled = pltpu.roll(last_after, 1, 1)
    last_before = jnp.where(lane >= 1, rolled, 0)
    deltas = (last_after - last_before) >> 2
    if codec == bs_ops.BS_V3DC:
        deltas = jnp.where(deltas < -0x80, deltas + 0x100, deltas)
        deltas = jnp.where(deltas > 0x80, deltas - 0x100, deltas)

    # Closed-form (bits, code) — same arithmetic as
    # bs.dc_bits_code_closed_form, with type = chain id (row // B:
    # 0=Cr, 1=Cb, 2=Y).
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, Lp), 0)
    is_y = row >= 2 * b_rows
    sd = ((deltas & 0x1FF) ^ 0x100) - 0x100
    sd = jnp.maximum(sd, -255)
    mag = jnp.abs(sd)
    db = ((mag >= 2).astype(jnp.int32) + (mag >= 4) + (mag >= 8)
          + (mag >= 16) + (mag >= 32) + (mag >= 64) + (mag >= 128))
    bits = jnp.where(db == 0, 3, 2 * db + 2)
    bits = jnp.where(is_y & (db >= 3), 2 * db + 1, bits)
    bits = jnp.where(mag == 0, jnp.where(is_y, 3, 2), bits)
    pv_c = jnp.where(db == 0, 1, (1 << (db + 1)) - 2)
    pv_y = jnp.where(db >= 4, (1 << db) - 2,
                     jnp.where(db == 3, 6, jnp.where(db == 2, 5, db)))
    pv = jnp.where(is_y, pv_y, pv_c)
    mask = (1 << (db + 1)) - 1
    suffix = jnp.where(sd > 0, sd & mask, (sd - 1) & mask)
    code = (pv << (db + 1)) | suffix
    code = jnp.where(mag == 0, jnp.where(is_y, 4, 0), code)
    bits_ref[...] = bits
    code_ref[...] = code


@functools.partial(jax.jit, static_argnames=("codec", "interpret"))
def dc_stage_pallas(dc_q, codec, *, interpret=False):
    """(B, NB) clamped quantized DCs -> (dc_bits, dc_code), the v3/v3dc
    DC stage in one Mosaic launch (see :func:`_dc_chain_kernel`).
    Bit-identical to ops/bs._dc_stage for codec BS_V3/BS_V3DC."""
    B, NB = dc_q.shape
    mb = NB // 6
    assert NB == 6 * mb
    bp = -(-B // 8) * 8                           # sublane-pad frames
    if bp != B:
        dc_q = jnp.pad(dc_q, ((0, bp - B), (0, 0)))
    grid = dc_q.reshape(bp, mb, 6)
    ylen = 4 * mb
    Lp = -(-ylen // 128) * 128
    cr = jnp.pad(grid[:, :, 0], ((0, 0), (0, Lp - mb)))
    cb = jnp.pad(grid[:, :, 1], ((0, 0), (0, Lp - mb)))
    y = jnp.pad(grid[:, :, 2:].reshape(bp, ylen),
                ((0, 0), (0, Lp - ylen)))
    stacked = jnp.concatenate([cr, cb, y], axis=0)   # (3*bp, Lp)

    bits3, code3 = pl.pallas_call(
        functools.partial(_dc_chain_kernel, codec=codec, b_rows=bp),
        grid=(1,),
        in_specs=[pl.BlockSpec((3 * bp, Lp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((3 * bp, Lp), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((3 * bp, Lp), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((3 * bp, Lp), jnp.int32),
                   jax.ShapeDtypeStruct((3 * bp, Lp), jnp.int32)],
        interpret=interpret,
    )(stacked.astype(jnp.int32))

    def unstack(x):
        out = jnp.empty((bp, mb, 6), jnp.int32)
        out = out.at[:, :, 0].set(x[:bp, :mb])
        out = out.at[:, :, 1].set(x[bp:2 * bp, :mb])
        out = out.at[:, :, 2:].set(
            x[2 * bp:, :ylen].reshape(bp, mb, 4))
        return out.reshape(bp, NB)[:B]

    return unstack(bits3), unstack(code3).astype(jnp.uint32)


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
                      rcp_ref, streams_ref, bbits_ref, *, nchunks, fpp):
    """``fpp`` frames per grid step (TPU grids are sequential; fat steps
    amortize per-step Mosaic dispatch — the former (B, ntiles) grid paid
    it 4x per frame), statically unrolled over the TILE-wide chunks.
    ``c_ref`` blocks are (fpp, 63, nb_pad) or (fpp, 64, nb_pad) —
    row 63, when present, is the select kernel's zero pad row and is
    ignored."""
    b = pl.program_id(0)
    q_col = qcol_ref[...]
    rcp_base = rcp_ref[...]
    for f in range(fpp):
        s = scale_ref[b * fpp + f]
        for ci in range(nchunks):
            _emit_pack_chunk(
                s, c_ref[f, 0:63, ci * TILE:(ci + 1) * TILE],
                dcc_ref[f, 0, ci * TILE:(ci + 1) * TILE],
                dcb_ref[f, 0, ci * TILE:(ci + 1) * TILE],
                q_col, rcp_base, streams_ref, bbits_ref, ci, f)


def _emit_pack_chunk(s, c, dcc, dcb, q_col, rcp_base, streams_ref,
                     bbits_ref, ci, f=0):
    acc, total2 = _emit_chunk_windows(s, c, dcc, dcb, q_col, rcp_base)
    tp = c.shape[1]
    bbits_ref[f, 0, ci * TILE:(ci + 1) * TILE] = total2[0]
    from . import bitpack_pallas as bpk

    w16 = jnp.stack([acc >> 16, acc & 0xFFFF], axis=1)  # (8, 2, tp)
    streams_ref[f, :, ci * TILE:(ci + 1) * TILE] = \
        w16.reshape(bpk.BCAP, tp).astype(jnp.int32)


def _emit_chunk_windows(s, c, dcc, dcb, q_col, rcp_base):
    """Quantize + Huffman-emit one TILE chunk into eight u32 MSB-first
    window rows; returns (acc (8, tp) uint32, total_bits+2 (1, tp)).
    ``c`` may be the select kernel's int16 coefficients."""
    c = c.astype(jnp.int32)
    tp = c.shape[1]
    dc_code = dcc.reshape(1, tp).astype(jnp.uint32)
    dc_bits = dcb.reshape(1, tp)

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
    # Fused (bits, code): one magnitude-class chain for both instead of
    # the separate ac_bits/ac_code chains (~30% fewer ops here).
    bits_nz, code_nz = bs_ops.ac_bits_code_closed_form(run, ac)
    bits = jnp.where(nz, bits_nz, 0)
    code = jnp.where(nz, code_nz, jnp.uint32(0))

    # --- in-block offsets: DC first, ACs in scan order, EOB last.
    offs = dc_bits + _cumsum_excl_cols(bits)       # (63, TILE)
    total = offs[62:63, :] + bits[62:63, :]        # after last AC

    # --- dense window packing into the (BCAP, TILE) per-block streams
    # (bit-identical to bitpack._pack_block_streams). Accumulate in
    # EIGHT 32-bit MSB-first windows instead of sixteen 16-bit ones: a
    # symbol (<= 22 bits) plus its sub-word offset spans < 64 bits, so
    # its contribution is a precomputed (hi, lo) u32 pair targeting rows
    # q and q+1 — 2 compare/selects per row versus the former
    # shift-window formula evaluated on all 16 u16 rows (~3.5x fewer
    # vector ops in the 65-iteration loop). MSB-first 32-bit windows
    # split exactly into the two MSB-first 16-bit windows downstream.
    from . import bitpack_pallas as bpk

    nrows32 = bpk.BCAP // 2
    row32 = jax.lax.broadcasted_iota(jnp.int32, (nrows32, tp), 0)

    def place(acc, o_row, b_row, c_row):
        # sbits (NOT the enclosing quant scale `s`): the symbol's left
        # shift within its 64-bit window pair, in [11, 62] for b >= 2.
        q = o_row >> 5
        sbits = 64 - (o_row & 31) - b_row
        sh = jnp.clip(sbits - 32, 0, 31).astype(jnp.uint32)
        sl = jnp.clip(32 - sbits, 0, 31).astype(jnp.uint32)
        hi = jnp.where(sbits >= 32, c_row << sh, c_row >> sl)
        lo = jnp.where(sbits < 32,
                       c_row << jnp.clip(sbits, 0, 31).astype(jnp.uint32),
                       jnp.uint32(0))
        d_ = row32 - q
        return acc | jnp.where(d_ == 0, hi, jnp.uint32(0)) \
                   | jnp.where(d_ == 1, lo, jnp.uint32(0))

    acc = jnp.zeros((nrows32, tp), jnp.uint32)
    acc = place(acc, jnp.zeros((1, tp), jnp.int32), dc_bits, dc_code)
    for i in range(63):
        acc = place(acc, offs[i:i + 1], bits[i:i + 1],
                    code[i:i + 1].astype(jnp.uint32))
    acc = place(acc, total, jnp.full((1, tp), 2, jnp.int32),
                jnp.full((1, tp), 0x2, jnp.uint32))
    return acc, total + 2


@functools.partial(jax.jit, static_argnames=("interpret",))
def emit_pack_pallas(coefs_zz, scale, dc_code, dc_bits, *,
                     interpret=False):
    """Fused winner emission + per-block packing.

    One Mosaic pass from zigzag AC coefficients to per-block bitstream
    windows: quantize at the chosen scale, run-length, closed-form
    Huffman bits/codes, in-block offsets, and the dense window pack —
    the (B, NB, 65) code/bit tensors never touch HBM.

    Args:
      coefs_zz: (B, 63, NB) int32 zigzag AC coefficients — or the
        (B, 64, nb_pad) output of :func:`select_scale_pix_pallas`
        (row 63 and pad lanes are zero); pass the TRUE block count via
        ``dc_code``/``dc_bits`` width, which may be narrower than the
        coefficient lanes.
      scale: (B,) int32 winning quant scale (1..63).
      dc_code: (B, NB) uint32/int32 DC Huffman codes.
      dc_bits: (B, NB) int32 DC code lengths.
    Returns (streams (B, NB, BCAP) int32, block_bits (B, NB) int32),
    identical to emitting symbols and running
    bitpack._pack_block_streams (interpret-mode tested). Blocks over
    BCAP*16 bits truncate; callers gate on block_bits and fall back.
    """
    from . import bitpack_pallas as bpk

    B, P, NBC = coefs_zz.shape
    assert P in (63, 64)
    NB = dc_code.shape[1]
    assert NB <= NBC
    nb_pad = -(-NBC // TILE) * TILE
    if nb_pad != NBC:
        coefs_zz = jnp.pad(coefs_zz, ((0, 0), (0, 0), (0, nb_pad - NBC)))
    if nb_pad != NB:
        dc_code = jnp.pad(dc_code, ((0, 0), (0, nb_pad - NB)))
        dc_bits = jnp.pad(dc_bits, ((0, 0), (0, nb_pad - NB)))
    ntiles = nb_pad // TILE

    zz = bs_ops.ZAGZIG[1:]
    qcol = jnp.asarray(bs_ops.QUANT_PSX[zz].astype(np.int32))[:, None]
    rcp = jnp.asarray(
        (1.0 / bs_ops.QUANT_PSX[zz].astype(np.float64)).astype(
            np.float32))[:, None]

    # NEGATIVE RESULT (r5): fpp=2 here REGRESSED (3.2-3.35 vs 2.81 ms
    # FULL on v5e) — unlike the select kernel, emit's per-step blocks
    # are big ((fpp, BCAP, nb_pad) streams out), so doubling them hurts
    # the DMA pipelining more than the halved dispatch count helps.
    fpp = 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // fpp,),
        in_specs=[pl.BlockSpec((fpp, P, nb_pad), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((fpp, 1, nb_pad), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((fpp, 1, nb_pad), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, s: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((fpp, bpk.BCAP, nb_pad),
                         lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fpp, 1, nb_pad), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    streams, bbits = pl.pallas_call(
        functools.partial(_emit_pack_kernel, nchunks=ntiles, fpp=fpp),
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


def _cumsum_excl_lanes(x):
    """Exclusive prefix sum along the lane axis of a (1, L) row via
    Hillis-Steele log-rolls."""
    L = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < L:
        shifted = pltpu.roll(x, k, 1)
        x = x + jnp.where(lane >= k, shifted, 0)
        k *= 2
    rolled = pltpu.roll(x, 1, 1)
    return jnp.where(lane > 0, rolled, 0)


def _emit_prep_kernel(scale_ref, c_ref, dcc_ref, dcb_ref, qcol_ref,
                      rcp_ref, out_ref, acc_scr, *, nchunks, nb_true,
                      eof):
    """:func:`_emit_pack_kernel` + the whole placement prep fused.

    Emission windows accumulate in VMEM scratch; the frame-global bit
    offsets (exclusive lane cumsum of per-block totals, with the
    codec's 10-bit EOF block injected at lane ``nb_true`` and pad lanes
    masked to zero) then funnel-shift every block's stream to its final
    sub-word alignment, LE-u16-pair packed — bit-identical to
    bitpack.streams_to_u32 on this kernel's streams (asserted in
    tests/test_bs_pallas.py), so the XLA prep stage (stream transpose,
    contribution build, byte split) never runs.

    Output rows: 0-8 the placed u32 contribution words, 9 the u32
    offsets e0, 10 the raw per-block bit totals (pad lanes 0, EOF lane
    0 — callers gate overflow on real blocks), 11 lane 0 = the frame's
    total bits including the EOF code."""
    b = pl.program_id(0)
    s = scale_ref[b]
    q_col = qcol_ref[...]
    rcp_base = rcp_ref[...]
    nb_pad = nchunks * TILE

    bb_parts = []
    for ci in range(nchunks):
        acc, total2 = _emit_chunk_windows(
            s, c_ref[0, 0:63, ci * TILE:(ci + 1) * TILE],
            dcc_ref[0, 0, ci * TILE:(ci + 1) * TILE],
            dcb_ref[0, 0, ci * TILE:(ci + 1) * TILE], q_col, rcp_base)
        acc_scr[:, ci * TILE:(ci + 1) * TILE] = acc.astype(jnp.int32)
        bb_parts.append(total2)
    bb_raw = jnp.concatenate(bb_parts, axis=1)      # (1, nb_pad)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb_pad), 1)
    bb_real = jnp.where(lane < nb_true, bb_raw, 0)
    out_ref[0, 10, :] = bb_real[0]
    bb = jnp.where(lane == nb_true, 10, bb_real)
    goff = _cumsum_excl_lanes(bb)
    out_ref[0, 11, :] = jnp.where(lane == 0, jnp.sum(bb), 0)[0]
    out_ref[0, 9, :] = (goff >> 5)[0]

    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, TILE), 0)
    eof_top = jnp.uint32((eof << 6) << 16)
    for ci in range(nchunks):
        sl = slice(ci * TILE, (ci + 1) * TILE)
        acc = acc_scr[:, sl].astype(jnp.uint32)
        lch = lane[:, sl]
        # Pad lanes carry nothing; the EOF lane is a lone 10-bit code
        # in the top bits of stream word 0 (api.py's eof_stream).
        acc = jnp.where(lch < nb_true, acc,
                        jnp.where((lch == nb_true) & (row8 == 0),
                                  eof_top, jnp.uint32(0)))
        g = goff[:, sl]
        sh = (g & 15).astype(jnp.uint32)
        # LE-u16-pair windows t_k = s_{2k+1}<<16 | s_{2k} (u32 rot16 of
        # the MSB-first acc), then per-16-bit-lane funnel by sh:
        #   lo16 <- s_{2k} >> sh | s_{2k-1} << (16-sh)
        #   hi16 <- s_{2k+1} >> sh | s_{2k} << (16-sh)
        # which IS streams_to_u32's c-word pair at even word parity; at
        # odd parity the pairing shifts one c-word down, i.e. row k
        # pairs the previous row's hi16 with this row's lo16.
        t = (acc << 16) | (acc >> 16)
        tprev = jnp.where(row8 == 0, jnp.uint32(0), pltpu.roll(t, 1, 0))
        lo_t = t & 0xFFFF
        hi_t = t >> 16
        hi_prev = tprev >> 16
        v_lo = (lo_t >> sh) | ((hi_prev << (16 - sh)) & 0xFFFF)
        v_hi = (hi_t >> sh) | ((lo_t << (16 - sh)) & 0xFFFF)
        ve = v_lo | (v_hi << 16)                    # even-parity pairs
        vh_prev = jnp.where(row8 == 0, jnp.uint32(0),
                            pltpu.roll(v_hi, 1, 0))
        vo = vh_prev | (v_lo << 16)                 # odd-parity pairs
        par = ((g >> 4) & 1) == 1
        out_ref[0, 0:8, sl] = jnp.where(par, vo, ve).astype(jnp.int32)
        # Tail word: c_16 = s_15 << (16-sh); odd parity pairs it above
        # c_15 (= row 7's hi16 funnel).
        c_tail = (hi_t[7:8] << (16 - sh)) & 0xFFFF
        v8 = jnp.where(par, v_hi[7:8] | (c_tail << 16), c_tail)
        out_ref[0, 8, sl] = v8.astype(jnp.int32)[0]


@functools.partial(jax.jit, static_argnames=("eof", "interpret"))
def emit_prep_pallas(coefs_zz, scale, dc_code, dc_bits, *, eof,
                     interpret=False):
    """Fused winner emission + per-block packing + placement prep.

    Like :func:`emit_pack_pallas` but the kernel also computes the
    frame-global bit offsets and emits the PLACED u32 contribution
    words directly (see :func:`_emit_prep_kernel`), ready for
    bitpack_pallas.place_vals_{gather,mxu}_pallas — neither the
    per-block streams nor the XLA streams_to_u32 stage exist.

    Returns (vals32 (B, NBe, 9) int32, e0 (B, NBe) int32, block_bits
    (B, NB) int32, total_bits (B,) int32) with NBe = the lane-padded
    block count INCLUDING the EOF block at index NB (pad lanes beyond
    it carry zero contributions at monotone offsets).
    """
    B, P, NBC = coefs_zz.shape
    assert P in (63, 64)
    NB = dc_code.shape[1]
    assert NB <= NBC
    nb_pad = -(-NBC // TILE) * TILE
    if nb_pad < NB + 1:          # the EOF block needs a pad lane
        nb_pad += TILE
    if nb_pad != NBC:
        coefs_zz = jnp.pad(coefs_zz, ((0, 0), (0, 0),
                                      (0, nb_pad - NBC)))
    if nb_pad != NB:
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
        grid=(B,),
        in_specs=[pl.BlockSpec((1, P, nb_pad), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, nb_pad), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, nb_pad), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, s: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((63, 1), lambda b, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 16, nb_pad), lambda b, s: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((8, nb_pad), jnp.int32)],
    )
    (out,) = pl.pallas_call(
        functools.partial(_emit_prep_kernel, nchunks=ntiles,
                          nb_true=NB, eof=int(eof)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 16, nb_pad), jnp.int32)],
        interpret=interpret,
    )(scale.astype(jnp.int32), coefs_zz,
      dc_code.astype(jnp.int32)[:, None],
      dc_bits.astype(jnp.int32)[:, None], qcol, rcp)
    vals32 = jnp.transpose(out[:, 0:9, :], (0, 2, 1))
    e0 = out[:, 9, :]
    block_bits = out[:, 10, :NB]
    total_bits = out[:, 11, 0]
    return vals32, e0, block_bits, total_bits
