"""Mosaic kernels for the block bit-packer (ops/bitpack.py).

Three kernels, all bit-identical to their XLA counterparts (interpret
tests + on-device cross-checks):

- ``pack_block_streams_pallas`` — phase 1, per-block dense packing with
  blocks on lanes (the XLA fori version fuses comparably in practice).
- ``place_streams_pallas`` — phase 2 as a sequential sliding-window
  sweep with dynamic lane rotates. Measured SLOWER than the u32-pair
  placement scatter on v5e (the per-block scalar->vector serialization
  dominates); kept as a reference implementation.
- ``place_streams_gather_pallas`` — phase 2 output-stationary: each
  128-u32 output tile reduces the contributions of the blocks
  overlapping it (contiguous dynamic-row loads + compare/select/sum,
  no scatter, no rotates).

Bit order matches the reference packer (mdec.c:321-333): 16-bit groups
filled MSB-first; the caller emits little-endian byte pairs.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BCAP = 16            # per-block stream words (== bitpack.BLOCK_CAP_WORDS)
_GROUP = 128 // BCAP  # blocks per 128-lane row
PACK_TILE = 512       # blocks per phase-1 tile (lane axis)


def _pack_kernel(codes_ref, bits_ref, streams_ref, bbits_ref, *, nsym):
    """Phase 1: per-block dense packing, blocks on lanes.

    For each of the 65 symbols (statically unrolled), its three possible
    16-bit word parts accumulate into a (BCAP, TILE) window via the same
    windowed shift/mask formula as ops/bitpack._pack_block_streams — all
    VPU ops out of VMEM, no scatter, no HBM round-trips."""
    tp = codes_ref.shape[2]
    ws = jax.lax.broadcasted_iota(jnp.int32, (BCAP, tp), 0) << 4
    acc = jnp.zeros((BCAP, tp), jnp.uint32)
    o = jnp.zeros((1, tp), jnp.int32)
    one = jnp.uint32(1)
    for i in range(nsym):
        cd = codes_ref[0, i, :].reshape(1, tp).astype(jnp.uint32)
        b = bits_ref[0, i, :].reshape(1, tp)
        end = o + b
        lo = jnp.maximum(o, ws)
        hi = jnp.minimum(end, ws + 16)
        n = hi - lo
        valid = n > 0
        rsh = jnp.clip(end - hi, 0, 31).astype(jnp.uint32)
        nb_ = jnp.clip(n, 0, 31).astype(jnp.uint32)
        chunk = (cd >> rsh) & ((one << nb_) - one)
        lsh = jnp.clip(ws + 16 - hi, 0, 31).astype(jnp.uint32)
        acc = acc | jnp.where(valid, chunk << lsh, jnp.uint32(0))
        o = end
    streams_ref[0] = acc.astype(jnp.int32)
    bbits_ref[0] = o


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_block_streams_pallas(codes, bits, *, interpret=False):
    """Per-block packing on device: (B, NBe, S) symbols ->
    ((B, NBe, BCAP) u16-valued streams, (B, NBe) block bit counts).
    Bit-identical to ops/bitpack._pack_block_streams (interpret-mode
    tested); blocks whose stream exceeds BCAP*16 bits produce truncated
    windows — callers gate on the bit counts and fall back."""
    B, NBe, S = codes.shape
    nbe_pad = -(-NBe // PACK_TILE) * PACK_TILE
    ct = jnp.transpose(codes.astype(jnp.int32), (0, 2, 1))
    bt = jnp.transpose(bits.astype(jnp.int32), (0, 2, 1))
    if nbe_pad != NBe:
        ct = jnp.pad(ct, ((0, 0), (0, 0), (0, nbe_pad - NBe)))
        bt = jnp.pad(bt, ((0, 0), (0, 0), (0, nbe_pad - NBe)))
    ntiles = nbe_pad // PACK_TILE

    streams, bbits = pl.pallas_call(
        functools.partial(_pack_kernel, nsym=S),
        grid=(B, ntiles),
        in_specs=[
            pl.BlockSpec((1, S, PACK_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, PACK_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BCAP, PACK_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PACK_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, BCAP, nbe_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, nbe_pad), jnp.int32),
        ],
        interpret=interpret,
    )(ct, bt)
    streams = jnp.transpose(streams, (0, 2, 1))[:, :NBe]
    return streams, bbits[:, 0, :NBe]


def _kernel(goff_ref, streams_ref, out_ref, *, nrows):
    out_ref[...] = jnp.zeros_like(out_ref)
    # Memory-safety clamp: with an unfittable frame (scale-64 error case,
    # caller raises later) offsets can exceed the capacity; flushes must
    # stay inside the padded output.
    wlim = out_ref.shape[2] - 256

    lanes128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    group_id = lanes128 >> 4
    z128 = jnp.zeros((1, 128), jnp.uint32)

    def row_body(r, carry):
        win, base = carry
        row = streams_ref[0, r].reshape(1, 128).astype(jnp.uint32)
        # Vectorize the whole row's bit shifting: each 16-lane group gets
        # its own block's sub-word shift, so the 8 blocks' contributions
        # are computed in one pass.
        gs = [goff_ref[0, 0, r * _GROUP + k] for k in range(_GROUP)]
        sh = z128
        for k in range(_GROUP):
            sh = jnp.where(group_id == k, jnp.uint32(gs[k] & 15), sh)
        row_prev = jnp.where((lanes128 & 15) != 0,
                             pltpu.roll(row, 1, axis=1), jnp.uint32(0))
        # Word i of a placed stream is (s[i] >> sh) | (s[i-1] << (16-sh)),
        # MSB-first semantics; sh == 0 vanishes under the & 0xFFFF mask.
        main = ((row >> sh) | ((row_prev << (16 - sh)) & 0xFFFF))
        tail = (row << (16 - sh)) & 0xFFFF  # lane 16k+15 = block k's tail
        main256 = jnp.concatenate([main, z128], axis=1)
        tail256 = jnp.concatenate([tail, z128], axis=1)

        for k in range(_GROUP):
            w0 = gs[k] >> 4
            rel = w0 - base

            # Flush the lower half once the write cursor passes it. rel
            # advances by at most BCAP+1 per block, so one flush keeps
            # rel in [0, 128 + BCAP + 1) and rel + BCAP + 2 inside 256.
            flush = rel >= 128

            @pl.when(flush)
            def _():
                out_ref[0, 0, pl.ds(pl.multiple_of(
                    jnp.minimum(base, wlim), 128), 128)] = \
                    win[0, :128].astype(jnp.int32)

            win = jnp.where(flush,
                            jnp.where(lanes < 128,
                                      pltpu.roll(win, 128, axis=1),
                                      jnp.uint32(0)),
                            win)
            base = jnp.where(flush, base + 128, base)
            rel = jnp.where(flush, rel - 128, rel)

            # Block k's 17-word contribution gathered to lanes [0, 17):
            # main words from lanes [16k, 16k+16), tail word to lane 16.
            mk = pltpu.roll(main256, (256 - BCAP * k) % 256, axis=1) \
                if k else main256
            mk = jnp.where(lanes < BCAP, mk, jnp.uint32(0))
            tk = pltpu.roll(tail256, (16 - (BCAP * k + 15)) % 256,
                            axis=1)
            contrib = mk | jnp.where(lanes == BCAP, tk, jnp.uint32(0))
            win = win | pltpu.roll(contrib, rel, axis=1)
        return win, base

    win, base = jax.lax.fori_loop(
        0, nrows, row_body,
        (jnp.zeros((1, 256), jnp.uint32), jnp.int32(0)))
    base = jnp.minimum(base, wlim)
    out_ref[0, 0, pl.ds(pl.multiple_of(base, 128), 128)] = \
        win[0, :128].astype(jnp.int32)
    out_ref[0, 0, pl.ds(pl.multiple_of(base + 128, 128), 128)] = \
        win[0, 128:].astype(jnp.int32)


_GW = 32  # candidate blocks per gather window (~tile occupancy)


def _gather_kernel(j0_ref, nwin_ref, e0_ref, vals_ref, out_ref, *,
                   ntiles):
    """One grid step per frame (TPU grids are sequential — fat steps beat
    the former (B, ntiles) grid's per-step dispatch), looping output
    tiles inside. Contributions are bit-disjoint: the 9 per-candidate
    offsets map to distinct lanes (OR-accumulated, one compare/select
    each) and distinct candidates never share set bits, so one final
    int32 sum over the candidate axis per tile replaces per-window
    reductions. Window starts are 8-aligned (j0 prepped on host) so the
    dynamic sublane loads stay on native sublane boundaries."""
    b = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_GW, 128), 1)

    def tile_body(t, carry):
        j0 = pl.multiple_of(j0_ref[b, t], 8)
        nw = nwin_ref[b, t]
        tile_start = t * 128

        def win_body(w, acc2d):
            j = pl.multiple_of(j0 + w * _GW, 8)
            e = e0_ref[0, pl.ds(j, _GW), 0].reshape(_GW, 1) - tile_start
            vals = vals_ref[0, pl.ds(j, _GW), :]
            diff = lanes - e                       # (GW, 128)
            contrib = jnp.zeros((_GW, 128), jnp.int32)
            for i in range(9):
                contrib = contrib | jnp.where(diff == i,
                                              vals[:, i:i + 1], 0)
            # Distinct candidates never share set bits, so OR == +; the
            # 2-D accumulator defers the cross-sublane reduction to one
            # per tile.
            return acc2d | contrib

        acc = jax.lax.fori_loop(0, nw, win_body,
                                jnp.zeros((_GW, 128), jnp.int32))
        out_ref[0, 0, pl.ds(pl.multiple_of(t * 128, 128), 128)] = \
            jnp.sum(acc, axis=0)
        return carry

    jax.lax.fori_loop(0, ntiles, tile_body, 0)


import os as _os

_MW = int(_os.environ.get("PSXAVENC_MXU_MW", "256"))
"""Candidate blocks per window load for the MXU placement kernel.
256 covers a whole 4-tile segment's blocks in one load at 320x240
budgets (inner window loop runs once); sweep on v5e at TPI=4:
64/128/256/512 -> 3.76/3.63/3.25/3.81 ms full-pipeline."""
_TPI = int(_os.environ.get("PSXAVENC_MXU_TPI", "4"))
"""128-u32 output tiles per segment iteration (env-tunable for perf
sweeps; 4 measured best on v5e — per-iteration Mosaic overhead
dominated at 1; sweep 1/2/4/8 -> 5.02/4.26/3.49/3.67 ms)."""

# The kernel's dynamic window loads promise 8-aligned starts
# (pl.multiple_of(j0 + w * _MW, 8) with j0 &~7); a stride off that grid
# would silently misalign them. Explicit raise (not assert): these are
# user-controllable env values and must fail under python -O too.
if _MW % 8 != 0 or _MW <= 0:
    raise ValueError("PSXAVENC_MXU_MW must be a positive multiple of 8")
if _TPI <= 0:
    raise ValueError("PSXAVENC_MXU_TPI must be positive")


def _mxu_place_kernel(j0_ref, nwin_ref, e0_ref, bytes_ref, out_ref, *,
                      nsegs):
    """Output-stationary placement via one-hot matmuls: per segment of
    _TPI output tiles, the candidate windows' 36 byte-planes (9 u32
    contribution slots x 4 bytes) spread to their lanes with a
    (window, L) one-hot of the u32 offsets on the MXU, then 9 static
    lane-rolls reassemble the i-slots and 4 shifts recombine the bytes.
    Contributions are bit-disjoint across candidates, so every
    per-(plane, lane) sum stays <= 255 — exact in bf16/f32. Fat
    segments (_TPI tiles per sequential iteration) amortize the
    per-iteration Mosaic overhead that dominated the one-tile-per-step
    variant."""
    b = pl.program_id(0)
    L = _TPI * 128 + 128                 # +128: left margin 8 wraps to
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_MW, L), 1)  # >= TPI*128

    def seg_body(t, carry):
        j0 = pl.multiple_of(j0_ref[b, t], 8)
        nw = nwin_ref[b, t]
        seg_start = t * (_TPI * 128)

        def win_body(w, g):
            j = pl.multiple_of(j0 + w * _MW, 8)
            e = e0_ref[0, pl.ds(j, _MW), 0].reshape(_MW, 1)
            vb = bytes_ref[0, pl.ds(j, _MW), :]          # (_MW, 36) bf16
            onehot = (e - seg_start + 8 == lanes).astype(jnp.bfloat16)
            return g + jax.lax.dot_general(
                vb, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (36, L)

        g = jax.lax.fori_loop(
            0, nw, win_body, jnp.zeros((36, L), jnp.float32))
        gi = g.astype(jnp.int32)
        # Slot i's bytes live at lanes e+8; they belong at output lane
        # e+i, i.e. roll left by (8 - i). Left-margin blocks (e down to
        # seg_start-8) wrap to lanes >= L-8 > _TPI*128 and are not
        # stored; they re-enter as the previous segment's in-range rows.
        acc = jnp.zeros((4, L), jnp.int32)
        for i in range(9):
            sh = (L - (8 - i)) % L
            part = gi[4 * i:4 * i + 4]
            acc = acc + (pltpu.roll(part, sh, 1) if sh else part)
        word = (acc[0:1] | (acc[1:2] << 8) | (acc[2:3] << 16)
                | (acc[3:4] << 24))
        out_ref[0, 0, pl.ds(pl.multiple_of(t * (_TPI * 128), 128),
                            _TPI * 128)] = word[0, :_TPI * 128]
        return carry

    jax.lax.fori_loop(0, nsegs, seg_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("capacity_words", "interpret"))
def place_streams_mxu_pallas(streams, goff, total_bits, *,
                             capacity_words, interpret=False):
    """MXU variant of :func:`place_streams_gather_pallas` (same args and
    bit-identical output): the compare/select spreading runs as one-hot
    matmuls instead of 9 per-candidate lane selects."""
    from . import bitpack as bp

    B, NBe, bcap = streams.shape
    assert bcap == BCAP
    vals32, e0 = bp.streams_to_u32(streams, goff)         # (B, NBe, 9)
    return place_vals_mxu_pallas(vals32, e0,
                                 capacity_words=capacity_words,
                                 interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("capacity_words", "interpret"))
def place_vals_mxu_pallas(vals32, e0, *, capacity_words,
                          interpret=False):
    """MXU placement from precomputed placed-u32 contributions — the
    emit kernel's fused prep (bs_pallas.emit_prep_pallas) feeds this
    directly, skipping the XLA streams_to_u32 stage entirely."""
    B, NBe, _ = vals32.shape
    by = jnp.stack([(vals32.astype(jnp.uint32) >> (8 * k)) & 0xFF
                    for k in range(4)],
                   axis=-1)                               # (B, NBe, 9, 4)
    vb = by.reshape(B, NBe, 36).astype(jnp.bfloat16)

    cap32 = (capacity_words + 1) // 2
    seg = _TPI * 128
    nsegs = -(-cap32 // seg)
    bounds = jnp.arange(nsegs, dtype=jnp.int32) * seg
    j0 = jax.vmap(lambda e: jnp.searchsorted(e, bounds - 8,
                                             side="left"))(e0)
    j0 = j0 & ~7
    j1 = jax.vmap(lambda e: jnp.searchsorted(e, bounds + seg,
                                             side="left"))(e0)
    nwin = -(-(j1 - j0) // _MW)

    pad = _MW * 8
    vb = jnp.pad(vb, ((0, 0), (0, pad), (0, 0)))
    e0p = jnp.pad(e0, ((0, 0), (0, pad)),
                  constant_values=jnp.int32(1 << 30))

    out = pl.pallas_call(
        functools.partial(_mxu_place_kernel, nsegs=nsegs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, NBe + pad, 1),
                             lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NBe + pad, 36),
                             lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, nsegs * seg),
                                   lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, nsegs * seg), jnp.int32),
        interpret=interpret,
    )(j0.astype(jnp.int32), nwin.astype(jnp.int32),
      e0p[..., None], vb)

    out32 = out[:, 0].astype(jnp.uint32)[:, :cap32]
    words = jnp.stack([out32 & 0xFFFF, out32 >> 16], axis=-1).reshape(
        B, -1)
    return words[:, :capacity_words].astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("capacity_words", "interpret"))
def place_streams_gather_pallas(streams, goff, total_bits, *,
                                capacity_words, interpret=False):
    """Output-stationary bitstream placement: each 128-u32 output tile
    sums the (bit-disjoint) contributions of the blocks overlapping it.

    The per-block u32 triples are precomputed densely in XLA (bit shift
    to the global sub-word offset, even-word alignment, little-endian
    u16-pair packing); the kernel then needs only contiguous dynamic-row
    loads and compare/select/reduce — no scatter, no dynamic rotates.
    Per frame the candidate windows are located with one searchsorted
    over the monotone block offsets (prefetched scalars).

    Args/semantics match :func:`place_streams_pallas`; bit-identical to
    the XLA scatter placement.
    """
    from . import bitpack as bp

    B, NBe, bcap = streams.shape
    assert bcap == BCAP
    # The same placed-u32 definition as the XLA scatter path.
    vals32, e0 = bp.streams_to_u32(streams, goff)         # (B, NBe, 9)
    return place_vals_gather_pallas(vals32, e0,
                                    capacity_words=capacity_words,
                                    interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("capacity_words", "interpret"))
def place_vals_gather_pallas(vals32, e0, *, capacity_words,
                             interpret=False):
    """Gather placement from precomputed placed-u32 contributions (see
    :func:`place_vals_mxu_pallas`)."""
    B, NBe, _ = vals32.shape
    cap32 = (capacity_words + 1) // 2
    ntiles = -(-cap32 // 128)
    # Candidate block windows per output tile from the monotone offsets.
    bounds = jnp.arange(ntiles, dtype=jnp.int32) * 128
    j0 = jax.vmap(lambda e: jnp.searchsorted(e, bounds - 8,
                                             side="left"))(e0)
    j0 = j0 & ~7  # sublane-aligned window starts (kernel loads)
    j1 = jax.vmap(lambda e: jnp.searchsorted(e, bounds + 128,
                                             side="left"))(e0)
    nwin = -(-(j1 - j0) // _GW)

    # Pad rows so dynamic _GW-row loads stay in bounds; sentinel offsets
    # never match a tile.
    pad = _GW * 8
    vals32 = jnp.pad(vals32, ((0, 0), (0, pad), (0, 7)))
    e0p = jnp.pad(e0, ((0, 0), (0, pad)),
                  constant_values=jnp.int32(1 << 30))

    out = pl.pallas_call(
        functools.partial(_gather_kernel, ntiles=ntiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, NBe + pad, 1),
                             lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NBe + pad, 16),
                             lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, ntiles * 128),
                                   lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, ntiles * 128), jnp.int32),
        interpret=interpret,
    )(j0.astype(jnp.int32), nwin.astype(jnp.int32),
      e0p[..., None], vals32.astype(jnp.int32))

    out32 = out[:, 0].astype(jnp.uint32)[:, :cap32]
    words = jnp.stack([out32 & 0xFFFF, out32 >> 16], axis=-1).reshape(
        B, -1)
    return words[:, :capacity_words].astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("capacity_words", "interpret"))
def place_streams_pallas(streams, goff, total_bits, *, capacity_words,
                         interpret=False):
    """Concatenate per-block bit streams on device.

    Args:
      streams: (B, NBe, BCAP) int32/uint32 u16-valued per-block words.
      goff: (B, NBe) int32 global bit offset of each block (monotonic).
      total_bits: (B,) int32 total stream bits (pads the tail offsets).
      capacity_words: static output width.

    Returns (B, capacity_words) int32 words, identical to the XLA
    scatter placement (ops/bitpack._place_streams).
    """
    B, NBe, bcap = streams.shape
    assert bcap == BCAP
    nbe_pad = -(-NBe // _GROUP) * _GROUP
    if nbe_pad != NBe:
        streams = jnp.pad(streams, ((0, 0), (0, nbe_pad - NBe), (0, 0)))
        # Padding blocks carry zero words; park them at the stream end so
        # their (zero) contributions stay in-bounds and monotonic.
        pad_off = jnp.broadcast_to(total_bits[:, None],
                                   (B, nbe_pad - NBe))
        goff = jnp.concatenate([goff, pad_off], axis=1)
    nrows = nbe_pad // _GROUP

    # Room for the final 256-word window flush past the last used word.
    wpad = -(-(capacity_words + 384) // 128) * 128

    # Singleton second-minor dims keep the Mosaic block-shape rules happy
    # (the batch axis rides the grid).
    out = pl.pallas_call(
        functools.partial(_kernel, nrows=nrows),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, nbe_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nrows, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, wpad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, wpad), jnp.int32),
        interpret=interpret,
    )(goff.astype(jnp.int32)[:, None], streams.reshape(B, nrows, 128),
      )
    return out[:, 0, :capacity_words]
