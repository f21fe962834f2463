"""Stream-level ADPCM encoding: host windowing + one device scan per file.

The reference encodes unit-by-unit inside its muxer loops; here the unit
boundaries (offset, limit) for the whole stream are computed up front, the
units are gathered into a (B, T, 28) tensor, and a single jitted
``lax.scan`` threads decoder state across time while vmapping over channels
(and, in the batch API, over many independent streams).
"""

import functools
import os

import numpy as np
import jax.numpy as jnp

from ..ops import adpcm as ops

SAMPLES_PER_UNIT = ops.SAMPLES_PER_UNIT


def _native_adpcm():
    """The native host ADPCM encoder (psxav_native.cpp), or None when the
    extension cannot build (no toolchain)."""
    try:
        from .. import native
        return native
    except Exception:  # noqa: BLE001 — toolchain-less host: XLA fallback
        return None


def chunk_unit_layout(chunk_lengths):
    """Per-unit (offset, limit) for a channel stream consumed in chunks.

    Each chunk of ``len`` samples becomes ceil(len/28) units; a chunk's last
    unit may be partial (in-block zero padding), and the next chunk starts at
    the next sample — the unit grid is NOT globally 28-aligned
    (adpcm.c:366, filefmt.c:319-341).
    """
    lens = np.asarray(chunk_lengths, np.int64)
    nunits = -(-lens // SAMPLES_PER_UNIT)           # ceil; 0 for ln == 0
    pos = np.concatenate([[0], np.cumsum(lens)[:-1]]) if lens.size \
        else np.zeros(0, np.int64)
    total = int(nunits.sum())
    # Unit u's index within its chunk: global arange minus the chunk's
    # first-unit index, repeated per unit.
    first = np.concatenate([[0], np.cumsum(nunits)[:-1]]) if lens.size \
        else np.zeros(0, np.int64)
    k = np.arange(total, dtype=np.int64) - np.repeat(first, nunits)
    offsets = np.repeat(pos, nunits) + SAMPLES_PER_UNIT * k
    limits = np.minimum(np.repeat(lens, nunits) - SAMPLES_PER_UNIT * k,
                        SAMPLES_PER_UNIT)
    return offsets, limits


def uniform_unit_layout(total_units, samples_available):
    """XA-style layout: unit t covers samples [28t, 28t+28) with limit
    ``available - 28t`` (can be <= 0 for trailing pad units;
    adpcm.c:293-332)."""
    t = np.arange(total_units, dtype=np.int64)
    return t * SAMPLES_PER_UNIT, samples_available - t * SAMPLES_PER_UNIT


_PALLAS_MIN_UNITS = 256   # below this, compile/launch overhead dominates
_PALLAS_SEG_UNITS = 4096  # time-axis segmenting bounds the 128-lane pad


def _tpu_available():
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001 — no device/backend: fall back
        return False


def _unpack_words(words, shift_range):
    """Pallas kernel word output -> (B, T, 28) sample values (byte-view
    based: the D2H arrays are MBs on long files, int64 shift math was a
    measurable slice of the CLI wall-clock)."""
    B, T, W = words.shape
    by = np.ascontiguousarray(words.astype(np.uint32)).view(np.uint8)
    by = by.reshape(B, T, W * 4)
    if shift_range != 12:
        return by[..., :SAMPLES_PER_UNIT]
    out = np.empty((B, T, 2 * W * 4), np.uint8)
    out[..., 0::2] = by & 0x0F
    out[..., 1::2] = by >> 4
    return out[..., :SAMPLES_PER_UNIT]


def _pallas_file_scan(units, lims, p1, p2, *, filter_count, shift_range,
                      lanes, seg):
    """Whole-file fused-kernel encode as ONE device program: a lax.scan
    over fixed-size segments, each step padding the stream axis to
    ``lanes`` on device (host uploads only the real streams; a host-side
    pad would inflate the transfer ~64x for a stereo file) and running
    the Mosaic kernel with exact state threading through the carry."""
    import jax
    import jax.numpy as jnpp

    from ..ops import adpcm_pallas as pk

    B, T, _ = units.shape
    nseg = T // seg
    u = units.reshape(B, nseg, seg, SAMPLES_PER_UNIT).transpose(
        (1, 0, 2, 3))
    lm = lims.reshape(B, nseg, seg).transpose((1, 0, 2))

    def body(carry, xs):
        c1, c2 = carry
        uu, ll = xs
        up = jnpp.zeros((lanes, seg, SAMPLES_PER_UNIT),
                        jnpp.int32).at[:B].set(uu)
        lp = jnpp.zeros((lanes, seg), jnpp.int32).at[:B].set(ll)
        p1p = jnpp.zeros((lanes,), jnpp.int32).at[:B].set(c1)
        p2p = jnpp.zeros((lanes,), jnpp.int32).at[:B].set(c2)
        h, w, s1, s2 = pk.encode_units_pallas(
            up, lp, p1p, p2p, filter_count=filter_count,
            shift_range=shift_range)
        return (s1[:B, -1], s2[:B, -1]), (h[:B], w[:B], s1[:B], s2[:B])

    _, (hs, ws, s1s, s2s) = jax.lax.scan(body, (p1, p2), (u, lm))
    # (nseg, B, seg, ...) -> (B, T, ...)
    def flat(x):
        perm = (1, 0, 2) if x.ndim == 3 else (1, 0, 2, 3)
        return jnpp.transpose(x, perm).reshape((B, T) + x.shape[3:])

    return flat(hs), flat(ws), flat(s1s), flat(s2s)


_pallas_scan_jit = None
_pallas_pcm_jit = None


def _time_buckets(T):
    """Pad/segment policy shared by the Pallas shims: pow2 up to one
    segment, then whole segments (pow2 count)."""
    seg = _PALLAS_SEG_UNITS
    if T <= seg:
        tpad = max(64, 1 << (T - 1).bit_length())
        return tpad, tpad
    nseg = -(-T // seg)
    nseg = 1 << (nseg - 1).bit_length()
    return nseg * seg, seg


def _encode_units_pallas_from_pcm(pcm, offsets, limits, prev1, prev2,
                                  filter_count, shift_range):
    """Pallas encode with DEVICE-side unit building: uploads int16 PCM
    (2 B/sample, half the int32 unit tensor) plus int8 limits, and for
    the uniform 28-grid (whole-file XA/SPU layouts) no offsets at all —
    the tunnel-bound single-file CLI path's H2D drops ~2.3x. Unit gather
    (or reshape), the 128-lane pad, the segment scan, and the uint8
    header narrowing all run in one device program."""
    global _pallas_pcm_jit
    import jax
    import jax.numpy as jnpp

    from ..ops import adpcm_pallas as pk

    if _pallas_pcm_jit is None:
        @functools.partial(
            jax.jit,
            static_argnames=("filter_count", "shift_range", "lanes",
                             "seg", "uniform", "uniform_lim"))
        def run(pcm16, offs, lim8, scalars, *, filter_count, shift_range,
                lanes, seg, uniform, uniform_lim):
            # scalars: (B, 4) int32 = [prev1, prev2, t_last, avail] — one
            # bundled upload instead of four latency-bound small ones.
            p1, p2 = scalars[:, 0], scalars[:, 1]
            t_last, avail = scalars[:, 2], scalars[:, 3]
            B = scalars.shape[0]
            pcm32 = pcm16.astype(jnpp.int32)
            if uniform:
                tpad = pcm16.shape[1] // SAMPLES_PER_UNIT
                units = pcm32.reshape(B, tpad, SAMPLES_PER_UNIT)
            else:
                tpad = offs.shape[1]
                idx = jnpp.clip(
                    offs[:, :, None]
                    + jnpp.arange(SAMPLES_PER_UNIT, dtype=jnpp.int32),
                    0, pcm32.shape[1] - 1)
                units = jnpp.take_along_axis(
                    pcm32, idx.reshape(B, -1), axis=1).reshape(
                    B, tpad, SAMPLES_PER_UNIT)
            if uniform_lim:
                # The whole-file xa/spu/vag layouts: limit(t) is the ramp
                # clip(avail - 28t) — no limits upload at all.
                t_iota = jnpp.arange(tpad, dtype=jnpp.int32)[None, :]
                lim = jnpp.clip(
                    avail[:, None] - SAMPLES_PER_UNIT * t_iota, 0,
                    SAMPLES_PER_UNIT)
            else:
                lim = lim8.astype(jnpp.int32)
            h, w, s1, s2 = _pallas_file_scan(
                units, lim, p1, p2, filter_count=filter_count,
                shift_range=shift_range, lanes=lanes, seg=seg)
            # Final decoder state after the last REAL unit (bucket pad
            # units still mutate state).
            f1 = jnpp.take_along_axis(s1, t_last[:, None], axis=1)[:, 0]
            f2 = jnpp.take_along_axis(s2, t_last[:, None], axis=1)[:, 0]
            # ONE fused D2H payload (per-fetch tunnel latency is 30-400ms
            # — two fetches dominated the CLI wall-clock). 4-bit: 28
            # nibbles use 14 of word 0..3's 16 bytes; the header rides
            # word 3's byte 2 and the states append as one extra unit
            # column. 8-bit: header as an extra word.
            if shift_range == 12:
                w = w.at[:, :, 3].set(w[:, :, 3]
                                      | (h.astype(jnpp.int32) << 16))
            else:
                w = jnpp.concatenate([w, h[:, :, None]], axis=2)
            state = jnpp.zeros((B, 1, w.shape[2]), jnpp.int32)
            state = state.at[:, 0, 0].set(f1).at[:, 0, 1].set(f2)
            return jnpp.concatenate([w, state], axis=1)

        _pallas_pcm_jit = run

    B, T = limits.shape
    N = pcm.shape[1]
    Bp = -(-B // 128) * 128
    tpad, seg_use = _time_buckets(T)
    lim_clip = np.clip(limits, 0, SAMPLES_PER_UNIT).astype(np.int32)
    off64 = np.asarray(offsets, np.int64)
    uniform = bool((off64 == np.arange(T, dtype=np.int64)
                    * SAMPLES_PER_UNIT).all())
    # Per-row ramp detection: limit(t) == clip(avail - 28t)?
    t_iota = np.arange(T, dtype=np.int64) * SAMPLES_PER_UNIT
    avail = lim_clip.astype(np.int64)[:, -1] + t_iota[-1]
    for b in range(B):
        lt = np.nonzero(lim_clip[b] < SAMPLES_PER_UNIT)[0]
        if len(lt):
            avail[b] = t_iota[lt[0]] + lim_clip[b, lt[0]]
    uniform_lim = bool(
        (lim_clip == np.clip(avail[:, None] - t_iota[None, :], 0,
                             SAMPLES_PER_UNIT)).all())
    if uniform:
        npad = tpad * SAMPLES_PER_UNIT
        pcmp = np.zeros((B, npad), np.int16)
        pcmp[:, :min(N, npad)] = pcm[:, :npad]
        offs = np.zeros((B, 1), np.int32)  # unused placeholder
    else:
        npad = max(64, 1 << (max(N, 1) - 1).bit_length())
        pcmp = np.zeros((B, npad), np.int16)
        pcmp[:, :N] = pcm
        offs = np.zeros((B, tpad), np.int32)
        offs[:, :T] = np.clip(off64, 0, max(N - 1, 0))
    if uniform_lim:
        lim8 = np.zeros((B, 1), np.int8)  # unused placeholder
    else:
        lim8 = np.zeros((B, tpad), np.int8)
        lim8[:, :T] = lim_clip
    scalars = np.stack([np.asarray(prev1, np.int64),
                        np.asarray(prev2, np.int64),
                        np.full(B, T - 1, np.int64),
                        avail], axis=1).astype(np.int32)
    fused = np.asarray(_pallas_pcm_jit(
        jnp.asarray(pcmp), jnp.asarray(offs), jnp.asarray(lim8),
        jnp.asarray(scalars),
        filter_count=filter_count, shift_range=shift_range, lanes=Bp,
        seg=seg_use, uniform=uniform, uniform_lim=uniform_lim))
    w = fused[:, :-1]
    s1 = fused[:, -1, 0].copy()
    s2 = fused[:, -1, 1].copy()
    if shift_range == 12:
        headers = ((fused[:, :T, 3] >> 16) & 0xFF).astype(np.uint8)
        w = w[:, :T].copy()
        w[:, :, 3] &= 0xFFFF
    else:
        headers = (fused[:, :T, -1] & 0xFF).astype(np.uint8)
        w = w[:, :T, :-1]
    values = _unpack_words(w, shift_range)
    return (headers, values.astype(np.uint8), s1, s2)


def _encode_units_pallas_padded(units, lim, prev1, prev2, filter_count,
                                shift_range, full_state=False):
    """Run ops.adpcm_pallas on < 128 streams: the fused kernel is ~2.3x
    the XLA scan per unit step, and the CLI's 1-2 channel streams
    otherwise never reach it (reference inner loop: adpcm.c:142-191).
    The whole file runs as one device program (single host round-trip);
    time is bucketed to segment multiples for compile reuse."""
    global _pallas_scan_jit
    import jax
    import jax.numpy as jnpp

    if _pallas_scan_jit is None:
        _pallas_scan_jit = jax.jit(
            _pallas_file_scan,
            static_argnames=("filter_count", "shift_range", "lanes",
                             "seg"))

    B, T = lim.shape
    Bp = -(-B // 128) * 128
    seg = _PALLAS_SEG_UNITS
    # Bucket: pow2 up to one segment, then whole segments (pow2 count).
    if T <= seg:
        tpad = max(64, 1 << (T - 1).bit_length())
        seg_use = tpad
    else:
        nseg = -(-T // seg)
        nseg = 1 << (nseg - 1).bit_length()
        tpad = nseg * seg
        seg_use = seg
    up = np.zeros((B, tpad, SAMPLES_PER_UNIT), np.int32)
    lp = np.zeros((B, tpad), np.int32)
    up[:, :T] = units
    lp[:, :T] = lim
    h, w, s1, s2 = _pallas_scan_jit(
        jnpp.asarray(up), jnpp.asarray(lp),
        jnpp.asarray(prev1, jnpp.int32)[:B],
        jnpp.asarray(prev2, jnpp.int32)[:B],
        filter_count=filter_count, shift_range=shift_range, lanes=Bp,
        seg=seg_use)
    headers = np.asarray(h)[:, :T]
    values = _unpack_words(np.asarray(w), shift_range)[:, :T]
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    if full_state:
        return (headers.astype(np.uint8), values.astype(np.uint8),
                s1[:, :T].copy(), s2[:, :T].copy())
    return (headers.astype(np.uint8), values.astype(np.uint8),
            s1[:, T - 1].copy(), s2[:, T - 1].copy())


def gather_units(channel_samples, offsets, limits):
    """Host-side unit gather: (B, N) samples + (B, T) offsets/limits ->
    ((B, T, 28) int32 units, (B, T) int32 clipped limits)."""
    channel_samples = np.asarray(channel_samples)
    B, N = channel_samples.shape
    T = offsets.shape[1]
    lim = np.clip(limits, -(1 << 30), SAMPLES_PER_UNIT).astype(np.int32)
    # Uniform 28-grid fast path (the XA layout always, and the SPU
    # whole-file layout whose chunks are all full blocks): the gather is
    # a reshape, with the index clip's repeat-last-sample semantics
    # reproduced for the tail pad. The general take_along_axis gather
    # cost ~4x the native encode itself.
    grid = SAMPLES_PER_UNIT * np.arange(T, dtype=np.int64)
    if N > 0 and offsets.shape == (B, T) and \
            np.array_equal(offsets, np.broadcast_to(grid, (B, T))):
        cs = channel_samples.astype(np.int32)
        need = T * SAMPLES_PER_UNIT
        if need > N:
            pad = np.repeat(cs[:, N - 1:N], need - N, axis=1)
            cs = np.concatenate([cs, pad], axis=1)
        return cs[:, :need].reshape(B, T, SAMPLES_PER_UNIT), lim
    idx = offsets[..., None] + np.arange(SAMPLES_PER_UNIT, dtype=np.int64)
    idx = np.clip(idx, 0, max(N - 1, 0))
    units = np.take_along_axis(
        channel_samples.astype(np.int32),
        idx.reshape(B, -1), axis=1).reshape(B, T, SAMPLES_PER_UNIT)
    return units, lim


def encode_unit_streams(channel_samples, offsets, limits, filter_count,
                        shift_range, prev1=None, prev2=None,
                        use_pallas=None):
    """Encode B channel streams' units on device.

    Args:
      channel_samples: (B, N) int16/int32 per-channel contiguous samples.
      offsets: (B, T) int64 start sample of each unit.
      limits: (B, T) int64 per-unit limits (values > 28 behave as 28,
        values <= 0 mask the whole unit).
      use_pallas: route long streams through the fused Mosaic kernel
        (ops/adpcm_pallas.py) with a 128-lane pad; None = auto (TPU only).
    Returns:
      headers (B, T) uint8, nibbles (B, T, 28) uint8, and the exact
      decoder state (prev1, prev2) after the last real unit (bucket
      padding cannot affect it: per-unit states are captured inside the
      scan and sliced at T-1).
    """
    T = offsets.shape[1]
    channel_samples = np.asarray(channel_samples)
    B = channel_samples.shape[0]
    # The Pallas PCM path clips OFFSETS to >= 0 while the host gather
    # clips per-sample INDICES; a negative offset would gather different
    # samples per path. No caller produces one — enforce that here.
    assert offsets.size == 0 or int(np.min(offsets)) >= 0, \
        "unit offsets must be non-negative"
    if T == 0:
        return (np.zeros((B, 0), np.uint8),
                np.zeros((B, 0, SAMPLES_PER_UNIT), np.uint8),
                np.zeros(B, np.int32), np.zeros(B, np.int32))
    if use_pallas is None:
        use_pallas = T >= _PALLAS_MIN_UNITS and _tpu_available()
    if use_pallas:
        # Device-side unit build: uploads int16 PCM instead of the 4x
        # larger int32 unit tensor (the single-file CLI path is bound by
        # the host<->device link, not compute).
        if prev1 is None:
            prev1 = np.zeros(B, np.int32)
        if prev2 is None:
            prev2 = np.zeros(B, np.int32)
        return _encode_units_pallas_from_pcm(
            channel_samples.astype(np.int16), offsets, limits,
            np.asarray(prev1, np.int32), np.asarray(prev2, np.int32),
            filter_count, shift_range)
    units, lim = gather_units(channel_samples, offsets, limits)
    return encode_prepared_units(units, lim, filter_count, shift_range,
                                 prev1=prev1, prev2=prev2,
                                 use_pallas=False)


def encode_prepared_units(units, lim, filter_count, shift_range,
                          prev1=None, prev2=None, use_pallas=None,
                          state_t=None):
    """Encode pre-gathered (B, T, 28) units (see encode_unit_streams; the
    batch runner concatenates many files' streams on B before calling).

    ``state_t``: optional (B,) per-row unit index whose post-state to
    return as the final decoder state (rows padded with masked units
    still mutate state — an all-zero unit encodes; adpcm.c:142-191 runs
    regardless). Default: the last column.
    """
    B, T = lim.shape

    if prev1 is None:
        prev1 = np.zeros(B, np.int32)
    if prev2 is None:
        prev2 = np.zeros(B, np.int32)

    if use_pallas is None:
        use_pallas = T >= _PALLAS_MIN_UNITS and _tpu_available()
    if use_pallas:
        h, v, s1, s2 = _encode_units_pallas_padded(
            units, lim, np.asarray(prev1, np.int32),
            np.asarray(prev2, np.int32), filter_count, shift_range,
            full_state=state_t is not None)
        if state_t is not None:
            rows = np.arange(B)
            s1, s2 = s1[rows, state_t], s2[rows, state_t]
        return h, v, s1, s2

    # No-TPU tier: the native C++ unit encoder (psxav_native.cpp) —
    # the XLA scan formulation is dispatch-bound off-TPU (~0.5 Msps on
    # CPU vs the reference C's 5.7; the plain host loop beats both).
    # PSXAVENC_NO_NATIVE_ADPCM=1 forces the XLA path (tests use it to
    # keep the JAX kernels golden-covered).
    if not os.environ.get("PSXAVENC_NO_NATIVE_ADPCM"):
        native_mod = _native_adpcm()
        if native_mod is not None:
            h, v, s1, s2 = native_mod.adpcm_encode_units(
                np.asarray(units), np.asarray(lim),
                np.asarray(prev1, np.int32), np.asarray(prev2, np.int32),
                filter_count, shift_range)
            if state_t is None:
                f1, f2 = s1[:, T - 1].copy(), s2[:, T - 1].copy()
            else:
                rows = np.arange(B)
                f1, f2 = s1[rows, state_t], s2[rows, state_t]
            return h, v, f1, f2

    # Bucket T to the next power of two so different stream lengths share
    # compiled programs; padding units are fully masked (limit 0) and their
    # outputs are sliced away (the scan is causal, so they cannot affect
    # real units).
    T_pad = max(64, 1 << (T - 1).bit_length())
    if T_pad != T:
        units = np.concatenate(
            [units, np.zeros((B, T_pad - T, SAMPLES_PER_UNIT), np.int32)],
            axis=1)
        lim = np.concatenate([lim, np.zeros((B, T_pad - T), np.int32)],
                             axis=1)
    headers, nibbles, s1, s2 = ops.encode_units_scan(
        jnp.asarray(units), jnp.asarray(lim), jnp.asarray(prev1),
        jnp.asarray(prev2), filter_count=filter_count,
        shift_range=shift_range)
    headers = np.asarray(headers)[:, :T]
    nibbles = np.asarray(nibbles)[:, :T]
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    if state_t is None:
        f1, f2 = s1[:, T - 1], s2[:, T - 1]
    else:
        rows = np.arange(B)
        f1, f2 = s1[rows, state_t], s2[rows, state_t]
    return (headers.astype(np.uint8), nibbles.astype(np.uint8), f1, f2)


def pack_spu_blocks(headers, nibbles, flags=None):
    """(T,) headers + (T, 28) nibbles -> (T, 16) SPU blocks
    (adpcm.c:356-376). ``flags`` fills byte 1 (loop flags)."""
    T = headers.shape[0]
    blocks = np.zeros((T, 16), dtype=np.uint8)
    blocks[:, 0] = headers
    if flags is not None:
        blocks[:, 1] = flags
    pairs = nibbles.reshape(T, 14, 2)
    blocks[:, 2:] = (pairs[:, :, 0] & 0x0F) | (pairs[:, :, 1] << 4)
    return blocks
