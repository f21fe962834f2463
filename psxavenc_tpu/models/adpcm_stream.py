"""Stream-level ADPCM encoding: host windowing + one device scan per file.

The reference encodes unit-by-unit inside its muxer loops; here the unit
boundaries (offset, limit) for the whole stream are computed up front, the
units are gathered into a (B, T, 28) tensor, and a single jitted
``lax.scan`` threads decoder state across time while vmapping over channels
(and, in the batch API, over many independent streams).
"""

import numpy as np
import jax.numpy as jnp

from ..ops import adpcm as ops

SAMPLES_PER_UNIT = ops.SAMPLES_PER_UNIT


def chunk_unit_layout(chunk_lengths):
    """Per-unit (offset, limit) for a channel stream consumed in chunks.

    Each chunk of ``len`` samples becomes ceil(len/28) units; a chunk's last
    unit may be partial (in-block zero padding), and the next chunk starts at
    the next sample — the unit grid is NOT globally 28-aligned
    (adpcm.c:366, filefmt.c:319-341).
    """
    offsets, limits = [], []
    pos = 0
    for ln in chunk_lengths:
        u = 0
        while u < ln:
            offsets.append(pos + u)
            limits.append(min(ln - u, SAMPLES_PER_UNIT))
            u += SAMPLES_PER_UNIT
        pos += ln
    return np.asarray(offsets, np.int64), np.asarray(limits, np.int64)


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
    """Pallas kernel word output -> (B, T, 28) sample values."""
    vbits = 4 if shift_range == 12 else 8
    per = 32 // vbits
    shifts = np.arange(per, dtype=np.int64) * vbits
    vals = (words[..., :, None] >> shifts) & ((1 << vbits) - 1)
    return vals.reshape(words.shape[0], words.shape[1], -1)[
        ..., :SAMPLES_PER_UNIT]


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


def _encode_units_pallas_padded(units, lim, prev1, prev2, filter_count,
                                shift_range):
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
    return (headers.astype(np.uint8), values.astype(np.uint8),
            s1[:, T - 1].copy(), s2[:, T - 1].copy())


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
    channel_samples = np.asarray(channel_samples)
    B, N = channel_samples.shape
    T = offsets.shape[1]
    if T == 0:
        return (np.zeros((B, 0), np.uint8),
                np.zeros((B, 0, SAMPLES_PER_UNIT), np.uint8),
                np.zeros(B, np.int32), np.zeros(B, np.int32))
    idx = offsets[..., None] + np.arange(SAMPLES_PER_UNIT, dtype=np.int64)
    idx = np.clip(idx, 0, max(N - 1, 0))
    units = np.take_along_axis(
        channel_samples.astype(np.int32),
        idx.reshape(B, -1), axis=1).reshape(B, T, SAMPLES_PER_UNIT)
    lim = np.clip(limits, -(1 << 30), SAMPLES_PER_UNIT).astype(np.int32)

    if prev1 is None:
        prev1 = np.zeros(B, np.int32)
    if prev2 is None:
        prev2 = np.zeros(B, np.int32)

    if use_pallas is None:
        use_pallas = T >= _PALLAS_MIN_UNITS and _tpu_available()
    if use_pallas:
        return _encode_units_pallas_padded(
            units, lim, np.asarray(prev1, np.int32),
            np.asarray(prev2, np.int32), filter_count, shift_range)

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
    return (headers.astype(np.uint8), nibbles.astype(np.uint8),
            s1[:, T - 1], s2[:, T - 1])


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
