"""SPU/XA-ADPCM encoder kernels (JAX, TPU-first).

The reference encoder (libpsxav/adpcm.c:39-191) processes one 28-sample unit
at a time with a scalar triple loop: for each of 4-5 prediction filters it
derives a minimum shift, tries up to 3 shifts around it, and simulates the
quantize/decode feedback loop per sample, picking the (filter, shift) pair
with the lowest mean squared error.

TPU-native formulation:

- the (filter × shift) candidate search is a ``vmap`` over 12-15 lanes;
- the 28-sample decoded-state recurrence (adpcm.c:109-137) is inherently
  sequential and is unrolled inside the per-unit step;
- units along time thread ``(prev1, prev2)`` decoder state and therefore run
  under ``lax.scan`` (adpcm.c state threading via psx_audio_encoder_state_t);
- everything orthogonal — channels, streams, batched files — is vmapped on
  top, which is where the TPU's vector width comes from.

All arithmetic is int32 with C semantics (arithmetic right shifts, two's
complement wrap) so results are bit-exact with the reference. The candidate
MSE is an exact 38-bit quantity; it is carried as a normalized (hi, lo)
uint16-limb pair in int32 so ties break exactly like the reference's strict
``best_mse > mse`` comparison (adpcm.c:177).

Reference behavior citations: libpsxav/adpcm.c:29-37 (constants),
adpcm.c:39-79 (find_min_shift), adpcm.c:81-140 (attempt_to_encode),
adpcm.c:142-191 (candidate search).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLES_PER_UNIT = 28

# Prediction filter coefficients (adpcm.c:36-37). XA uses the first 4,
# SPU all 5 (adpcm.c:33-34).
FILTER_K1 = np.array([0, 60, 115, 98, 122], dtype=np.int32)
FILTER_K2 = np.array([0, 0, -52, -55, -60], dtype=np.int32)

SHIFT_RANGE_4BPS = 12
SHIFT_RANGE_8BPS = 8
XA_FILTER_COUNT = 4
SPU_FILTER_COUNT = 5


def _predict(k1, k2, prev1, prev2):
    """(k1*prev1 + k2*prev2 + 32) >> 6 with arithmetic shift (adpcm.c:66)."""
    return (k1 * prev1 + k2 * prev2 + 32) >> 6


def _find_min_shift(prev1, prev2, raw, k1, k2, shift_range):
    """Minimum shift for one filter over one 28-sample unit (adpcm.c:39-79).

    The residual pass uses *raw* samples as the predictor history (no
    quantization feedback), so it is fully parallel across the unit.
    """
    # prev1 at step i is raw[i-1] (raw[-1] := prev1), prev2 is raw[i-2].
    p1 = jnp.concatenate([prev1[None], raw[:-1]])
    p2 = jnp.concatenate([prev2[None], prev1[None], raw[:-2]])
    resid = raw - _predict(k1, k2, p1, p2)
    s_min = jnp.minimum(jnp.min(resid), 0)
    s_max = jnp.maximum(jnp.max(resid), 0)

    # right_shift = first r in [0, shift_range) satisfying both range
    # conditions, saturating at shift_range (the two while loops at
    # adpcm.c:73-74 compose to exactly this because both predicates are
    # monotone in r).
    rs = jnp.arange(shift_range + 1, dtype=jnp.int32)
    hi_ok = (s_max >> rs) <= (0x7FFF >> shift_range)
    lo_ok = (s_min >> rs) >= (-0x8000 >> shift_range)
    ok = hi_ok & lo_ok
    right_shift = jnp.where(jnp.any(ok), jnp.argmax(ok).astype(jnp.int32),
                            jnp.int32(shift_range))
    return jnp.int32(shift_range) - right_shift


def _attempt(prev1, prev2, raw, k1, k2, sample_shift, shift_range):
    """Simulate encode+decode for one candidate (adpcm.c:81-140).

    Returns (nibbles[28], new_prev1, new_prev2, mse_hi, mse_lo) where the MSE
    is normalized so that mse == mse_hi * 2**16 + mse_lo exactly.
    """
    sample_mask = 0xFFFF >> shift_range
    min_e = -0x8000 >> shift_range
    max_e = 0x7FFF >> shift_range
    half = 1 << (shift_range - 1)

    p1, p2 = prev1, prev2
    hi = jnp.int32(0)
    lo = jnp.int32(0)
    nibbles = []
    for i in range(SAMPLES_PER_UNIT):
        s = raw[i]
        pred = _predict(k1, k2, p1, p2)
        enc = (((s - pred) << sample_shift) + half) >> shift_range
        enc = jnp.clip(enc, min_e, max_e) & sample_mask
        # int16 reinterpretation of (enc << shift_range) (adpcm.c:120).
        dec = (enc << shift_range) & 0xFFFF
        dec = dec - ((dec & 0x8000) << 1)
        dec = jnp.clip((dec >> sample_shift) + pred, -0x8000, 0x7FFF)
        err = dec - s  # |err| <= 0xFFFF
        # Exact |err|^2 accumulation in two 16-bit limbs: with err = a*256+b,
        # err^2 = a^2 * 2^16 + (2*a*b*256 + b^2), the low part < 2^25.
        ae = jnp.abs(err)
        a = ae >> 8
        b = ae & 0xFF
        low = 2 * a * b * 256 + b * b
        hi = hi + a * a + (low >> 16)
        lo = lo + (low & 0xFFFF)
        nibbles.append(enc)
        p2 = p1
        p1 = dec

    hi = hi + (lo >> 16)
    lo = lo & 0xFFFF
    return jnp.stack(nibbles), p1, p2, hi, lo


def encode_unit(prev1, prev2, samples, limit, filter_count, shift_range):
    """Encode one 28-sample unit: full candidate search (adpcm.c:142-191).

    Args:
      prev1, prev2: int32 decoder state (decoded samples).
      samples: (28,) int32.
      limit: int32; samples at positions >= limit are treated as 0
        (adpcm.c:65,110).
      filter_count: static, 4 (XA) or 5 (SPU).
      shift_range: static, 12 (4-bit) or 8 (8-bit).

    Returns (header_byte, nibbles[28], new_prev1, new_prev2).
    """
    idx = jnp.arange(SAMPLES_PER_UNIT, dtype=jnp.int32)
    raw = jnp.where(idx < limit, samples, 0).astype(jnp.int32)

    k1 = jnp.asarray(FILTER_K1[:filter_count])
    k2 = jnp.asarray(FILTER_K2[:filter_count])

    min_shifts = jax.vmap(
        lambda a, b: _find_min_shift(prev1, prev2, raw, a, b, shift_range)
    )(k1, k2)  # (F,)

    # Candidates in reference order: filter-major, shift ascending
    # (adpcm.c:158-183). Clipping may duplicate shifts at the range edges;
    # duplicates tie on MSE and first-wins selection keeps the result
    # identical to the reference's [max(0,ms-1), min(range,ms+1)] loop.
    deltas = jnp.array([-1, 0, 1], dtype=jnp.int32)
    cand_shift = jnp.clip(min_shifts[:, None] + deltas[None, :], 0,
                          shift_range).reshape(-1)  # (F*3,)
    cand_filter = jnp.repeat(jnp.arange(filter_count, dtype=jnp.int32), 3)
    cand_k1 = jnp.repeat(k1, 3)
    cand_k2 = jnp.repeat(k2, 3)

    nibbles, np1, np2, hi, lo = jax.vmap(
        lambda kk1, kk2, sh: _attempt(prev1, prev2, raw, kk1, kk2, sh,
                                      shift_range)
    )(cand_k1, cand_k2, cand_shift)

    # Ordered argmin on the exact (hi, lo) MSE: strictly-smaller updates only,
    # matching `best_mse > proposed.mse` (adpcm.c:177).
    n_cand = filter_count * 3
    best = jnp.int32(0)
    bh, bl = hi[0], lo[0]
    for c in range(1, n_cand):
        better = (hi[c] < bh) | ((hi[c] == bh) & (lo[c] < bl))
        best = jnp.where(better, jnp.int32(c), best)
        bh = jnp.where(better, hi[c], bh)
        bl = jnp.where(better, lo[c], bl)

    header = (cand_shift[best] & 0x0F) | (cand_filter[best] << 4)
    return (header, nibbles[best], np1[best], np2[best])


@partial(jax.jit, static_argnames=("filter_count", "shift_range"))
def encode_units_scan(samples, limits, prev1, prev2, *, filter_count,
                      shift_range):
    """Encode a batch of unit streams, threading state across time.

    Args:
      samples: (B, T, 28) int32 — B independent streams of T units each.
      limits: (B, T) int32 per-unit sample limits.
      prev1, prev2: (B,) int32 initial decoder state per stream.

    Returns:
      headers: (B, T) int32, nibbles: (B, T, 28) int32,
      per-unit (prev1, prev2): (B, T) int32 each — the decoder state AFTER
      unit t, so callers (batch._grouped_unit_encode) can recover exact
      state at any unit when bucket padding appends masked trailing units.
    """
    def step(carry, xs):
        p1, p2 = carry
        s, lim = xs
        h, nib, np1, np2 = jax.vmap(
            lambda a, b, c, d: encode_unit(a, b, c, d, filter_count,
                                           shift_range)
        )(p1, p2, s, lim)
        return (np1, np2), (h, nib, np1, np2)

    xs = (jnp.swapaxes(samples, 0, 1), jnp.swapaxes(limits, 0, 1))
    _, (headers, nibbles, s1, s2) = jax.lax.scan(step, (prev1, prev2), xs)
    # Per-unit states let callers recover exact decoder state at any unit
    # (bucket padding appends masked units whose state must be ignored).
    return (jnp.swapaxes(headers, 0, 1), jnp.swapaxes(nibbles, 0, 1),
            jnp.swapaxes(s1, 0, 1), jnp.swapaxes(s2, 0, 1))
