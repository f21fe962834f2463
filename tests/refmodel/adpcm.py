"""Scalar Python model of the reference ADPCM encoder, used as a test oracle.

This mirrors libpsxav/adpcm.c behavior sample-for-sample using Python ints
(so no overflow concerns). It is intentionally slow and simple — it exists
only to validate the JAX kernels and container layers in tests.
"""

FILTER_K1 = [0, 60, 115, 98, 122]
FILTER_K2 = [0, 0, -52, -55, -60]
SHIFT_RANGE_4BPS = 12
SHIFT_RANGE_8BPS = 8
XA_FILTER_COUNT = 4
SPU_FILTER_COUNT = 5
N = 28


def _asr(x, n):
    """C arithmetic right shift for Python ints."""
    return x >> n


class ChannelState:
    __slots__ = ("prev1", "prev2", "mse")

    def __init__(self, prev1=0, prev2=0):
        self.prev1 = prev1
        self.prev2 = prev2
        self.mse = 0

    def copy(self):
        s = ChannelState(self.prev1, self.prev2)
        s.mse = self.mse
        return s


def find_min_shift(state, samples, sample_limit, pitch, flt, shift_range):
    prev1, prev2 = state.prev1, state.prev2
    k1, k2 = FILTER_K1[flt], FILTER_K2[flt]
    right_shift = 0
    s_min = 0
    s_max = 0
    for i in range(N):
        raw = 0 if i >= sample_limit else samples[i * pitch]
        pred = _asr(k1 * prev1 + k2 * prev2 + (1 << 5), 6)
        resid = raw - pred
        s_min = min(s_min, resid)
        s_max = max(s_max, resid)
        prev2 = prev1
        prev1 = raw
    while right_shift < shift_range and _asr(s_max, right_shift) > (0x7FFF >> shift_range):
        right_shift += 1
    while right_shift < shift_range and _asr(s_min, right_shift) < _asr(-0x8000, shift_range):
        right_shift += 1
    return shift_range - right_shift


def attempt_to_encode(instate, samples, sample_limit, pitch, flt,
                      sample_shift, shift_range):
    """Returns (header, nibbles[28], outstate)."""
    sample_mask = 0xFFFF >> shift_range
    k1, k2 = FILTER_K1[flt], FILTER_K2[flt]
    hdr = (sample_shift & 0x0F) | (flt << 4)
    st = instate.copy()
    st.mse = 0
    nibbles = []
    for i in range(N):
        sample = 0 if i >= sample_limit else samples[i * pitch]
        pred = _asr(k1 * st.prev1 + k2 * st.prev2 + (1 << 5), 6)
        enc = sample - pred
        enc <<= sample_shift
        enc += 1 << (shift_range - 1)
        enc = _asr(enc, shift_range)
        lo = _asr(-0x8000, shift_range)
        hi = 0x7FFF >> shift_range
        enc = max(lo, min(hi, enc)) & sample_mask
        dec = (enc & sample_mask) << shift_range
        if dec & 0x8000:  # int16 reinterpretation
            dec -= 0x10000
        dec = _asr(dec, sample_shift) + pred
        dec = max(-0x8000, min(0x7FFF, dec))
        err = dec - sample
        nibbles.append(enc)
        st.mse += err * err
        st.prev2 = st.prev1
        st.prev1 = dec
    return hdr, nibbles, st


def encode(state, samples, sample_limit, pitch, filter_count, shift_range):
    """Full candidate search; mutates state. Returns (header, nibbles)."""
    best_mse = 1 << 50
    best_filter = 0
    best_shift = 0
    for flt in range(filter_count):
        tms = find_min_shift(state, samples, sample_limit, pitch, flt,
                             shift_range)
        lo = max(0, tms - 1)
        hi = min(shift_range, tms + 1)
        for sample_shift in range(lo, hi + 1):
            _, _, st = attempt_to_encode(state, samples, sample_limit, pitch,
                                         flt, sample_shift, shift_range)
            if best_mse > st.mse:
                best_mse = st.mse
                best_filter = flt
                best_shift = sample_shift
    hdr, nibbles, st = attempt_to_encode(state, samples, sample_limit, pitch,
                                         best_filter, best_shift, shift_range)
    state.prev1, state.prev2, state.mse = st.prev1, st.prev2, st.mse
    return hdr, nibbles


def spu_encode(state, samples, sample_count, pitch=1):
    """SPU-ADPCM: 28 samples -> 16-byte block (adpcm.c:356-376)."""
    out = bytearray()
    i = 0
    while i < sample_count:
        hdr, nibbles, = encode(state, samples[i * pitch:], sample_count - i,
                               pitch, SPU_FILTER_COUNT, SHIFT_RANGE_4BPS)[:2]
        block = bytearray(16)
        block[0] = hdr
        block[1] = 0
        for j in range(0, N, 2):
            block[2 + (j >> 1)] = (nibbles[j] & 0x0F) | (nibbles[j + 1] << 4)
        out += block
        i += N
    return bytes(out)


def encode_block_xa(samples, limit, stereo, bits8, state_l, state_r):
    """One 128-byte XA block body (adpcm.c:193-233).

    `samples` is the interleaved (stereo) or mono sample list starting at the
    block; returns 128 bytes with headers placed and duplicated.
    """
    data = bytearray(128)

    def enc(state, off, lim, pitch, dst_off, dst_shift, shift_range):
        hdr, nibbles, = encode(state, samples[off:], lim, pitch,
                               XA_FILTER_COUNT, shift_range)[:2]
        for i, nib in enumerate(nibbles):
            b = data[dst_off + 4 * i]
            mask = (0xFFFF >> shift_range) << dst_shift
            data[dst_off + 4 * i] = (b & (0xFF & ~mask)) | (nib << dst_shift)
        return hdr

    if not bits8:
        if stereo:
            for u in range(4):
                data[[0, 1, 2, 3, 8, 9, 10, 11][2 * u]] = enc(
                    state_l, 56 * u, limit - 28 * u, 2, 0x10 + u, 0,
                    SHIFT_RANGE_4BPS)
                data[[0, 1, 2, 3, 8, 9, 10, 11][2 * u + 1]] = enc(
                    state_r, 56 * u + 1, limit - 28 * u, 2, 0x10 + u, 4,
                    SHIFT_RANGE_4BPS)
        else:
            for u in range(8):
                data[[0, 1, 2, 3, 8, 9, 10, 11][u]] = enc(
                    state_l, 28 * u, limit - 28 * u, 1, 0x10 + (u >> 1),
                    4 * (u & 1), SHIFT_RANGE_4BPS)
    else:
        if stereo:
            for u in range(2):
                data[2 * u] = enc(state_l, 56 * u, limit - 28 * u, 2,
                                  0x10 + 2 * u, 0, SHIFT_RANGE_8BPS)
                data[2 * u + 1] = enc(state_r, 56 * u + 1, limit - 28 * u, 2,
                                      0x11 + 2 * u, 0, SHIFT_RANGE_8BPS)
        else:
            for u in range(4):
                data[u] = enc(state_l, 28 * u, limit - 28 * u, 1, 0x10 + u, 0,
                              SHIFT_RANGE_8BPS)
    data[4:8] = data[0:4]
    data[12:16] = data[8:12]
    return bytes(data)
