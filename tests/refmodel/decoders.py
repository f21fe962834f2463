"""Independent decoders used for round-trip property tests.

These implement the PSX hardware decode side (SPU-ADPCM playback, MDEC BS
bitstream decoding) so tests can assert that encoder output actually
reconstructs the input signal — the reference repo has no tests at all, so
this is our substitute for its out-of-band validation against jPSXdec and
console hardware.
"""

import numpy as np

FILTER_K1 = [0, 60, 115, 98, 122]
FILTER_K2 = [0, 0, -52, -55, -60]


def spu_decode(data, initial=(0, 0)):
    """Decode SPU-ADPCM blocks (16 bytes each) to int16 samples."""
    p1, p2 = initial
    out = []
    for off in range(0, len(data) - 15, 16):
        hdr = data[off]
        shift = hdr & 0x0F
        flt = min(hdr >> 4, 4)
        for j in range(14):
            byte = data[off + 2 + j]
            for nib in (byte & 0x0F, byte >> 4):
                pred = (FILTER_K1[flt] * p1 + FILTER_K2[flt] * p2 + 32) >> 6
                s = (nib << 12) & 0xFFFF
                if s & 0x8000:
                    s -= 0x10000
                s = (s >> shift) + pred
                s = max(-0x8000, min(0x7FFF, s))
                out.append(s)
                p2, p1 = p1, s
    return np.array(out, dtype=np.int16)


def xa_block_decode(block, stereo, bits8, state):
    """Decode one 128-byte XA block body. ``state`` maps channel -> [p1,p2].
    Returns per-channel sample lists."""
    headers = [block[i] for i in (0, 1, 2, 3, 8, 9, 10, 11)]
    chans = {0: [], 1: []} if stereo else {0: []}

    def dec_unit(hdr, nibbles, ch):
        shift = hdr & 0x0F
        flt = min(hdr >> 4, 4)
        p1, p2 = state[ch]
        rng = 12 if not bits8 else 8
        for nib in nibbles:
            pred = (FILTER_K1[flt] * p1 + FILTER_K2[flt] * p2 + 32) >> 6
            s = (nib << rng) & 0xFFFF
            if s & 0x8000:
                s -= 0x10000
            s = (s >> shift) + pred
            s = max(-0x8000, min(0x7FFF, s))
            chans[ch].append(s)
            p2, p1 = p1, s
        state[ch] = [p1, p2]

    if not bits8:
        for u in range(8):
            nibs = [(block[0x10 + (u >> 1) + 4 * i] >> (4 * (u & 1))) & 0xF
                    for i in range(28)]
            dec_unit(headers[u], nibs, (u & 1) if stereo else 0)
    else:
        for u in range(4):
            nibs = [block[0x10 + u + 4 * i] for i in range(28)]
            dec_unit(headers[u], nibs, (u & 1) if stereo else 0)
    return chans


class BitReader:
    """BS bitstream reader: 16-bit LE words, MSB-first bits."""

    def __init__(self, data):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n):
        v = 0
        for _ in range(n):
            word = self.pos >> 4
            bit = 15 - (self.pos & 15)
            w = self.data[8 + 2 * word] | (self.data[9 + 2 * word] << 8)
            v = (v << 1) | ((w >> bit) & 1)
            self.pos += 1
        return v


def _build_ac_decode_table():
    from psxavenc_tpu.ops.bs import AC_TABLE

    table = {}
    for (run, level), (c_bits, c_value) in AC_TABLE.items():
        for sign, val in ((0, level), (1, -level)):
            table[(c_bits + 1, (c_value << 1) | sign)] = (run, val)
    return table


def _build_dc_decode_tables():
    from psxavenc_tpu.ops.bs import DC_C_TABLE, DC_Y_TABLE

    out = []
    for tbl, zero in ((DC_C_TABLE, (2, 0x0)), (DC_Y_TABLE, (3, 0x4))):
        m = {zero: 0}
        for c_bits, c_value, dc_bits in tbl:
            for j in range(1 << dc_bits):
                pos_code = (c_value << (dc_bits + 1)) | (1 << dc_bits) | j
                neg_code = (c_value << (dc_bits + 1)) | j
                m[(c_bits + 1 + dc_bits, pos_code)] = j + (1 << dc_bits)
                m[(c_bits + 1 + dc_bits, neg_code)] = j - ((1 << dc_bits)
                                                           * 2 - 1)
        out.append(m)
    return out[0], out[1]


_AC_DEC = None
_DC_DEC = None


def bs_decode_frame(data, width, height):
    """Decode a BS v2/v3 frame to YCbCr planes (float IDCT — for SNR
    checks, not bit-exact MDEC output)."""
    global _AC_DEC, _DC_DEC
    if _AC_DEC is None:
        _AC_DEC = _build_ac_decode_table()
        _DC_DEC = _build_dc_decode_tables()
    from psxavenc_tpu.ops.bs import QUANT_PSX, ZAGZIG

    version = data[6]
    scale = data[4] | (data[5] << 8)
    r = BitReader(data)
    mbx, mby = width // 16, height // 16
    nblocks = mbx * mby * 6
    blocks = np.zeros((nblocks, 64), np.float64)
    last_dc = [0, 0, 0]

    def read_ac():
        bits = 0
        code = 0
        while bits < 24:
            code = (code << 1) | r.read(1)
            bits += 1
            if bits == 2 and code == 0b10:
                return "eob"
            if (bits, code) in _AC_DEC:
                return _AC_DEC[(bits, code)]
            if bits == 6 and code == 1:  # escape
                raw = r.read(16)
                run = raw >> 10
                lvl = raw & 0x3FF
                if lvl >= 512:
                    lvl -= 1024
                return (run, lvl)
        raise ValueError("bad AC code")

    def read_dc(t):
        tbl = _DC_DEC[1] if t == 2 else _DC_DEC[0]
        bits = 0
        code = 0
        while bits < 16:
            code = (code << 1) | r.read(1)
            bits += 1
            if (bits, code) in tbl:
                return tbl[(bits, code)]
        raise ValueError("bad DC code")

    for b in range(nblocks):
        t = min(b % 6, 2)
        if version == 2:
            dc = r.read(10)
            if dc >= 512:
                dc -= 1024
        else:
            delta = read_dc(t)
            last_dc[t] = (last_dc[t] + delta * 4) & 0x3FF
            dc = last_dc[t] if last_dc[t] < 512 else last_dc[t] - 1024
        blocks[b][0] = dc * QUANT_PSX[0] * 8 / 8.0
        i = 1
        # Read until EOB — every block is EOB-terminated, including ones
        # whose last coefficient sits at scan position 63.
        while True:
            sym = read_ac()
            if sym == "eob":
                break
            run, lvl = sym
            i += run
            blocks[b][ZAGZIG[i]] = lvl * QUANT_PSX[ZAGZIG[i]] * scale / 8.0
            i += 1

    # Float inverse DCT (JPEG convention matching the fdct x8 scaling).
    k = np.arange(8)
    cos = np.cos((2 * k[:, None] + 1) * k[None, :] * np.pi / 16)
    cu = np.where(k == 0, 1 / np.sqrt(2), 1.0)
    basis = cos * cu[None, :]
    blk = blocks.reshape(nblocks, 8, 8)
    # Separable IDCT: f(y,x) = 1/4 sum_u sum_v cu cv F(v,u) cos terms.
    spatial = np.einsum("yv,xu,bvu->byx", basis, basis, blk) / 4.0

    y = np.zeros((height, width))
    cr = np.zeros((height // 2, width // 2))
    cb = np.zeros((height // 2, width // 2))
    for fx in range(mbx):
        for fy in range(mby):
            base = 6 * (fx * mby + fy)
            cr[fy * 8:fy * 8 + 8, fx * 8:fx * 8 + 8] = spatial[base + 0]
            cb[fy * 8:fy * 8 + 8, fx * 8:fx * 8 + 8] = spatial[base + 1]
            for k2, (dy, dx) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
                y[fy * 16 + dy:fy * 16 + dy + 8,
                  fx * 16 + dx:fx * 16 + dx + 8] = spatial[base + 2 + k2]
    return y + 128, cb + 128, cr + 128
