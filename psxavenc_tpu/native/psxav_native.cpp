// Native host runtime for psxavenc_tpu: the byte-level, bit-exact parts
// that stay off the TPU — CD-ROM EDC checksums and sector framing
// (behavior of libpsxav/cdrom.c), XA sector assembly from device-computed
// ADPCM headers/nibbles (layout of libpsxav/adpcm.c:193-332), and the BS
// 16-bit little-endian bit packer (behavior of psxavenc/mdec.c:321-385).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- EDC CRC32

// Reflected CRC-32 with polynomial 0xD8018001, LSB-first, zero init and no
// final xor (cdrom.c:30-41), table-driven per byte.
static uint32_t edc_table[256];
static bool edc_ready = false;

static void edc_init() {
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t v = i;
        for (int j = 0; j < 8; j++)
            v = (v >> 1) ^ (0xD8018001u * (v & 1));
        edc_table[i] = v;
    }
    edc_ready = true;
}

uint32_t psxn_edc(const uint8_t *data, long length) {
    if (!edc_ready) edc_init();
    uint32_t edc = 0;
    for (long i = 0; i < length; i++)
        edc = (edc >> 8) ^ edc_table[(edc ^ data[i]) & 0xFF];
    return edc;
}

// Compute and store EDC for a batch of equally-framed sectors laid out
// contiguously: for each sector, CRC bytes [crc_off, crc_off+crc_len) and
// store LE32 at edc_off.
void psxn_edc_batch(uint8_t *base, long nsectors, long stride,
                    long crc_off, long crc_len, long edc_off) {
    if (!edc_ready) edc_init();
    for (long s = 0; s < nsectors; s++) {
        uint8_t *sec = base + s * stride;
        uint32_t edc = psxn_edc(sec + crc_off, crc_len);
        sec[edc_off + 0] = (uint8_t)edc;
        sec[edc_off + 1] = (uint8_t)(edc >> 8);
        sec[edc_off + 2] = (uint8_t)(edc >> 16);
        sec[edc_off + 3] = (uint8_t)(edc >> 24);
    }
}

// ------------------------------------------------------------ sector framing

// type: 0 = Mode1, 1 = Mode2 Form1, 2 = Mode2 Form2 (cdrom.c:45-74).
void psxn_sector_init(uint8_t *sector, int lba, int type) {
    memset(sector, 0xFF, 12);
    sector[0x0] = 0x00;
    sector[0xB] = 0x00;
    lba += 150;
    int m = lba / 4500, s = (lba / 75) % 60, f = lba % 75;
    sector[12] = (uint8_t)(m + (m / 10) * 6);
    sector[13] = (uint8_t)(s + (s / 10) * 6);
    sector[14] = (uint8_t)(f + (f / 10) * 6);
    if (type == 0) {
        sector[15] = 0x01;
    } else {
        sector[15] = 0x02;
        memset(sector + 16, 0, 8);
        uint8_t submode = 0x08;            // DATA
        if (type == 2) submode |= 0x20;    // FORM2
        sector[16 + 2] = submode;
        sector[16 + 4 + 2] = submode;
    }
}

// Checksums exactly as cdrom.c:76-110 (ECC intentionally left zeroed, as in
// the reference; authoring tools regenerate it).
void psxn_calc_checksums(uint8_t *sector, int type) {
    uint32_t edc;
    switch (type) {
    case 0:
        edc = psxn_edc(sector, 0x810);
        sector[0x810] = (uint8_t)edc;
        sector[0x811] = (uint8_t)(edc >> 8);
        sector[0x812] = (uint8_t)(edc >> 16);
        sector[0x813] = (uint8_t)(edc >> 24);
        memset(sector + 0x814, 0, 8);
        break;
    case 1:
        edc = psxn_edc(sector + 0x10, 0x808);
        sector[0x818] = (uint8_t)edc;
        sector[0x819] = (uint8_t)(edc >> 8);
        sector[0x81A] = (uint8_t)(edc >> 16);
        sector[0x81B] = (uint8_t)(edc >> 24);
        break;
    case 2:
        edc = psxn_edc(sector + 0x10, 0x91C);
        sector[0x92C] = (uint8_t)edc;
        sector[0x92D] = (uint8_t)(edc >> 8);
        sector[0x92E] = (uint8_t)(edc >> 16);
        sector[0x92F] = (uint8_t)(edc >> 24);
        break;
    }
}

// --------------------------------------------------------- XA block assembly

// Assemble the 2304-byte ADPCM payload of one XA sector from 18 blocks of
// device-computed unit headers and nibble values.
//
// headers:  (18, units_per_block) bytes, in encode order.
// nibbles:  (18, units_per_block, 28) bytes.
// Layouts per adpcm.c:193-233; header bytes at data offsets
// {0,1,2,3,8,9,10,11} then duplicated to {4..7, 12..15} (adpcm.c:321-322).
void psxn_xa_assemble(uint8_t *payload2304, const uint8_t *headers,
                      const uint8_t *nibbles, int units_per_block,
                      int bits8) {
    static const int hdr_pos[8] = {0, 1, 2, 3, 8, 9, 10, 11};
    for (int b = 0; b < 18; b++) {
        uint8_t *blk = payload2304 + b * 128;
        const uint8_t *h = headers + b * units_per_block;
        const uint8_t *nb = nibbles + b * units_per_block * 28;
        memset(blk, 0, 128);
        for (int u = 0; u < units_per_block; u++)
            blk[hdr_pos[u]] = h[u];
        if (!bits8) {
            for (int u = 0; u < units_per_block; u++) {
                int off = 0x10 + (u >> 1);
                int shift = (u & 1) ? 4 : 0;
                for (int i = 0; i < 28; i++)
                    blk[off + 4 * i] |= (uint8_t)(nb[u * 28 + i] << shift);
            }
        } else {
            for (int u = 0; u < units_per_block; u++) {
                int off = 0x10 + u;
                for (int i = 0; i < 28; i++)
                    blk[off + 4 * i] = nb[u * 28 + i];
            }
        }
        memcpy(blk + 4, blk, 4);
        memcpy(blk + 12, blk + 8, 4);
    }
}

// ------------------------------------------------------ ADPCM unit encoder

// Host fallback for the ADPCM candidate search when no TPU (Mosaic
// kernel) is available: same semantics as ops/adpcm.py::encode_unit —
// the reference's candidate order (filter-major, shift ascending,
// adpcm.c:142-191), strict `>` first-best ties, exact uint64 MSE, and
// decoded-sample state threading across units. The XLA formulation of
// the 28-step recurrence is dispatch-bound off-TPU (~0.5 Msamples/s on
// CPU); this plain loop exceeds the reference C encoder's throughput.

static const int32_t adpcm_k1[5] = {0, 60, 115, 98, 122};
static const int32_t adpcm_k2[5] = {0, 0, -52, -55, -60};

static inline int32_t adpcm_predict(int32_t k1, int32_t k2, int32_t p1,
                                    int32_t p2) {
    return (k1 * p1 + k2 * p2 + 32) >> 6;
}

// Encode B independent unit streams: per row, T units of 28 samples
// with per-unit limits (limit <= 0 zeroes the whole unit, >= 28 keeps
// all), threading (prev1, prev2) decoder state across units. Outputs
// headers (B,T), nibble values (B,T,28) and the post-unit decoder
// states s1/s2 (B,T) (callers slice the state at any unit, matching
// encode_units_scan's per-unit state returns).
void psxn_adpcm_encode_units(const int16_t *units, const int32_t *limits,
                             const int32_t *state12, uint8_t *headers,
                             uint8_t *nibbles, int32_t *s1_out,
                             int32_t *s2_out, long B, long T,
                             int filter_count, int shift_range) {
    const int32_t sample_mask = 0xFFFF >> shift_range;
    const int32_t min_e = -0x8000 >> shift_range;
    const int32_t max_e = 0x7FFF >> shift_range;
    const int32_t half = 1 << (shift_range - 1);

    for (long b = 0; b < B; b++) {
        int32_t prev1 = state12[b * 2], prev2 = state12[b * 2 + 1];
        for (long t = 0; t < T; t++) {
            const int16_t *su = units + (b * T + t) * 28;
            int32_t lim = limits[b * T + t];
            int32_t raw[28];
            for (int i = 0; i < 28; i++)
                raw[i] = (i < lim) ? (int32_t)su[i] : 0;

            uint64_t best_mse = ~0ull;
            int best_filter = 0, best_shift = 0;
            int32_t best_nib[28], best_p1 = prev1, best_p2 = prev2;

            for (int f = 0; f < filter_count; f++) {
                const int32_t k1 = adpcm_k1[f], k2 = adpcm_k2[f];
                // find_min_shift: residuals with RAW history (no
                // quantization feedback), then the smallest right-shift
                // keeping residuals in range (one-step clip allowed).
                int32_t p1 = prev1, p2 = prev2;
                int32_t s_min = 0, s_max = 0;
                for (int i = 0; i < 28; i++) {
                    int32_t r = raw[i] - adpcm_predict(k1, k2, p1, p2);
                    if (r < s_min) s_min = r;
                    if (r > s_max) s_max = r;
                    p2 = p1;
                    p1 = raw[i];
                }
                int right_shift = 0;
                while (right_shift < shift_range &&
                       ((s_max >> right_shift) > (0x7FFF >> shift_range) ||
                        (s_min >> right_shift) < (-0x8000 >> shift_range)))
                    right_shift++;
                int min_shift = shift_range - right_shift;

                for (int d = -1; d <= 1; d++) {
                    int sh = min_shift + d;
                    if (sh < 0) sh = 0;
                    if (sh > shift_range) sh = shift_range;
                    int32_t nib[28];
                    int32_t a1 = prev1, a2 = prev2;
                    uint64_t mse = 0;
                    for (int i = 0; i < 28; i++) {
                        int32_t s = raw[i];
                        int32_t pred = adpcm_predict(k1, k2, a1, a2);
                        /* Shift through unsigned: left-shifting a
                         * negative int32 is UB before C++20 (bit-
                         * identical on two's-complement targets). */
                        int32_t enc =
                            ((int32_t)((uint32_t)(s - pred) << sh)
                             + half) >> shift_range;
                        if (enc < min_e) enc = min_e;
                        if (enc > max_e) enc = max_e;
                        enc &= sample_mask;
                        int32_t dec = (int16_t)(enc << shift_range);
                        dec = (dec >> sh) + pred;
                        if (dec < -0x8000) dec = -0x8000;
                        if (dec > 0x7FFF) dec = 0x7FFF;
                        int64_t err = dec - s;
                        mse += (uint64_t)(err * err);
                        nib[i] = enc;
                        a2 = a1;
                        a1 = dec;
                    }
                    if (mse < best_mse) {     // strict: first-best wins
                        best_mse = mse;
                        best_filter = f;
                        best_shift = sh;
                        for (int i = 0; i < 28; i++) best_nib[i] = nib[i];
                        best_p1 = a1;
                        best_p2 = a2;
                    }
                }
            }
            headers[b * T + t] =
                (uint8_t)((best_shift & 0x0F) | (best_filter << 4));
            uint8_t *nb = nibbles + (b * T + t) * 28;
            for (int i = 0; i < 28; i++) nb[i] = (uint8_t)best_nib[i];
            prev1 = best_p1;
            prev2 = best_p2;
            s1_out[b * T + t] = prev1;
            s2_out[b * T + t] = prev2;
        }
    }
}

// ------------------------------------------------------------- BS bit packer

// Pack a symbol stream into the BS frame bitstream: 16-bit groups filled
// MSB-first, flushed as little-endian byte pairs starting at output offset 8
// (mdec.c:321-385). Symbols longer than 16 bits emit their high bits first.
//
// codes[i] carries the code value, lens[i] its bit length (0 = skip).
// Returns bytes_used (still to be rounded up to a multiple of 4 by the
// caller) or -1 if max_size would be exceeded (mdec.c:324-325 bail-out).
long psxn_bs_pack(const uint32_t *codes, const uint8_t *lens, long n,
                  uint8_t *out, long max_size) {
    long bytes_used = 8;
    uint16_t value = 0;
    int bits_left = 16;

    for (long i = 0; i < n; i++) {
        int bits = lens[i];
        if (bits == 0) continue;
        uint32_t val = codes[i];
        // Split >16-bit codes exactly like the recursive path in
        // encode_bits (mdec.c:340-346).
        for (int part = 0; part < 2; part++) {
            int pbits;
            uint32_t pval;
            if (bits > 16) {
                if (part == 0) { pbits = bits - 16; pval = val >> 16; }
                else { pbits = 16; pval = val & 0xFFFF; }
            } else {
                if (part == 0) { pbits = bits; pval = val; }
                else break;
            }
            if (bits_left == 0) {
                out[bytes_used++] = (uint8_t)value;
                if (bytes_used >= max_size) return -1;
                out[bytes_used++] = (uint8_t)(value >> 8);
                value = 0;
                bits_left = 16;
            }
            while (pbits > bits_left) {
                value |= (uint16_t)(pval >> (pbits - bits_left));
                pbits -= bits_left;
                pval &= (1u << pbits) - 1;
                out[bytes_used++] = (uint8_t)value;
                if (bytes_used >= max_size) return -1;
                out[bytes_used++] = (uint8_t)(value >> 8);
                value = 0;
                bits_left = 16;
            }
            if (pbits >= 1) {
                value |= (uint16_t)(pval << (bits_left - pbits));
                bits_left -= pbits;
            }
        }
    }
    // Final flush (mdec.c:716): write the partial word if any bits were
    // placed since the last flush.
    if (bits_left < 16) {
        out[bytes_used++] = (uint8_t)value;
        if (bytes_used >= max_size) return -1;
        out[bytes_used++] = (uint8_t)(value >> 8);
    }
    return bytes_used;
}

}  // extern "C"
