#!/usr/bin/env python
"""Extract libswresample's exact polyphase behavior into a data file.

The fallback ingest tier (no FFmpeg libraries) needs bit-exact rate
conversion for common PSX ratios. swresample's s16 path is an integer
polyphase FIR: y[n] = clip((sum_k T[n][k] * x[s_n + k] + 16384) >> 15),
periodic in n with period L (dst/gcd) shifting by M (src/gcd) — verified
by probing. This tool recovers the taps EXACTLY by feeding impulses of
-32768 through the native ingest extension (an impulse of -2^15 makes the
post-round output equal the negated tap), detects the transient width and
the output-length rule, and writes everything to
psxavenc_tpu/data/swr_banks.npz for io/swr_exact.py.

Run on any host with the FFmpeg dev libraries:
    python tools/extract_swr_banks.py
"""

import math
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from psxavenc_tpu.native import ingest_ext  # noqa: E402
from psxavenc_tpu.utils.synth import write_wav  # noqa: E402

# Every common source rate to every PSX-relevant target: the XA rates
# (37800/18900) and the usual SPU/VAG rates (44100/22050/11025).
_SOURCES = [8000, 11025, 16000, 22050, 24000, 32000, 37800, 44100, 48000]
_TARGETS = [11025, 18900, 22050, 37800, 44100]
RATIOS = [(s, d) for s in _SOURCES for d in _TARGETS if s != d]

OUT = (pathlib.Path(__file__).resolve().parents[1] / "psxavenc_tpu"
       / "data" / "swr_banks.npz")

_td = pathlib.Path(tempfile.mkdtemp())


def swr(pcm, src, dst):
    p = _td / "p.wav"
    write_wav(p, pcm, src)
    r = ingest_ext.ingest(
        str(p), flags=1, audio_frequency=dst, audio_channels=1,
        video_width=320, video_height=240, ignore_aspect=1, fps_num=15,
        fps_den=1, quiet=1)
    return r["audio"].astype(np.int64)


def extract_rows(src, dst, probe_span):
    """Exact tap rows: {output n: {src p: tap}} for all outputs fully
    covered by impulses at src positions [0, probe_span). Window and
    impulse spacing scale with the ratio: downsampling uses a filter
    ~32*src/dst src-samples long (anti-alias), so one impulse's output
    response spans ~filter_len*L/M outputs."""
    L = dst // math.gcd(src, dst)
    M = src // math.gcd(src, dst)
    # Generous estimates; verified post-hoc (a truncated response leaves
    # nonzero samples at the window edge and fails the random check).
    filt_src = int(40 * max(1.0, M / L)) + 40
    span_out = filt_src * L // M + 40
    spacing = 2 * filt_src + 64
    n_in = probe_span + 4 * filt_src + 4000
    cols = {}
    for ph in range(0, spacing, 1):
        pos = list(range(ph, probe_span, spacing))
        if not pos:
            continue
        xs = np.zeros(n_in, np.int16)
        for p in pos:
            xs[p] = -32768
        y = swr(xs, src, dst)
        # Transient rows can have gain > 1.0 (edge overshoot): a full-scale
        # impulse then SATURATES the int16 output and the read-back "tap"
        # is the clip rail, not the tap (this is what made 4 upsample
        # ratios look non-linear in round 3). Re-probe the same impulse
        # pattern at sub-scale amplitudes and solve those taps exactly:
        # y(A) = floor((A*t + 16384) / 32768), so y(-16384) gives t up to
        # parity and further amplitudes disambiguate (adjacent candidates
        # can collide in one probe's floor bin; walk a ladder until the
        # candidate is unique).
        amp_probes = {}

        def probe(a):
            if a not in amp_probes:
                xs2 = np.zeros(n_in, np.int16)
                for p in pos:
                    xs2[p] = a
                amp_probes[a] = swr(xs2, src, dst)
            return amp_probes[a]

        def solve_tap(oi):
            v = int(probe(-16384)[oi])
            cand = [-2 * v, 1 - 2 * v]
            for a in (-16383, -16382, -16381, -16379, -16369, -16349,
                      -16253, -15973, -15361, -13121, -10923):
                if len(cand) == 1:
                    break
                ya = int(probe(a)[oi])
                cand = [t for t in cand if (a * t + 16384) // 32768 == ya]
            assert len(cand) == 1, \
                f"ambiguous large tap at {src}->{dst} out {oi}: {cand}"
            return cand[0]

        for p in pos:
            c = p * L // M
            lo = max(0, c - span_out)
            hi = min(len(y), c + span_out)
            seg = -y[lo:hi].copy()
            sus = np.nonzero((seg >= 32767) | (seg <= -32767))[0]
            for i in sus:
                seg[i] = solve_tap(lo + i)
            nz = np.nonzero(seg)[0]
            if len(nz):
                assert nz.min() > 0 or lo == 0, "window clipped (left)"
                assert nz.max() < len(seg) - 1, "window clipped (right)"
                cols[p] = (lo + int(nz.min()),
                           seg[nz.min():nz.max() + 1].copy())
    rows = {}
    for p, (o0, taps) in cols.items():
        for i, t in enumerate(taps):
            if t:
                rows.setdefault(o0 + i, {})[p] = int(t)
    return rows, L, M, filt_src


def build_bank(src, dst):
    L = dst // math.gcd(src, dst)
    M = src // math.gcd(src, dst)
    span = max(600, 4 * M + 200, 3 * L * M // L + 600)
    rows, L, M, filt_src = extract_rows(src, dst, span)
    # Outputs whose full src support was probed.
    max_full = max(n for n in rows if max(rows[n]) + filt_src < span)

    # Transient width: first n from which row(n+L) is row(n) shifted by M.
    def shifted_eq(a, b):
        return a == {p - M: t for p, t in b.items()}

    W = None
    for n0 in range(0, max_full - 3 * L):
        if all(shifted_eq(rows[n], rows[n + L])
               for n in range(n0, min(n0 + 2 * L, max_full - L))):
            W = n0
            break
    assert W is not None, f"no periodicity found for {src}->{dst}"

    nrows = W + L
    K = max(max(rows[n]) - min(rows[n]) + 1 for n in range(nrows))
    starts = np.zeros(nrows, np.int64)
    taps = np.zeros((nrows, K), np.int64)
    for n in range(nrows):
        r = rows[n]
        s = min(r)
        starts[n] = s
        for p, t in r.items():
            taps[n, p - s] = t

    # Output length rule: len = floor((n_in * L - D) / M). A probe at
    # n_in observes d(n) = n*L - M*len = ((n*L - D) mod M) + D, so a
    # handful of arbitrary probes only bound D from above (their minimum
    # can sit anywhere in D's M-wide window — round 3 shipped a wrong D
    # for residues it never sampled, observable as an off-by-one output
    # length). Recover D EXACTLY: probing an n with n*L ≡ c (mod M)
    # yields d == c iff D <= c (else c + M), i.e. each probe answers
    # "is D <= c" — binary-search c. gcd(L, M) == 1 after reduction, so
    # every residue is reachable via n ≡ c * L^-1 (mod M).
    def probe_d(n_in):
        return n_in * L - M * len(swr(np.zeros(n_in, np.int16), src, dst))

    d0 = min(probe_d(n) for n in (3000, 3777, 2 * src))
    linv = pow(L, -1, M)
    lo, hi = d0 - M + 1, d0            # D in [lo, hi]
    base = 4000
    while lo < hi:
        mid = (lo + hi) // 2
        n_test = base + ((mid * linv - base) % M)
        dm = probe_d(n_test)
        assert dm in (mid, mid + M), \
            f"length rule not floor-form for {src}->{dst}: {dm} vs {mid}"
        if dm == mid:
            hi = mid
        else:
            lo = mid + 1
    D = lo
    # Confirm on scattered residues incl. the exact-divisible boundary.
    for n_in in (2000, 2611, 8191, -(-6000 // M) * M,
                 base + ((D * linv - base) % M)):
        ln = len(swr(np.zeros(n_in, np.int16), src, dst))
        assert ln == (n_in * L - D) // M, (n_in, ln, D)

    # Verify exactly on random data (twice, incl. the clip path).
    rng = np.random.default_rng(0)
    for amp, n_in in ((30000, 3777), (32767, 5000)):
        x = rng.integers(-amp, amp, n_in).astype(np.int16)
        y = swr(x, src, dst)
        assert len(y) == (n_in * L - D) // M, (len(y), n_in)
        from psxavenc_tpu.io import swr_exact

        pred = swr_exact.apply_bank(x[:, None], starts, taps, W, L, M,
                                    D)[:, 0]
        assert np.array_equal(pred, y), f"verify failed {src}->{dst}"
    print(f"{src}->{dst}: W={W} L={L} M={M} K={K} D={D} verified")
    return starts, taps, W, L, M, D


def extract_mix_matrices():
    """Recover libswresample's exact Q15 rematrix coefficients by
    impulse probing at matched rate (one full-scale impulse per input
    channel; the output sample is the negated coefficient). The computed
    default-matrix formulas land within +-1 Q15 step of swr's own
    float pipeline on several layouts (FC of 5.1->stereo is 9597 in swr,
    9598 by double-precision math), so bit-exactness requires reading
    the real library's values, exactly like the filter taps."""
    mats = {}
    for nch in range(1, 9):
        for tgt in (1, 2):
            if nch == tgt:
                continue
            x = np.zeros((64, nch), np.int16)
            for c in range(nch):
                x[c, c] = -32768
            p = _td / f"mix{nch}_{tgt}.wav"
            write_wav(p, x, 44100, channels=nch)
            r = ingest_ext.ingest(
                str(p), flags=1, audio_frequency=44100, audio_channels=tgt,
                video_width=320, video_height=240, ignore_aspect=1,
                fps_num=15, fps_den=1, quiet=1)
            y = r["audio"].reshape(-1, tgt)
            m = np.array([[-int(y[c, o]) for c in range(nch)]
                          for o in range(tgt)], np.int64)
            # A coefficient of exactly 32768 reads back clipped through
            # the int16 output but is exact ((x*32768 + 16384) >> 15 is
            # the identity); nothing exceeds 32768 in a default matrix.
            mats[f"mix_{nch}_{tgt}"] = m
            print(f"mix {nch}->{tgt}: {m.tolist()}")
    return mats


def main():
    assert ingest_ext.load() is not None, "needs the native extension"
    out = extract_mix_matrices()
    shipped = skipped = 0
    for src, dst in RATIOS:
        try:
            starts, taps, W, L, M, D = build_bank(src, dst)
        except AssertionError as e:
            # Verification is the shipping gate: a ratio whose replay is
            # not EXACTLY libswresample is not shipped (it would fall
            # back to the documented scipy approximation instead).
            print(f"SKIP {src}->{dst}: {e}")
            skipped += 1
            continue
        key = f"{src}_{dst}"
        out[f"{key}_starts"] = starts
        out[f"{key}_taps"] = taps
        out[f"{key}_meta"] = np.array([W, L, M, D], np.int64)
        shipped += 1
    OUT.parent.mkdir(exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes): "
          f"{shipped} banks, {skipped} skipped")


if __name__ == "__main__":
    main()
