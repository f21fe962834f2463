"""Golden byte-diffs through the NON-native ingest tiers.

Every other golden test routes through the native FFmpeg extension when it
is available (it always is in CI), so a regression in the pure-Python
WAV/AVI readers would pass the suite. These force
PSXAVENC_NO_NATIVE_INGEST=1 with inputs chosen so the fallback tiers are
exact (same-rate WAV, same-size raw-I420 AVI — the documented
resample/rescale approximations never trigger, PARITY.md)."""

import pytest

from psxavenc_tpu import cli
from tests.conftest import (rand_frames, rand_pcm, run_oracle,
                            write_avi_sized, write_wav)
from tests.test_golden_xa import _mask_for, _normalize


@pytest.fixture(autouse=True)
def _no_native(monkeypatch):
    monkeypatch.setenv("PSXAVENC_NO_NATIVE_INGEST", "1")
    monkeypatch.setenv("PSXAVENC_STREAMING", "0")


def test_fallback_wav_xa_golden(tmp_path, oracle):
    """Same-rate stereo WAV through the pure-Python reader: xa bytes
    match the oracle (masking the documented uninitialized bytes)."""
    wav = write_wav(tmp_path / "in.wav",
                    rand_pcm(37800 * 2, channels=2, seed=21), 37800)
    ref = tmp_path / "ref.xa"
    our = tmp_path / "our.xa"
    args = ["-t", "xa", "-f", "37800", "-c", "2", "-b", "4"]
    r = run_oracle(["-q"] + args + [wav, ref])
    assert r.returncode == 0, r.stderr
    assert cli.main(["-q"] + args + [str(wav), str(our)]) == 0
    ssize, mask = _mask_for("xa", 4)
    assert _normalize(ref.read_bytes(), ssize, mask) == \
        _normalize(our.read_bytes(), ssize, mask)


@pytest.mark.parametrize("src_rate,dst_rate", [
    (44100, 37800), (44100, 18900), (8000, 37800), (11025, 18900),
])
def test_fallback_resample_golden(tmp_path, oracle, src_rate, dst_rate):
    """Resampled input through the fallback tier is bit-exact: the
    shipped swresample tap banks (io/swr_exact.py) replay swr_convert —
    formerly a documented approximation. Covers two ordinary ratios and
    two of the extreme-upsample ratios round 3 shipped nothing for."""
    wav = write_wav(tmp_path / "in.wav",
                    rand_pcm(src_rate * 2, channels=2, seed=31), src_rate)
    ref = tmp_path / "ref.xa"
    our = tmp_path / "our.xa"
    args = ["-t", "xa", "-f", str(dst_rate), "-c", "2"]
    r = run_oracle(["-q"] + args + [wav, ref])
    assert r.returncode == 0, r.stderr
    assert cli.main(["-q"] + args + [str(wav), str(our)]) == 0
    ssize, mask = _mask_for("xa", 4)
    assert _normalize(ref.read_bytes(), ssize, mask) == \
        _normalize(our.read_bytes(), ssize, mask)


def _shipped_ratios():
    from psxavenc_tpu.io import swr_exact
    swr_exact._load()
    return sorted(swr_exact._banks.keys())


@pytest.mark.parametrize("src_rate,dst_rate", _shipped_ratios())
def test_swr_exact_matches_native(tmp_path, monkeypatch, src_rate,
                                  dst_rate):
    """EVERY shipped tap bank replays the real libswresample exactly
    (PCM-level comparison against the native extension). This includes
    the 4 extreme-upsample ratios round 3 judged non-FIR: those were an
    extraction artifact (full-scale impulse probes saturating int16
    output on transient rows with gain > 1.0), not a nonlinearity —
    tools/extract_swr_banks.py now solves such taps at sub-scale
    amplitudes."""
    import numpy as np

    from psxavenc_tpu.io import swr_exact
    from psxavenc_tpu.native import ingest_ext

    monkeypatch.delenv("PSXAVENC_NO_NATIVE_INGEST")
    # The output-length rule len = (n*L - D) // M is only observable at
    # the window boundary (n*L ≡ D mod M) — exactly where round 3's
    # calibration was off by one; include that n alongside a generic one.
    _, _, _, L, M, D = swr_exact._load()[(src_rate, dst_rate)]
    n_edge = 2 * src_rate + ((D * pow(L, -1, M) - 2 * src_rate) % M)
    for n in (2 * src_rate, n_edge):
        pcm = rand_pcm(n, channels=2, seed=31)
        wav = write_wav(tmp_path / "in.wav", pcm, src_rate, channels=2)
        exact = swr_exact.resample(pcm, src_rate, dst_rate)
        assert exact is not None
        r = ingest_ext.ingest(
            str(wav), flags=1, audio_frequency=dst_rate,
            audio_channels=2, video_width=320, video_height=240,
            ignore_aspect=1, fps_num=15, fps_den=1, quiet=1)
        native = r["audio"].reshape(-1, 2)
        assert exact.shape == native.shape, (n, exact.shape, native.shape)
        assert np.array_equal(exact, native), n


@pytest.mark.parametrize("src_ch,dst_ch,src_rate,dst_rate", [
    (1, 2, 8000, 37800),    # upmix, resample-first branch
    (1, 2, 44100, 37800),   # upmix, rematrix-first branch
    (6, 2, 44100, 37800),   # 5.1 downmix (resample-first, probed matrix)
    (2, 1, 44100, 22050),   # downmix at the cost-rule equality point
])
def test_fallback_remix_resample_golden(tmp_path, oracle, src_ch, dst_ch,
                                        src_rate, dst_rate):
    """Channel remix combined with resampling through the fallback tier
    is bit-exact: exact probed Q15 matrices (swr_exact.mix_matrix) and
    libswresample's data-dependent rematrix/resample ORDER
    (ingest._remix_resample) — both observable in output bytes."""
    pcm = rand_pcm(src_rate * src_ch, channels=src_ch, seed=41)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    wav = write_wav(tmp_path / "in.wav", pcm, src_rate, channels=src_ch)
    ref = tmp_path / "ref.xa"
    our = tmp_path / "our.xa"
    if dst_rate in (18900, 37800):
        args = ["-t", "xa", "-f", str(dst_rate), "-c", str(dst_ch)]
    else:
        # XA only accepts 18900/37800; other target rates run through
        # spu (mono).
        args = ["-t", "spu", "-f", str(dst_rate)]
    r = run_oracle(["-q"] + args + [wav, ref])
    assert r.returncode == 0, r.stderr
    assert cli.main(["-q"] + args + [str(wav), str(our)]) == 0
    if args[1] == "spu":
        assert ref.read_bytes() == our.read_bytes()
    else:
        ssize, mask = _mask_for("xa", 4)
        assert _normalize(ref.read_bytes(), ssize, mask) == \
            _normalize(our.read_bytes(), ssize, mask)


def test_fallback_wav_spu_golden(tmp_path, oracle):
    """Same-rate mono WAV with an smpl loop chunk through the fallback
    reader: spu bytes (incl. loop flags) match exactly."""
    wav = write_wav(tmp_path / "in.wav", rand_pcm(20_000, seed=22),
                    44100, loop_start=5600)
    ref = tmp_path / "ref.spu"
    our = tmp_path / "our.spu"
    args = ["-t", "spu", "-f", "44100"]
    r = run_oracle(["-q"] + args + [wav, ref])
    assert r.returncode == 0, r.stderr
    assert cli.main(["-q"] + args + [str(wav), str(our)]) == 0
    assert ref.read_bytes() == our.read_bytes()


def test_fallback_avi_sbs_golden(tmp_path, oracle):
    """Same-size raw-I420 AVI through the pure-Python AVI reader: sbs
    bytes match exactly (no rescale, no masking)."""
    frames = rand_frames(64, 48, 7, seed=23)
    avi = write_avi_sized(tmp_path / "in.avi", 64, 48, frames, 15)
    ref = tmp_path / "ref.sbs"
    our = tmp_path / "our.sbs"
    args = ["-t", "sbs", "-s", "64x48", "-a", "8192"]
    r = run_oracle(["-q"] + args + [avi, ref])
    assert r.returncode == 0, r.stderr
    assert cli.main(["-q"] + args + [str(avi), str(our)]) == 0
    assert ref.read_bytes() == our.read_bytes()


def test_fallback_avi_str_golden(tmp_path, oracle):
    """A/V AVI through the fallback reader: str interleave bytes match
    (masking the documented per-sector uninitialized regions)."""
    frames = rand_frames(64, 48, 16, seed=24)
    pcm = rand_pcm(37800 * 2, channels=2, seed=25)
    avi = write_avi_sized(tmp_path / "in.avi", 64, 48, frames, 15,
                          audio=pcm, audio_rate=37800)
    ref = tmp_path / "ref.str"
    our = tmp_path / "our.str"
    args = ["-t", "str", "-s", "64x48", "-f", "37800", "-c", "2"]
    r = run_oracle(["-q"] + args + [avi, ref])
    assert r.returncode == 0, r.stderr
    assert cli.main(["-q"] + args + [str(avi), str(our)]) == 0
    # str (2336): audio sectors' tail gap + EDC, video sectors' tail
    # incl. the bogus Form1 EDC region (PARITY.md).
    mask = [3, 7] + list(range(2056, 2336))
    assert _normalize(ref.read_bytes(), 2336, mask) == \
        _normalize(our.read_bytes(), 2336, mask)
