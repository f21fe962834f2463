"""Randomized-config golden fuzzing: draw valid option combinations,
encode with both encoders, compare bytes (masking reference UB regions).

Deterministic seeds; each case covers a combination the fixed-matrix tests
may not."""

import numpy as np
import pytest

from psxavenc_tpu import cli
from tests.conftest import (rand_frames, rand_pcm, run_oracle,
                            write_avi_sized, write_wav)
from tests.test_golden_xa import _mask_for, _normalize


def _both(tmp_path, infile, enc_args, ext):
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "our").mkdir(exist_ok=True)
    ref_out = tmp_path / "ref" / f"o.{ext}"
    our_out = tmp_path / "our" / f"o.{ext}"
    r = run_oracle(["-q"] + enc_args + [infile, ref_out])
    assert r.returncode == 0, (enc_args, r.stderr)
    assert cli.main(["-q"] + [str(a) for a in enc_args]
                    + [str(infile), str(our_out)]) == 0
    return ref_out.read_bytes(), our_out.read_bytes()


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_audio(tmp_path, oracle, seed):
    rng = np.random.default_rng(1000 + seed)
    fmt = rng.choice(["xa", "xacd", "spu", "vag", "spui", "vagi"])
    if fmt in ("xa", "xacd"):
        freq = int(rng.choice([18900, 37800]))
        ch = int(rng.choice([1, 2]))
        bits = int(rng.choice([4, 8]))
        n = int(rng.integers(3000, 40000))
        args = ["-t", fmt, "-f", freq, "-c", ch, "-b", bits,
                "-F", int(rng.integers(0, 256)),
                "-C", int(rng.integers(0, 32))]
    elif fmt in ("spu", "vag"):
        freq = int(rng.choice([11025, 22050, 44100]))
        ch, bits = 1, 4
        n = int(rng.integers(100, 40000))
        args = ["-t", fmt, "-f", freq,
                "-a", int(rng.choice([16, 64, 256, 2048]))]
        if rng.random() < 0.4:
            args += ["-l", int(rng.integers(0, 500))]
        if rng.random() < 0.3:
            args += ["-D"]
    else:
        freq = 44100
        ch = int(rng.integers(1, 5))
        bits = 4
        n = int(rng.integers(3000, 30000))
        args = ["-t", fmt, "-c", ch,
                "-i", int(rng.choice([256, 1024, 2048])),
                "-a", int(rng.choice([512, 2048]))]
        if rng.random() < 0.3:
            args += ["-L"]
    pcm = rand_pcm(n, channels=ch, seed=2000 + seed)
    wav = write_wav(tmp_path / "i.wav", pcm, freq, channels=ch)
    ref, ours = _both(tmp_path, wav, args, "bin")
    assert len(ref) == len(ours), args
    if fmt in ("xa", "xacd"):
        ssize, mask = _mask_for(fmt, bits)
        ref, ours = _normalize(ref, ssize, mask), _normalize(ours, ssize,
                                                             mask)
    assert ref == ours, args


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_video(tmp_path, oracle, seed):
    rng = np.random.default_rng(3000 + seed)
    fmt = rng.choice(["sbs", "strv"])
    codec = rng.choice(["v2", "v3", "v3dc"])
    w = 16 * int(rng.integers(1, 7))
    h = 16 * int(rng.integers(1, 6))
    nf = int(rng.integers(1, 7))
    fps = int(rng.choice([10, 15, 24, 30]))
    args = ["-t", fmt, "-v", codec, "-s", f"{w}x{h}"]
    if fmt == "sbs":
        # sbs takes no -r (the reference rejects it; frame rate only
        # affects its progress display).
        fps = 15
        args += ["-a", int(rng.choice([2048, 4096, 8192, 16384]))]
    else:
        args += ["-r", fps]
    frames = rand_frames(w, h, nf, seed=4000 + seed)
    avi = write_avi_sized(tmp_path / "i.avi", w, h, frames, fps)
    ref, ours = _both(tmp_path, avi, args,
                      "sbs" if fmt == "sbs" else "str")
    assert ref == ours, args

@pytest.mark.parametrize("seed", range(4))
def test_fuzz_streaming(tmp_path, oracle, monkeypatch, seed):
    """Random A/V str configs through the STREAMING tier with tiny encode
    chunks (maximal state-threading stress), vs the oracle."""
    from psxavenc_tpu.containers import strf
    from psxavenc_tpu.containers import xa as xamod

    monkeypatch.setenv("PSXAVENC_STREAMING", "1")
    monkeypatch.setattr(xamod, "AUDIO_CHUNK_SECTORS", 3)
    monkeypatch.setattr(strf, "VIDEO_BATCH_FRAMES", 5)
    rng = np.random.default_rng(6000 + seed)
    fmt = str(rng.choice(["str", "strcd"]))
    codec = str(rng.choice(["v2", "v3", "v3dc"]))
    w = 16 * int(rng.integers(2, 6))
    h = 16 * int(rng.integers(2, 5))
    nf = int(rng.integers(4, 16))
    fps = int(rng.choice([10, 15]))
    freq = int(rng.choice([18900, 37800]))
    ch = int(rng.choice([1, 2]))
    bits = int(rng.choice([4, 8]))
    args = ["-t", fmt, "-v", codec, "-s", f"{w}x{h}", "-r", fps,
            "-f", freq, "-c", ch, "-b", bits]
    frames = rand_frames(w, h, nf, seed=7000 + seed)
    pcm = rand_pcm(int(freq * (nf / fps + 0.5)), channels=ch,
                   seed=8000 + seed)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    avi = write_avi_sized(tmp_path / "i.avi", w, h, frames, fps,
                          audio=pcm, audio_rate=freq)
    ref, ours = _both(tmp_path, avi, args, "str")
    assert len(ref) == len(ours), args
    ssize = 2352 if fmt == "strcd" else 2336
    if fmt == "strcd":
        mask = list(range(2328, 2352)) + list(range(0x81C, 0x930))
    else:
        mask = [3, 7] + list(range(2056, 2336))
    if bits == 8:
        payload = 24 if fmt == "strcd" else 8
        mask = list(mask)
        for b in range(18):
            mask += list(range(payload + b * 128 + 8,
                               payload + b * 128 + 16))
    assert _normalize(ref, ssize, mask) == _normalize(ours, ssize, mask), \
        args


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_fallback_resample_remix(tmp_path, oracle, monkeypatch,
                                      seed):
    """Random (source rate x channels) -> (XA/SPU target) through the
    ffmpeg-free fallback tier: exercises the 41 swr tap banks, the
    probed Q15 remix matrices, and swresample's rematrix/resample
    ORDER on draws the fixed-matrix tests don't cover."""
    monkeypatch.setenv("PSXAVENC_NO_NATIVE_INGEST", "1")
    monkeypatch.setenv("PSXAVENC_STREAMING", "0")
    rng = np.random.default_rng(9000 + seed)
    src_rate = int(rng.choice([8000, 11025, 16000, 22050, 24000, 32000,
                               44100, 48000]))
    src_ch = int(rng.choice([1, 2, 4, 6]))
    if rng.random() < 0.5:
        fmt, dst_rate = "xa", int(rng.choice([18900, 37800]))
        dst_ch = int(rng.choice([1, 2]))
        args = ["-t", fmt, "-f", dst_rate, "-c", dst_ch]
    else:
        fmt, dst_rate = "spu", int(rng.choice([18900, 22050, 44100]))
        args = ["-t", fmt, "-f", dst_rate]
    n = int(rng.integers(src_rate // 2, src_rate * 2))
    pcm = rand_pcm(n, channels=src_ch, seed=9500 + seed)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    wav = write_wav(tmp_path / "i.wav", pcm, src_rate, channels=src_ch)
    ref, ours = _both(tmp_path, wav, args, "bin")
    assert len(ref) == len(ours), (args, src_rate, src_ch)
    if fmt == "xa":
        ssize, mask = _mask_for("xa", 4)
        ref, ours = _normalize(ref, ssize, mask), _normalize(
            ours, ssize, mask)
    assert ref == ours, (args, src_rate, src_ch)
