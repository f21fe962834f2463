"""Golden byte-diff tests for BS video: .sbs (whole-frame) and .str."""

import pytest

from psxavenc_tpu import cli
from tests.conftest import (rand_frames, rand_pcm, run_oracle,
                            write_avi_sized)


def _encode_both(tmp_path, avi_args, enc_args, ext):
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "our").mkdir(exist_ok=True)
    avi = write_avi_sized(tmp_path / "in.avi", *avi_args[:-1],
                          **avi_args[-1])
    ref_out = tmp_path / "ref" / f"out.{ext}"
    our_out = tmp_path / "our" / f"out.{ext}"
    r = run_oracle(["-q"] + enc_args + [avi, ref_out])
    assert r.returncode == 0, r.stderr
    rc = cli.main(["-q"] + [str(a) for a in enc_args] + [str(avi),
                                                         str(our_out)])
    assert rc == 0
    return ref_out.read_bytes(), our_out.read_bytes()


@pytest.mark.parametrize("codec,w,h,n,align", [
    ("v2", 64, 64, 4, 8192),
    ("v3", 64, 64, 4, 8192),
    ("v3dc", 64, 64, 4, 8192),
    ("v2", 128, 96, 3, 2048),    # tight budget forces higher quant scales
    ("v3", 320, 240, 2, 8192),
])
def test_sbs_golden(tmp_path, oracle, codec, w, h, n, align):
    frames = rand_frames(w, h, n, seed=w * h + n)
    ref, ours = _encode_both(
        tmp_path, (w, h, frames, 15, {}),
        ["-t", "sbs", "-v", codec, "-s", f"{w}x{h}", "-a", align], "sbs")
    assert len(ref) == len(ours)
    assert ref == ours


@pytest.mark.parametrize("codec", ["v2", "v3dc"])
def test_sbs_golden_device_tier(tmp_path, oracle, codec, monkeypatch):
    """The XLA device pipeline keeps end-to-end CLI coverage now that
    the native C++ tier is the CPU default: pin PSXAVENC_VIDEO_TIER and
    byte-diff against the oracle."""
    monkeypatch.setenv("PSXAVENC_VIDEO_TIER", "device")
    w, h, n = 64, 64, 3
    frames = rand_frames(w, h, n, seed=77)
    ref, ours = _encode_both(
        tmp_path, (w, h, frames, 15, {}),
        ["-t", "sbs", "-v", codec, "-s", f"{w}x{h}", "-a", 8192], "sbs")
    assert ref == ours


@pytest.mark.parametrize("src_fps,n", [(10, 4), (30, 10), (12, 5)])
def test_strv_cfr_mismatch_golden(tmp_path, oracle, src_fps, n):
    """Source frame rate != target: the CFR drop/duplicate retiming
    (decoding.c:408-478) must produce the reference's exact frame
    sequence and pacing — byte-identical output, no masking."""
    w, h = 64, 64
    frames = rand_frames(w, h, n, seed=100 + src_fps)
    ref, ours = _encode_both(
        tmp_path, (w, h, frames, src_fps, {}),
        ["-t", "strv", "-s", f"{w}x{h}", "-r", "15"], "str")
    assert len(ref) == len(ours)
    assert ref == ours


def test_strv_golden(tmp_path, oracle):
    w, h, n = 64, 64, 6
    frames = rand_frames(w, h, n, seed=7)
    ref, ours = _encode_both(
        tmp_path, (w, h, frames, 15, {}),
        ["-t", "strv", "-s", f"{w}x{h}"], "str")
    assert len(ref) == len(ours)
    assert ref == ours


def _mask_sectors(blob, ssize, offsets):
    arr = bytearray(blob)
    for base in range(0, len(arr), ssize):
        for off in offsets:
            if base + off < len(arr):
                arr[base + off] = 0
    return bytes(arr)


@pytest.mark.parametrize("fmt,codec,w,h,nf,fps,extra", [
    ("str", "v2", 64, 64, 8, 15, []),
    ("strcd", "v2", 64, 64, 8, 15, []),
    ("strcd", "v3", 128, 96, 6, 15, ["-x", "1"]),
    ("strcd", "v2", 64, 64, 10, 30, ["-r", "30"]),
    ("strcd", "v2", 64, 64, 8, 15, ["-X"]),      # trailing audio order
])
def test_str_av_golden(tmp_path, oracle, fmt, codec, w, h, nf, fps, extra):
    frames = rand_frames(w, h, nf, seed=nf * w)
    # Audio long enough to outlast the video.
    n_audio = int(37800 * (nf / fps) * 1.4) + 4000
    audio = rand_pcm(n_audio, channels=2, seed=nf)
    ref, ours = _encode_both(
        tmp_path, (w, h, frames, fps, {"audio": audio,
                                       "audio_rate": 37800}),
        ["-t", fmt, "-v", codec, "-s", f"{w}x{h}"] + extra, "str")
    assert len(ref) == len(ours), (len(ref), len(ours))
    ssize = 2352 if fmt == "strcd" else 2336
    if fmt == "strcd":
        # [0x918, 0x92C) of the data area is never written (reference stack
        # garbage) and feeds the Form2 EDC of audio sectors; mask both.
        mask = list(range(2328, 2352))
    else:
        # 2336-byte layout: the OR-target coding byte (+dup) and the
        # unwritten gap + EDC tail.
        mask = [3, 7] + list(range(2312, 2336))
    if extra == ["-X"]:
        # With trailing audio the first sector is video: its tail beyond
        # the payload is initial stack garbage in the reference.
        mask = sorted(set(mask) | set(range(2076, ssize)))
    assert _mask_sectors(ref, ssize, mask) == _mask_sectors(ours, ssize,
                                                            mask)


@pytest.mark.parametrize("fmt,codec,w,h,nf,extra", [
    ("sbs", "v2", 16, 16, 3, ["-a", "256"]),        # smallest legal frame
    ("strv", "v3", 48, 32, 5, ["-r", "30/2"]),      # fractional frame rate
    ("strv", "v2", 64, 64, 4, ["-x", "1"]),         # 1x CD speed pacing
])
def test_bs_edge_cases(tmp_path, oracle, fmt, codec, w, h, nf, extra):
    frames = rand_frames(w, h, nf, seed=w + h + nf)
    ext = "sbs" if fmt == "sbs" else "str"
    ref, ours = _encode_both(
        tmp_path, (w, h, frames, 15, {}),
        ["-t", fmt, "-v", codec, "-s", f"{w}x{h}"] + extra, ext)
    assert len(ref) == len(ours)
    assert ref == ours


def test_strcd_flagship_golden(tmp_path, oracle):
    """The BASELINE.json headline config at full size: 320x240 15fps BS v2
    + 37800 Hz stereo XA, 2352-byte sectors, 2x speed."""
    w, h, nf, fps = 320, 240, 8, 15
    frames = rand_frames(w, h, nf, seed=99)
    n_audio = int(37800 * (nf / fps) * 1.4) + 4000
    audio = rand_pcm(n_audio, channels=2, seed=98)
    ref, ours = _encode_both(
        tmp_path, (w, h, frames, fps, {"audio": audio,
                                       "audio_rate": 37800}),
        ["-t", "strcd", "-x", "2"], "str")
    assert len(ref) == len(ours)
    mask = list(range(2328, 2352))
    assert _mask_sectors(ref, 2352, mask) == _mask_sectors(ours, 2352,
                                                           mask)


def test_sbs_fat_block_fallback_golden(tmp_path, oracle):
    """A huge budget + one busy macroblock yields >256-bit block streams,
    driving the packer's exact overflow fallback (ops/bitpack.py and the
    fused path's lax.cond) — output must still match the reference."""
    import numpy as np

    w = h = 64
    rng = np.random.default_rng(3)
    frames = []
    for _ in range(3):
        y = np.full((h, w), 128, np.uint8)
        y[:16, :16] = (rng.integers(0, 2, (16, 16)) * 255).astype(np.uint8)
        cb = np.full((h // 2) * (w // 2), 128, np.uint8)
        cr = np.full((h // 2) * (w // 2), 128, np.uint8)
        frames.append((y.reshape(-1), cb, cr))
    ref, ours = _encode_both(
        tmp_path, (w, h, frames, 15, {}),
        ["-t", "sbs", "-v", "v2", "-s", f"{w}x{h}", "-a", 32768], "sbs")
    assert len(ref) == len(ours)
    assert ref == ours


def test_str_audio_runs_dry_golden(tmp_path, oracle):
    """Audio shorter than the video: the reference bumps
    video_sectors_per_block when an audio sector comes up empty
    (filefmt.c:482-485), changing the interleave pattern mid-file —
    reproduce byte-for-byte (modulo the documented uninit masks)."""
    w, h, nf, fps = 64, 64, 12, 15
    frames = rand_frames(w, h, nf, seed=55)
    # ~40% of the video duration's worth of audio.
    n_audio = int(37800 * (nf / fps) * 0.4)
    audio = rand_pcm(n_audio, channels=2, seed=54)
    ref, ours = _encode_both(
        tmp_path, (w, h, frames, fps, {"audio": audio,
                                       "audio_rate": 37800}),
        ["-t", "strcd", "-v", "v2", "-s", f"{w}x{h}"], "str")
    assert len(ref) == len(ours), (len(ref), len(ours))
    mask = list(range(2328, 2352))
    assert _mask_sectors(ref, 2352, mask) == _mask_sectors(ours, 2352,
                                                           mask)
