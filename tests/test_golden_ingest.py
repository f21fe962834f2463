"""Golden byte-diffs for the ingest paths that need the real
libswresample/libswscale: rate conversion, rescaling, aspect adjustment,
and the -R/-S option strings (decoding.c:237-311). These run through the
native FFmpeg ingest extension — the same L0 libraries the reference
binary links — so outputs must be byte-identical, no masking."""

import numpy as np
import pytest

from psxavenc_tpu import cli
from psxavenc_tpu.native import ingest_ext
from tests.conftest import (rand_frames, rand_pcm, run_oracle, write_avi_sized,
                            write_wav)

from tests.conftest import golden_skipif

pytestmark = golden_skipif(
    ingest_ext.load() is None,
    "native FFmpeg ingest extension unavailable")


def _both(tmp_path, inp, enc_args, ext):
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "our").mkdir(exist_ok=True)
    ref_out = tmp_path / "ref" / f"out.{ext}"
    our_out = tmp_path / "our" / f"out.{ext}"
    r = run_oracle(["-q"] + enc_args + [inp, ref_out])
    assert r.returncode == 0, r.stderr
    rc = cli.main(["-q"] + [str(a) for a in enc_args]
                  + [str(inp), str(our_out)])
    assert rc == 0
    return ref_out.read_bytes(), our_out.read_bytes()


@pytest.mark.parametrize("src_rate,dst_rate,fmt", [
    (44100, 37800, "xa"),
    (44100, 18900, "xa"),
    (48000, 22050, "spu"),
    (32000, 44100, "spu"),     # upsampling
])
def test_rate_conversion_golden(tmp_path, oracle, src_rate, dst_rate, fmt):
    """swresample rate conversion through the native ingest is bit-exact
    vs the reference (decoding.c:237-255) — no masks."""
    wav = write_wav(tmp_path / "in.wav", rand_pcm(src_rate * 2, seed=17),
                    src_rate)
    args = ["-t", fmt, "-f", str(dst_rate)]
    if fmt == "xa":
        args += ["-c", "2", "-b", "4"]
    ref, ours = _both(tmp_path, wav, args, fmt)
    assert len(ref) == len(ours)
    if fmt == "spu":
        assert ref == ours
    else:
        # xa 2336-byte sectors carry documented uninitialized-memory
        # regions (PARITY.md); mask only those.
        r = np.frombuffer(ref, np.uint8).reshape(-1, 2336).copy()
        o = np.frombuffer(ours, np.uint8).reshape(-1, 2336).copy()
        for a in (r, o):
            a[:, 3] = 0
            a[:, 7] = 0
            a[:, 0x908:] = 0
        assert np.array_equal(r, o)


def test_swr_options_golden(tmp_path, oracle):
    """-R reaches libswresample verbatim (decoding.c:250-252): a custom
    filter_size changes output bytes identically on both encoders."""
    wav = write_wav(tmp_path / "in.wav", rand_pcm(44100, seed=23), 44100)
    base = ["-t", "spu", "-f", "22050"]
    ref, ours = _both(tmp_path, wav, ["-R", "filter_size=16"] + base, "spu")
    assert ref == ours
    ref_def, _ = _both(tmp_path, wav, base, "spu")
    assert ref_def != ref  # the option actually altered the resampler


def test_swr_options_invalid_fails(tmp_path, oracle, capsys):
    wav = write_wav(tmp_path / "in.wav", rand_pcm(8000, seed=3), 44100)
    rc = cli.main(["-q", "-R", "no_such_option=1", "-t", "spu", "-f",
                   "22050", str(wav), str(tmp_path / "o.spu")])
    assert rc == 1
    assert "Failed to open input file" in capsys.readouterr().err
    r = run_oracle(["-q", "-R", "no_such_option=1", "-t", "spu", "-f",
                    "22050", wav, tmp_path / "r.spu"])
    assert r.returncode == 1


@pytest.mark.parametrize("src_w,src_h,req,extra", [
    (640, 480, "320x240", []),         # clean 2x downscale, aspect match
    (160, 112, "320x224", []),         # upscale, aspect match
    (640, 352, "320x240", ["-I"]),     # 16:9 squeezed (ignore aspect)
])
def test_rescale_golden(tmp_path, oracle, src_w, src_h, req, extra):
    """swscale BICUBIC rescale through the native ingest is bit-exact vs
    the reference (decoding.c:287-311). Only cases where the aspect
    adjustment leaves the size unchanged (or -I) can be byte-compared:
    when the adjustment shrinks the decode size, the reference encoder is
    still initialized with the requested size (filefmt.c:425,547,635) and
    reads past each decoded frame — UB we do not reproduce (PARITY.md)."""
    frames = rand_frames(src_w, src_h, 3, seed=src_w + src_h)
    avi = write_avi_sized(tmp_path / "in.avi", src_w, src_h, frames, 15)
    ref, ours = _both(
        tmp_path, avi,
        ["-t", "sbs", "-v", "v2", "-s", req] + extra + ["-a", "8192"],
        "sbs")
    assert len(ref) == len(ours)
    assert ref == ours


def test_aspect_adjust_encodes_adjusted_size(tmp_path):
    """16:9 input without -I: the decode size shrinks to 320x176
    (decoding.c:275-285) and — unlike the reference, whose encoder keeps
    reading 320x240 past the frame (filefmt.c:425, documented UB
    divergence) — we encode the adjusted geometry, visible in the STR
    chunk headers."""
    frames = rand_frames(640, 352, 3, seed=31)
    avi = write_avi_sized(tmp_path / "in.avi", 640, 352, frames, 15)
    out = tmp_path / "o.str"
    rc = cli.main(["-q", "-t", "strv", "-s", "320x240", str(avi),
                   str(out)])
    assert rc == 0
    data = np.frombuffer(out.read_bytes(), np.uint8)
    sector = data[:2048]
    width = int(sector[0x10]) | (int(sector[0x11]) << 8)
    height = int(sector[0x12]) | (int(sector[0x13]) << 8)
    assert (width, height) == (320, 176)


def test_sws_options_golden(tmp_path, oracle):
    """-S strings reach libswscale's AVOptions verbatim; valid options
    behave identically, invalid ones fail the open on both encoders."""
    frames = rand_frames(640, 480, 2, seed=5)
    avi = write_avi_sized(tmp_path / "in.avi", 640, 480, frames, 15)
    args = ["-S", "param0=1.0", "-t", "sbs", "-v", "v2", "-s", "320x240",
            "-a", "8192"]
    ref, ours = _both(tmp_path, avi, args, "sbs")
    assert ref == ours
    rc = cli.main(["-q", "-S", "bogus_opt=1", "-t", "sbs", "-s",
                   "320x240", str(avi), str(tmp_path / "x.sbs")])
    assert rc == 1
    r = run_oracle(["-q", "-S", "bogus_opt=1", "-t", "sbs", "-s",
                    "320x240", avi, tmp_path / "y.sbs"])
    assert r.returncode == 1


def test_native_ingest_matches_python_wav(tmp_path):
    """Same-rate WAV: the native FFmpeg ingest and the pure-Python WAV
    path produce identical PCM (the Q15 remix path is swr-exact)."""
    import os

    from psxavenc_tpu import cli_args as ca
    from psxavenc_tpu.io import ingest

    wav = write_wav(tmp_path / "in.wav", rand_pcm(30000, seed=9), 37800)
    args = ca.Args()
    ca.parse_args(args, ["-t", "xa", "-f", "37800", "-c", "2",
                         str(wav), str(tmp_path / "o.xa")])
    d_native = ingest.open_av_data(args, ingest.DECODER_USE_AUDIO)
    os.environ["PSXAVENC_NO_NATIVE_INGEST"] = "1"
    try:
        d_py = ingest.open_av_data(args, ingest.DECODER_USE_AUDIO)
    finally:
        del os.environ["PSXAVENC_NO_NATIVE_INGEST"]
    assert np.array_equal(d_native.audio, d_py.audio)
