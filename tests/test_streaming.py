"""Bounded-memory streaming ingest (io.ingest.StreamingDecoder + the
incremental str/sbs muxers): byte parity with the whole-file tier and
O(1)-memory behavior on long inputs.

The reference never holds more than ~1 sector of audio plus
``frames_needed`` frames (decoding.c:510-559); the streaming tier mirrors
that with a two-pass native decode (count-only schedule pass + a
packet-at-a-time consumption pass)."""

import resource
import subprocess
import sys

import numpy as np
import pytest

from psxavenc_tpu import cli
from psxavenc_tpu import cli_args as ca
from psxavenc_tpu.containers import xa as xamod
from psxavenc_tpu.io import ingest
from psxavenc_tpu.native import ingest_ext
from tests.conftest import rand_frames, rand_pcm, write_avi_sized

from tests.conftest import golden_skipif

pytestmark = golden_skipif(
    ingest_ext.load() is None,
    "native FFmpeg ingest extension unavailable")


def _encode(monkeypatch, streaming, argv):
    monkeypatch.setenv("PSXAVENC_STREAMING", "1" if streaming else "0")
    rc = cli.main(argv)
    assert rc == 0


@pytest.mark.parametrize("fmt,extra", [
    ("str", ["-f", "37800", "-c", "2"]),
    ("strcd", ["-f", "18900", "-c", "1", "-b", "8"]),
    ("strv", []),
    ("sbs", ["-v", "v3"]),
])
def test_streaming_matches_wholefile(tmp_path, monkeypatch, fmt, extra):
    """PSXAVENC_STREAMING=1 produces bytes identical to the whole-file
    tier for every video container."""
    frames = rand_frames(96, 64, 41, seed=11)
    pcm = rand_pcm(44100 * 3, channels=2, seed=12)
    avi = write_avi_sized(tmp_path / "in.avi", 96, 64, frames, 15,
                          audio=pcm)
    a = tmp_path / f"whole.{fmt}"
    b = tmp_path / f"stream.{fmt}"
    args = ["-q", "-t", fmt, "-s", "96x64"] + extra
    _encode(monkeypatch, False, args + [str(avi), str(a)])
    _encode(monkeypatch, True, args + [str(avi), str(b)])
    assert a.read_bytes() == b.read_bytes()


@pytest.mark.parametrize("fmt,extra", [
    ("xa", ["-f", "37800", "-c", "2"]),
    ("vag", ["-f", "44100"]),
    ("spui", ["-c", "2", "-f", "44100"]),
])
def test_streaming_matches_wholefile_audio(tmp_path, monkeypatch, fmt,
                                           extra):
    """Audio formats stream too: chunked encode with threaded ADPCM state
    produces bytes identical to the whole-file tier."""
    from psxavenc_tpu.containers import vag as vagmod
    from psxavenc_tpu.utils.synth import write_wav

    # Small chunks force multi-chunk state threading in both tiers.
    monkeypatch.setattr(xamod, "AUDIO_CHUNK_SECTORS_SOLO", 3)
    monkeypatch.setattr(vagmod, "SPU_CHUNK_BLOCKS", 57)
    wav = write_wav(tmp_path / "in.wav",
                    rand_pcm(44100 * 2, channels=2, seed=17)
                    if "-c" in extra and "2" in extra else
                    rand_pcm(44100 * 2, seed=17), 44100,
                    channels=2 if ("-c" in extra and "2" in extra) else 1)
    a = tmp_path / f"whole.{fmt}"
    b = tmp_path / f"stream.{fmt}"
    args = ["-q", "-t", fmt] + extra
    _encode(monkeypatch, False, args + [str(wav), str(a)])
    _encode(monkeypatch, True, args + [str(wav), str(b)])
    ab, bb = bytearray(a.read_bytes()), bytearray(b.read_bytes())
    if fmt in ("vag", "vagi"):
        ab[0x20:0x30] = bb[0x20:0x30] = b"\0" * 16  # embedded basename
    assert ab == bb


def test_chunked_audio_matches_oracle(tmp_path, monkeypatch, oracle):
    """Multi-chunk whole-file encodes (threaded state across device
    calls) still match the reference byte-for-byte."""
    from tests.conftest import run_oracle, write_wav
    from tests.test_golden_xa import _mask_for, _normalize

    monkeypatch.setattr(xamod, "AUDIO_CHUNK_SECTORS_SOLO", 2)
    wav = write_wav(tmp_path / "in.wav",
                    rand_pcm(37800 * 2, channels=2, seed=18), 37800,
                    channels=2)
    args = ["-q", "-t", "xa", "-f", "37800", "-c", "2"]
    ref = tmp_path / "ref.xa"
    our = tmp_path / "our.xa"
    r = run_oracle(args + [wav, ref])
    assert r.returncode == 0, r.stderr
    assert cli.main(args + [str(wav), str(our)]) == 0
    ssize, mask = _mask_for("xa", 4)
    assert _normalize(ref.read_bytes(), ssize, mask) == \
        _normalize(our.read_bytes(), ssize, mask)


def test_streaming_decoder_window_is_bounded(tmp_path, monkeypatch):
    """The native stream's internal FIFOs stay near the muxer's working
    set (batch look-ahead + interleave skew), independent of file length
    — the structural O(1)-memory guarantee."""
    n = 400
    frames = rand_frames(64, 48, n, seed=13)
    pcm = rand_pcm(44100 * (n // 15 + 1), channels=2, seed=14)
    avi = write_avi_sized(tmp_path / "in.avi", 64, 48, frames, 15,
                          audio=pcm)

    args = ca.Args()
    assert ca.parse_args(args, ["-q", "-t", "str", "-s", "64x48", "-f",
                                "37800", "-c", "2", str(avi),
                                str(tmp_path / "out.str")])
    flags = (ingest.DECODER_USE_AUDIO | ingest.DECODER_USE_VIDEO
             | ingest.DECODER_VIDEO_REQUIRED)
    dec = ingest.StreamingDecoder(args, flags, str(avi))
    assert dec.video_frame_count >= n  # CFR retiming may duplicate
    from psxavenc_tpu.containers import strf

    with open(tmp_path / "out.str", "wb") as f:
        strf.encode_file_str(args, dec, f)
    # Working set: filling one audio chunk (AUDIO_CHUNK_SECTORS sectors'
    # samples) decodes the interleaved video span ahead, plus the encode
    # look-ahead batch and demux skew — independent of file length.
    sps = 4032 // 2  # 37800 Hz stereo samples/sector pair
    chunk_seconds = xamod.AUDIO_CHUNK_SECTORS * sps / 37800
    bound = int(chunk_seconds * 15) + 3 * strf.VIDEO_BATCH_FRAMES + 16
    assert 0 < dec.peak_buffered_frames <= bound
    # Audio FIFO: one chunk's take plus demux skew, plus the audio
    # interleaved with the video look-ahead span (the muxer pulls up to
    # ~3 video batches ahead of the audio cursor, and the demuxer must
    # buffer that span's audio). Still O(1) in the file length.
    lookahead_audio = 3 * strf.VIDEO_BATCH_FRAMES / 15 * 37800 * 2
    cap = (xamod.AUDIO_CHUNK_SECTORS + 64) * sps * 2 + int(lookahead_audio)
    assert 0 < dec.peak_buffered_audio <= cap


@pytest.mark.slow
def test_streaming_long_input_bounded_rss(tmp_path):
    """A >=2000-frame encode in streaming mode stays under 500 MB peak
    RSS and produces bytes identical to the whole-file tier (VERDICT r2
    item 2's done-criterion; reference window: decoding.c:510-559)."""
    n = 2000
    frames = rand_frames(64, 48, n, seed=15)
    avi = write_avi_sized(tmp_path / "long.avi", 64, 48, frames, 15)

    outs = {}
    for mode in ("warm", "0", "1"):
        # "warm" is a throwaway pass that populates the persistent
        # compile cache: XLA's compile-time peak (hundreds of MB to GBs)
        # would otherwise drown the encoder's working set in the
        # measured children.
        out = tmp_path / f"out{mode}.strv"
        # NOTE: ru_maxrss is NOT reset by execve and fork inherits the
        # parent's resident pages, so a subprocess of a multi-GB pytest
        # parent would report the PARENT's peak. VmHWM is mm-based and
        # resets on exec — it measures only the child.
        code = (
            "import sys\n"
            "import jax\n"
            "jax.config.update('jax_compilation_cache_dir',"
            " '/tmp/jax_cache')\n"
            "jax.config.update("
            "'jax_persistent_cache_min_compile_time_secs', 0.5)\n"
            "from psxavenc_tpu import cli\n"
            f"rc = cli.main(['-q', '-t', 'strv', '-s', '64x48',"
            f" {str(avi)!r}, {str(out)!r}])\n"
            "hwm = [l for l in open('/proc/self/status')"
            " if l.startswith('VmHWM')][0].split()[1]\n"
            "print('PEAK_KB', hwm)\n"
            "sys.exit(rc)\n"
        )
        # Single CPU device + persistent compile cache: the measurement
        # targets the ENCODER's working set; XLA's compile-time peak on
        # an 8-virtual-device mesh swings 0.6-5 GB run to run and would
        # drown the signal.
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env={**__import__('os').environ,
                 "PSXAVENC_PLATFORM": "cpu",
                 "PSXAVENC_STREAMING": "0" if mode == "warm" else mode,
                 "XLA_FLAGS": "",
                 "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
                 "PYTHONPATH": "/root/.axon_site:/root/repo"})
        assert r.returncode == 0, r.stderr
        peak_kb = int(r.stdout.split("PEAK_KB")[1].split()[0])
        if mode != "warm":
            outs[mode] = (out.read_bytes(), peak_kb)

    assert outs["0"][0] == outs["1"][0], "streaming bytes != whole-file"
    # ~300 MB measured (mostly the JAX/XLA CPU runtime); the structural
    # FIFO high-water test above is the length-independence proof, this
    # pins the absolute lid.
    assert outs["1"][1] < 500 * 1024, f"streaming RSS {outs['1'][1]} kB"


def test_streaming_auto_decision(tmp_path, monkeypatch):
    """The auto tier streams iff the duration-based size estimate crosses
    the threshold."""
    frames = rand_frames(64, 48, 30, seed=16)
    avi = write_avi_sized(tmp_path / "in.avi", 64, 48, frames, 15)
    args = ca.Args()
    assert ca.parse_args(args, ["-q", "-t", "strv", "-s", "64x48",
                                str(avi), str(tmp_path / "o.strv")])
    flags = ingest.DECODER_USE_VIDEO | ingest.DECODER_VIDEO_REQUIRED

    monkeypatch.setenv("PSXAVENC_STREAMING", "auto")
    monkeypatch.setattr(ingest, "_STREAM_AUTO_BYTES", 10_000)
    dec = ingest.open_av_data(args, flags)
    assert isinstance(dec, ingest.StreamingDecoder)
    dec.close()

    monkeypatch.setattr(ingest, "_STREAM_AUTO_BYTES", 1 << 40)
    dec = ingest.open_av_data(args, flags)
    assert not isinstance(dec, ingest.StreamingDecoder)
