"""Ingest-layer unit tests: windowing semantics, remix, CFR, ffmpeg gate."""

import os
import stat

import numpy as np

from psxavenc_tpu.io import ingest
from tests.conftest import rand_pcm, write_wav


def test_ensure_retire_quirk():
    """decoding.c:514-520: end_of_input flips when the buffer can no longer
    exceed the need, and ensure keeps returning True until empty."""
    dec = ingest.Decoder()
    dec.audio = np.zeros(100, np.int16)
    assert dec.ensure_av_data(28, 0)
    assert not dec.end_of_input          # 100 > 28
    dec.retire_av_data(28, 0)
    assert dec.ensure_av_data(28, 0)     # 72 > 28
    assert not dec.end_of_input
    dec.retire_av_data(28, 0)            # 44 left
    assert dec.ensure_av_data(28, 0)
    assert not dec.end_of_input          # 44 > 28
    dec.retire_av_data(28, 0)            # 16 left
    assert dec.ensure_av_data(28, 0)     # 16 <= 28 -> EOF, but nonempty
    assert dec.end_of_input
    dec.retire_av_data(16, 0)
    assert not dec.ensure_av_data(28, 0)  # empty


def test_exact_multiple_flags_eoi_on_last_block():
    dec = ingest.Decoder()
    dec.audio = np.zeros(56, np.int16)
    assert dec.ensure_av_data(28, 0) and not dec.end_of_input
    dec.retire_av_data(28, 0)
    assert dec.ensure_av_data(28, 0) and dec.end_of_input
    dec.retire_av_data(28, 0)
    assert not dec.ensure_av_data(28, 0)


def test_drain_audio_blocks_matches_loop():
    """The whole-file decoder's closed-form drain equals the real
    ensure/retire loop — lengths, eoi flags, AND end state — across the
    edge cases (exact multiple, sub-block file, empty, pre-set eoi)."""
    def by_loop(n, eoi0=False):
        dec = ingest.Decoder()
        dec.audio = np.zeros(n, np.int16)
        dec.end_of_input = eoi0
        lens, eois = [], []
        while dec.ensure_av_data(28, 0):
            ln = min(dec.audio_sample_count, 28)
            lens.append(ln)
            eois.append(dec.end_of_input)
            dec.retire_av_data(ln, 0)
        return (np.asarray(lens, np.int64), np.asarray(eois, bool),
                dec.audio_pos, dec.end_of_input)

    for n in (0, 1, 27, 28, 29, 56, 100, 28 * 17):
        for eoi0 in (False, True):
            dec = ingest.Decoder()
            dec.audio = np.zeros(n, np.int16)
            dec.end_of_input = eoi0
            lens, eois = dec.drain_audio_blocks(28)
            ref = by_loop(n, eoi0)
            assert np.array_equal(lens, ref[0]), (n, eoi0)
            assert np.array_equal(eois, ref[1]), (n, eoi0)
            assert dec.audio_pos == ref[2] and \
                dec.end_of_input == ref[3], (n, eoi0)
    # The generic helper routes streaming-style decoders (no fast
    # method) through the loop.
    class LoopOnly:
        def __init__(self):
            self.inner = ingest.Decoder()
            self.inner.audio = np.zeros(100, np.int16)
        ensure_av_data = property(lambda s: s.inner.ensure_av_data)
        retire_av_data = property(lambda s: s.inner.retire_av_data)
        audio_sample_count = property(
            lambda s: s.inner.audio_sample_count)
        end_of_input = property(lambda s: s.inner.end_of_input)

    lens, eois = ingest.drain_audio_blocks(LoopOnly(), 28)
    assert lens.tolist() == [28, 28, 28, 16]
    assert eois.tolist() == [False, False, False, True]


def test_cfr_dup_and_drop():
    frames = [np.full(4, i, np.uint8) for i in range(5)]
    # 5 fps input to 15 fps target: each frame duplicated 3x (2 dupes).
    out = ingest._cfr_retime(frames, [i / 5 for i in range(5)], 15, 1)
    # Double arithmetic puts some gaps a hair over 2 steps (ceil -> 3
    # dupes), exactly like the reference's double-based pts grid
    # (decoding.c:443).
    assert len(out) == 14
    # 30 fps input to 15 fps target: the reference's grid anchors at the
    # first pts and drops frames that land before the next slot
    # (decoding.c:432-437) -> keeps 0,1,2,4 here.
    out = ingest._cfr_retime(frames, [i / 30 for i in range(5)], 15, 1)
    assert [int(f[0]) for f in out] == [0, 1, 2, 4]


def test_q15_mono_to_stereo_exact():
    x = np.array([[1000], [-32768], [32767], [1]], np.int16)
    y = ingest._remix_channels(x, 2)
    expect = (x.astype(np.int64) * 23170 + (1 << 14)) >> 15
    assert np.array_equal(y[:, 0], np.clip(expect[:, 0], -32768, 32767))
    assert np.array_equal(y[:, 0], y[:, 1])


class _FakeArgs:
    def __init__(self, **kw):
        self.audio_frequency = 44100
        self.audio_channels = 1
        self.swresample_options = None
        self.swscale_options = None
        self.str_fps_num = 15
        self.str_fps_den = 1
        self.flags = 0
        self.__dict__.update(kw)


def test_ffmpeg_cli_gate(tmp_path, monkeypatch):
    """With an ffmpeg binary on PATH, non-native formats decode through it."""
    fake = tmp_path / "bin" / "ffmpeg"
    fake.parent.mkdir()
    n = 1000
    pcm = rand_pcm(n, seed=5)
    raw = tmp_path / "payload.raw"
    raw.write_bytes(pcm.astype("<i2").tobytes())
    fake.write_text(f"#!/bin/sh\ncat {raw}\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{fake.parent}:{os.environ['PATH']}")

    out = ingest._ffmpeg_audio(_FakeArgs(), "whatever.mp3")
    assert out is not None and out.shape == (n, 1)
    assert np.array_equal(out[:, 0], pcm)


def test_swr_filter_spec():
    """The aresample spec mirrors the reference's swr setup incl. -R
    passthrough (decoding.c:237-255)."""
    a = _FakeArgs(audio_frequency=37800, audio_channels=2)
    assert ingest._swr_filter(a) == "aresample=osr=37800:ocl=stereo"
    a = _FakeArgs(audio_frequency=18900, audio_channels=1,
                  swresample_options="filter_size=64,phase_shift=8")
    assert ingest._swr_filter(a) == \
        "aresample=osr=18900:ocl=mono:filter_size=64:phase_shift=8"
    a = _FakeArgs(audio_channels=4)
    assert ingest._swr_filter(a).endswith(":och=4")


def test_probe_validation_messages(capsys):
    """Stream-count validation prints the reference's exact messages
    (decoding.c:168-200)."""
    import pytest

    probe = {"streams": [{"codec_type": "audio"},
                         {"codec_type": "audio"}]}
    with pytest.raises(ingest.OpenError):
        ingest._validate_probe_streams(
            probe, ingest.DECODER_USE_AUDIO)
    assert "Input file must have a single audio track" in \
        capsys.readouterr().err

    probe = {"streams": [{"codec_type": "audio"}]}
    with pytest.raises(ingest.OpenError):
        ingest._validate_probe_streams(
            probe, ingest.DECODER_USE_VIDEO | ingest.DECODER_VIDEO_REQUIRED)
    assert "Input file has no video data" in capsys.readouterr().err


def test_loop_point_priority_and_messages(capsys):
    """smpl -> loop_start tag -> first chapter (decoding.c:328-368)."""
    args = _FakeArgs()
    dec = ingest.Decoder()
    dec.has_audio = True
    dec.loop_point_ms = 250
    dec.loop_meta_ms = 500
    dec.n_chapters = 2
    dec.loop_chapter_ms = 750
    assert ingest.get_av_loop_point(dec, args) == 250
    assert "from smpl data): 250 ms" in capsys.readouterr().err
    dec.loop_point_ms = -1
    assert ingest.get_av_loop_point(dec, args) == 500
    assert "from metadata): 500 ms" in capsys.readouterr().err
    dec.loop_meta_ms = None
    assert ingest.get_av_loop_point(dec, args) == 750
    err = capsys.readouterr().err
    assert "Warning: input file has 2 chapters, using first one as " \
        "loop point" in err
    assert "from first chapter): 750 ms" in err
    dec.n_chapters = 0
    assert ingest.get_av_loop_point(dec, args) == -1


def test_probe_loop_tags_parsing():
    dec = ingest.Decoder()
    probe = {"format": {"tags": {"LOOP_START": "1500000"}},
             "chapters": [{"start": 90, "time_base": "1/30"}]}
    ingest._probe_loop_tags(dec, probe)
    assert dec.loop_meta_ms == 1500   # AV_TIME_BASE units -> ms
    assert dec.n_chapters == 1
    assert dec.loop_chapter_ms == 3000


def test_probe_loop_tag_negative_truncates_toward_zero():
    """C integer division truncates toward zero (decoding.c:347):
    strtoll("-1500001")*1000/AV_TIME_BASE = -1500, not Python's -1501."""
    dec = ingest.Decoder()
    ingest._probe_loop_tags(
        dec, {"format": {"tags": {"loop_start": "-1500001"}}})
    assert dec.loop_meta_ms == -1500


def test_wav_smpl_survives_swresample_options(tmp_path, monkeypatch):
    """-R reroutes WAV decode through the ffmpeg CLI but the smpl loop
    point must still be parsed (decoding.c:331-342)."""
    wav = write_wav(tmp_path / "l.wav", rand_pcm(4000, seed=2), 8000,
                    loop_start=2000)
    monkeypatch.setenv("PSXAVENC_NO_NATIVE_INGEST", "1")
    monkeypatch.setattr(ingest, "_ffprobe", lambda path: {
        "streams": [{"codec_type": "audio", "channels": 1}],
        "format": {}})
    monkeypatch.setattr(ingest, "_ffmpeg_audio",
                        lambda args, path: rand_pcm(
                            4000, seed=2).reshape(-1, 1))
    args = _FakeArgs(audio_frequency=8000,
                     swresample_options="filter_size=64")
    args.input_file = str(wav)
    dec = ingest.open_av_data(args, ingest.DECODER_USE_AUDIO)
    assert dec.has_audio
    assert dec.loop_point_ms == 250   # 2000 / 8000 Hz = 250 ms


def test_zero_frame_video_stream_opens(monkeypatch):
    """A present video stream that decodes zero frames opens successfully
    with an empty frame buffer (reference open_av_data succeeds; the
    muxer just encodes nothing), instead of raising."""
    monkeypatch.setenv("PSXAVENC_NO_NATIVE_INGEST", "1")
    monkeypatch.setattr(ingest, "_ffprobe", lambda path: {
        "streams": [{"codec_type": "video", "width": 320, "height": 240}],
        "format": {}})
    monkeypatch.setattr(ingest, "_ffmpeg_video",
                        lambda args, path, w, h: ([], 320, 240))
    args = _FakeArgs(video_width=320, video_height=240, flags=0)
    args.input_file = "whatever.mp4"
    dec = ingest.open_av_data(
        args, ingest.DECODER_USE_VIDEO | ingest.DECODER_VIDEO_REQUIRED)
    assert dec.has_video
    assert dec.video.shape == (0, 320 * 240 * 3 // 2)


def test_wav_smpl_loop_point(tmp_path):
    wav = write_wav(tmp_path / "l.wav", rand_pcm(4000, seed=1), 8000,
                    loop_start=2000)
    from psxavenc_tpu.io import wav as wavmod

    w = wavmod.read_wav(wav)
    assert w.loop_start_offset == 2000
    assert w.sample_rate == 8000

def test_help_text_byte_identical(capsys):
    """-h output (general and every -t scope) matches args.c:114-518
    byte for byte."""
    import subprocess

    import pytest

    from psxavenc_tpu import cli
    from psxavenc_tpu.utils.oracle import ORACLE, build_oracle

    oracle = ORACLE if build_oracle() is not None else None
    if oracle is None:
        from tests.conftest import golden_skip
        golden_skip("reference oracle unavailable")
    for fmt in (None, "xa", "xacd", "spu", "spui", "vag", "vagi", "str",
                "strcd", "strspu", "strv", "sbs"):
        args = ["-h"] + (["-t", fmt] if fmt else [])
        rc = cli.main(args)
        ours = capsys.readouterr().out
        r = subprocess.run([str(oracle)] + args, capture_output=True,
                           text=True)
        assert rc == 1 and r.returncode == 1, fmt
        assert ours == r.stdout, fmt
