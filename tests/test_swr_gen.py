"""The swresample filter-bank GENERATOR (io/swr_gen.py) reproduces the
library-probed banks exactly, so the ffmpeg-free fallback is bit-exact
for arbitrary ratios, not just the 41 shipped ones
(/root/reference/psxavenc/decoding.c:237-255 is the behavior source)."""

import numpy as np
import pytest

from psxavenc_tpu.io import swr_exact, swr_gen


def _shipped_keys():
    swr_exact._load()
    return sorted(swr_exact._banks)


@pytest.mark.parametrize("ratio", _shipped_keys(),
                         ids=lambda r: f"{r[0]}->{r[1]}")
def test_generated_bank_matches_probed(ratio):
    """For every shipped (library-probed, library-verified) bank, the
    from-scratch generator produces byte-identical resampler output on
    random PCM — transient (reflect-padded start), steady state, and
    the no-flush output-length rule."""
    src, dst = ratio
    stored = swr_exact._bank_for(src, dst)
    gen = swr_gen.generate_bank(src, dst)
    rng = np.random.default_rng(src % 997 + dst % 991)
    x = rng.integers(-32768, 32768, (9000, 2)).astype(np.int64)
    y_ref = swr_exact.apply_bank(x, *stored)
    y_gen = swr_exact.apply_bank(x, *gen)
    assert y_ref.shape == y_gen.shape
    assert np.array_equal(y_ref, y_gen)


def test_generated_meta_matches_probed():
    """W/L/M/D layout params agree with every probed calibration."""
    for (src, dst) in _shipped_keys():
        _, _, W, L, M, D = swr_exact._bank_for(src, dst)
        _, _, gW, gL, gM, gD = swr_gen.generate_bank(src, dst)
        assert (gL, gM, gD) == (L, M, D), (src, dst)


def test_bessel_series_matches_scipy():
    """The self-contained I0 series is tap-grade identical to scipy's
    (the generator must not depend on scipy)."""
    scipy_special = pytest.importorskip("scipy.special")
    x = np.linspace(0.0, 9.0, 20001)
    ours = swr_gen._i0(x)
    ref = scipy_special.i0(x)
    assert np.max(np.abs(ours / ref - 1.0)) < 1e-7


def test_arbitrary_ratio_against_library():
    """Cross-check a ratio OUTSIDE the shipped set against the real
    libswresample (needs the native ingest extension; skipped without
    it). 48000->16000 and 8000->48000 sit in the library's
    exact-rational regime where the generator is bit-exact."""
    import pathlib
    import tempfile

    from psxavenc_tpu.native import ingest_ext
    from psxavenc_tpu.utils.synth import write_wav

    if ingest_ext.load() is None:
        pytest.skip("native ingest extension unavailable")
    td = pathlib.Path(tempfile.mkdtemp())
    rng = np.random.default_rng(12)
    for src, dst in ((48000, 16000), (8000, 48000), (29400, 18900)):
        assert (src, dst) not in swr_exact._banks
        pcm = rng.integers(-32768, 32768, 12000).astype(np.int16)
        p = td / "p.wav"
        write_wav(p, pcm, src)
        r = ingest_ext.ingest(str(p), flags=1, audio_frequency=dst,
                              audio_channels=1, video_width=320,
                              video_height=240, ignore_aspect=1,
                              fps_num=15, fps_den=1, quiet=1)
        y_lib = r["audio"].astype(np.int64)
        bank = swr_gen.generate_bank(src, dst)
        y_gen = swr_exact.apply_bank(pcm.astype(np.int64)[:, None],
                                     *bank)[:, 0]
        assert len(y_lib) == len(y_gen), (src, dst)
        assert np.array_equal(y_lib, y_gen), (src, dst)
