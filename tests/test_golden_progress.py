"""Progress-line golden tests: the per-second "\\r..." counters and
encoding-speed lines (filefmt.c:199-208, 259-268, 364-374, 504-515,
648-658) byte-compared against the reference binary.

Wall-clock can't be compared directly, so both sides get a deterministic
clock that advances one second per reading: the reference via an
LD_PRELOAD time() shim (time_shim.c; get_elapsed_time is its only time()
caller), the rebuild via monkeypatching the progress module's clock. Each
sector/block write then prints exactly one line with t = 1, 2, 3, ... and
the full stderr must match byte-for-byte (banners included).
"""

import itertools
import pathlib
import re
import subprocess
import sys

import pytest

from psxavenc_tpu import cli
from psxavenc_tpu.native import ingest_ext
from psxavenc_tpu.utils import progress as progress_mod
from tests.conftest import (ORACLE, rand_frames, rand_pcm, write_avi_sized,
                            write_wav)

from tests.conftest import golden_skipif

pytestmark = golden_skipif(
    ingest_ext.load() is None,
    "native FFmpeg ingest extension unavailable")

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def time_shim(oracle, tmp_path_factory):
    out = tmp_path_factory.mktemp("shim") / "time_shim.so"
    r = subprocess.run(["gcc", "-O2", "-shared", "-fPIC",
                        str(GOLDEN / "time_shim.c"), "-o", str(out)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    return out


class _FakeClock:
    def __init__(self):
        self._it = itertools.count(1_000_000_000)

    def time(self):
        return next(self._it)


def _run_both(tmp_path, time_shim, enc_args, inp, ext, monkeypatch,
              capfd):
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "our").mkdir(exist_ok=True)
    r = subprocess.run(
        [str(ORACLE)] + [str(a) for a in enc_args]
        + [str(inp), str(tmp_path / "ref" / f"out.{ext}")],
        capture_output=True,
        env={"LD_PRELOAD": str(time_shim), "PATH": "/usr/bin:/bin"})
    assert r.returncode == 0, r.stderr

    monkeypatch.setattr(progress_mod, "time", _FakeClock())
    capfd.readouterr()
    rc = cli.main([str(a) for a in enc_args]
                  + [str(inp), str(tmp_path / "our" / f"out.{ext}")])
    err = capfd.readouterr().err
    assert rc == 0
    # Drop XLA runtime glog noise (e.g. stale-AOT-cache warnings on fd 2)
    # — environment chatter, not product stderr.
    err = re.sub(r"(?m)^[EWI]\d{4} .*\n", "", err)
    assert err.encode() == r.stderr, (
        f"stderr mismatch:\nREF:\n{r.stderr!r}\nOURS:\n{err!r}")


def test_progress_xa(tmp_path, oracle, time_shim, monkeypatch, capfd):
    wav = write_wav(tmp_path / "a.wav", rand_pcm(80_000, seed=3), 37800)
    _run_both(tmp_path, time_shim, ["-t", "xa", "-f", "37800", "-c", "1"],
              wav, "xa", monkeypatch, capfd)


def test_progress_spu(tmp_path, oracle, time_shim, monkeypatch, capfd):
    wav = write_wav(tmp_path / "a.wav", rand_pcm(8_000, seed=4), 44100)
    _run_both(tmp_path, time_shim, ["-t", "spu", "-f", "44100"], wav,
              "spu", monkeypatch, capfd)


def test_progress_spui(tmp_path, oracle, time_shim, monkeypatch, capfd):
    wav = write_wav(tmp_path / "a.wav",
                    rand_pcm(30_000, channels=2, seed=5), 44100, )
    _run_both(tmp_path, time_shim,
              ["-t", "spui", "-f", "44100", "-c", "2"], wav, "spui",
              monkeypatch, capfd)


def test_progress_str(tmp_path, oracle, time_shim, monkeypatch, capfd):
    frames = rand_frames(64, 48, 9, seed=6)
    pcm = rand_pcm(44100, channels=2, seed=7)
    avi = write_avi_sized(tmp_path / "v.avi", 64, 48, frames, 15,
                          audio=pcm)
    _run_both(tmp_path, time_shim,
              ["-t", "str", "-s", "64x48", "-f", "37800", "-c", "2"],
              avi, "str", monkeypatch, capfd)


def test_progress_sbs(tmp_path, oracle, time_shim, monkeypatch, capfd):
    frames = rand_frames(64, 48, 6, seed=8)
    avi = write_avi_sized(tmp_path / "v.avi", 64, 48, frames, 15)
    _run_both(tmp_path, time_shim,
              ["-t", "sbs", "-s", "64x48", "-a", "4096"], avi, "sbs",
              monkeypatch, capfd)
