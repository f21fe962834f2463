"""CLI error-path parity: bad invocations produce the reference's exit
code and stderr detail (args.c error texts, main.c exit paths)."""

import subprocess

import pytest

from psxavenc_tpu import cli
from psxavenc_tpu.utils.oracle import ORACLE, build_oracle
from tests.conftest import rand_pcm, write_wav


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("clierr")
    return str(write_wav(d / "in.wav", rand_pcm(8000, seed=1), 44100))


BAD_ARGS = [
    [],                                            # no arguments
    ["-t"],                                        # -t without value
    ["-t", "nosuchformat"],                        # unknown format
    ["-v", "v2", "-t", "sbs"],                     # format opt before -t
    ["-Z", "-t", "spu"],                           # unknown general opt
    ["-t", "xa", "-f", "12345"],                   # invalid xa rate
    ["-t", "xa", "-c", "3"],                       # invalid xa channels
    ["-t", "xa", "-b", "6"],                       # invalid xa bit depth
    ["-t", "xa", "-F", "999"],                     # file number range
    ["-t", "xa", "-C", "77"],                      # channel number range
    ["-t", "sbs", "-v", "v9"],                     # unknown codec
    ["-t", "sbs", "-s", "10x10"],                  # size out of range
    ["-t", "sbs", "-s", "320"],                    # malformed size
    ["-t", "str", "-r", "0"],                      # fps out of range
    ["-t", "str", "-r", "15/0"],                   # zero denominator
    ["-t", "str", "-x", "3"],                      # bad cd speed
    ["-t", "str", "-T", "70000"],                  # id out of range
    ["-t", "spu", "-l", "abc"],                    # non-numeric ms
    ["-t", "sbs", "-a", "100"],                    # sbs alignment < 256
]


@pytest.mark.parametrize("args", BAD_ARGS, ids=[" ".join(a) or "(empty)"
                                                for a in BAD_ARGS])
def test_bad_invocations_match_reference(args, wav_file, tmp_path,
                                         capsys, oracle):
    full = args + [wav_file, str(tmp_path / "out.bin")]
    rc = cli.main(full)
    ours_err = capsys.readouterr().err
    r = subprocess.run([str(ORACLE)] + full, capture_output=True,
                       text=True)
    assert rc == r.returncode, (ours_err, r.stderr)
    # The reference's last stderr line is the specific complaint; ours
    # must carry the same text (banners/usage may differ in position).
    ref_detail = [ln for ln in r.stderr.strip().splitlines() if ln]
    if rc != 0 and ref_detail:
        assert ref_detail[-1] in ours_err, (ref_detail[-1], ours_err)


def test_missing_input_matches_reference(tmp_path, capsys, oracle):
    full = ["-t", "spu", "/nonexistent/in.wav", str(tmp_path / "o.spu")]
    rc = cli.main(full)
    ours_err = capsys.readouterr().err
    r = subprocess.run([str(ORACLE)] + full, capture_output=True,
                       text=True)
    assert rc == r.returncode == 1
    assert "Failed to open input file" in ours_err
    assert "Failed to open input file" in r.stderr


@pytest.mark.parametrize("args,ext", [
    (["-t", "vag", "-f", "44100"], "vag"),
    (["-t", "xa", "-f", "37800", "-c", "2", "-b", "4"], "xa"),
    (["-t", "spui", "-c", "2", "-i", "100"], "spui"),  # -i rounds to x16
])
def test_banners_match_reference(args, ext, wav_file, tmp_path, capfd,
                                 oracle):
    """Non-quiet stderr (format banners, warnings, Done.) is identical
    for fast encodes (the 1-second progress throttle emits nothing).
    capfd (not capsys): the native ingest extension prints its warnings
    straight to fd 2, like the reference."""
    ours_out = tmp_path / f"o.{ext}"
    rc = cli.main(args + [wav_file, str(ours_out)])
    ours_err = capfd.readouterr().err
    ref_out = tmp_path / f"r.{ext}"
    r = subprocess.run([str(ORACLE)] + args + [wav_file, str(ref_out)],
                       capture_output=True, text=True)
    assert rc == r.returncode == 0
    # Strip progress lines (timing-dependent \r-prefixed counters) and
    # glog noise from the XLA CPU runtime (fd-2 capture sees it).
    strip = lambda s: "\n".join(
        ln for ln in s.splitlines() if not ln.startswith("\r")
        and "Encoding speed" not in ln
        and not (len(ln) > 1 and ln[0] in "EWIF" and ln[1].isdigit()))
    assert strip(ours_err) == strip(r.stderr), (ours_err, r.stderr)
