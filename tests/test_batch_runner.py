"""Batch job runner: many encodes in one process, outputs identical to
individual CLI invocations."""

import numpy as np

from psxavenc_tpu import batch, cli
from tests.conftest import rand_frames, rand_pcm, write_avi_sized, write_wav


def test_batch_jobs_match_cli(tmp_path):
    wav = write_wav(tmp_path / "a.wav", rand_pcm(30000, seed=1), 44100)
    avi = write_avi_sized(tmp_path / "v.avi", 64, 64,
                          rand_frames(64, 64, 3, seed=2), 15)
    jobs = tmp_path / "jobs.txt"
    jobs.write_text(
        f"# comment line\n"
        f"-q -t vag -f 44100 {wav} {tmp_path}/a_batch.vag\n"
        f"\n"
        f"-q -t sbs -v v2 -s 64x64 -a 8192 {avi} {tmp_path}/v_batch.sbs\n")
    rc = batch.main([str(jobs)])
    assert rc == 0

    assert cli.main(["-q", "-t", "vag", "-f", "44100", str(wav),
                     str(tmp_path / "a_cli.vag")]) == 0
    assert cli.main(["-q", "-t", "sbs", "-v", "v2", "-s", "64x64", "-a",
                     "8192", str(avi), str(tmp_path / "v_cli.sbs")]) == 0
    # .vag headers embed the output basename; mask bytes 0x20-0x2F.
    a = bytearray((tmp_path / "a_batch.vag").read_bytes())
    b = bytearray((tmp_path / "a_cli.vag").read_bytes())
    a[0x20:0x30] = b[0x20:0x30] = b"\0" * 16
    assert a == b
    assert (tmp_path / "v_batch.sbs").read_bytes() == \
        (tmp_path / "v_cli.sbs").read_bytes()


def test_batch_reports_failures(tmp_path, capsys):
    jobs = tmp_path / "jobs.txt"
    jobs.write_text(f"-q -t vag /nonexistent.wav {tmp_path}/x.vag\n")
    rc = batch.main([str(jobs)])
    assert rc == 1
    assert "FAILED" in capsys.readouterr().err
