"""Byte-for-byte golden tests: our encoder vs the compiled reference binary
for the SPU-ADPCM formats (spu/vag)."""

import pytest

from psxavenc_tpu import cli
from tests.conftest import rand_pcm, run_oracle, write_wav


def _encode_both(tmp_path, oracle, wav_args, enc_args, name="out"):
    # Same basename in both runs: .vag headers embed the output filename
    # (filefmt.c:152-161).
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "our").mkdir(exist_ok=True)
    ref_out = tmp_path / "ref" / f"{name}.bin"
    our_out = tmp_path / "our" / f"{name}.bin"
    wav = write_wav(tmp_path / f"{name}.wav", *wav_args[:-1], **wav_args[-1])
    r = run_oracle(["-q"] + enc_args + [wav, ref_out])
    assert r.returncode == 0, r.stderr
    rc = cli.main(["-q"] + [str(a) for a in enc_args] + [str(wav),
                                                         str(our_out)])
    assert rc == 0
    return ref_out.read_bytes(), our_out.read_bytes()


@pytest.mark.parametrize("n,extra", [
    (44100, []),
    (44100, ["-D"]),
    (28 * 100, ["-a", "2048"]),          # exact multiple of a block
    (12345, ["-f", "44100"]),            # partial trailing block
    (20, []),                            # shorter than one block
    (44100, ["-L"]),                     # loop end flag, no loop point
    (44100, ["-l", "500"]),              # explicit loop point
    (44100, ["-n"]),                     # looping disabled
])
def test_spu_golden(tmp_path, oracle, n, extra):
    pcm = rand_pcm(n, seed=n)
    ref, ours = _encode_both(
        tmp_path, oracle, (pcm, 44100, {}), ["-t", "spu"] + extra)
    assert ref == ours


@pytest.mark.parametrize("n,rate,extra,loop", [
    (44100, 44100, [], None),
    (44100, 44100, [], 22050),           # smpl loop chunk in the wav
    (30000, 18900, ["-f", "18900"], 1000),
    (44100, 44100, ["-l", "250"], 9999),  # CLI override beats smpl
])
def test_vag_golden(tmp_path, oracle, n, rate, extra, loop):
    pcm = rand_pcm(n, seed=n + 7)
    kw = {"loop_start": loop} if loop is not None else {}
    ref, ours = _encode_both(
        tmp_path, oracle, (pcm, rate, kw), ["-t", "vag"] + extra)
    assert ref == ours


def test_spu_golden_xla_tier(tmp_path, oracle, monkeypatch):
    """The XLA scan wrapper (encode_prepared_units' bucket padding,
    output slicing, state recovery) is the LAST-resort tier once the
    native encoder exists; keep it golden-covered end-to-end by forcing
    it with PSXAVENC_NO_NATIVE_ADPCM."""
    monkeypatch.setenv("PSXAVENC_NO_NATIVE_ADPCM", "1")
    pcm = rand_pcm(12345, seed=77)
    ref, ours = _encode_both(
        tmp_path, oracle, (pcm, 44100, {}), ["-t", "spu"], name="xlat")
    assert ref == ours


def test_vag_golden_xla_tier(tmp_path, oracle, monkeypatch):
    monkeypatch.setenv("PSXAVENC_NO_NATIVE_ADPCM", "1")
    pcm = rand_pcm(30011, seed=78)
    ref, ours = _encode_both(
        tmp_path, oracle, (pcm, 44100, {"loop_start": 5000}),
        ["-t", "vag"], name="xlat")
    assert ref == ours
