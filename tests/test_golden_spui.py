"""Golden byte-diff tests for interleaved SPU-ADPCM (spui/vagi)."""

import pytest

from psxavenc_tpu import cli
from tests.conftest import rand_pcm, run_oracle, write_wav


def _encode_both(tmp_path, pcm, rate, channels, enc_args, loop=None):
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "our").mkdir(exist_ok=True)
    kw = {"channels": channels}
    if loop is not None:
        kw["loop_start"] = loop
    wav = write_wav(tmp_path / "in.wav", pcm, rate, **kw)
    ref_out = tmp_path / "ref" / "out.vag"
    our_out = tmp_path / "our" / "out.vag"
    r = run_oracle(["-q"] + enc_args + [wav, ref_out])
    assert r.returncode == 0, r.stderr
    rc = cli.main(["-q"] + [str(a) for a in enc_args] + [str(wav),
                                                         str(our_out)])
    assert rc == 0
    return ref_out.read_bytes(), our_out.read_bytes()


@pytest.mark.parametrize("fmt,ch,n,extra,loop", [
    ("spui", 2, 44100, [], None),
    ("spui", 2, 44100, ["-D"], None),
    ("spui", 1, 30000, ["-i", "1024"], None),
    ("spui", 4, 20000, ["-i", "512", "-a", "512"], None),
    ("vagi", 2, 44100, [], None),
    ("vagi", 4, 44100, ["-i", "2048", "-L"], None),
    ("vagi", 2, 44100, [], 11025),       # smpl loop -> header loop point
    ("vagi", 2, 33333, ["-l", "100"], None),
    ("vagi", 2, 4000, [], None),         # shorter than one chunk
])
def test_spui_golden(tmp_path, oracle, fmt, ch, n, extra, loop):
    pcm = rand_pcm(n, channels=ch, seed=n + ch)
    ref, ours = _encode_both(tmp_path, pcm, 44100, ch,
                             ["-t", fmt] + extra, loop)
    assert len(ref) == len(ours)
    assert ref == ours
