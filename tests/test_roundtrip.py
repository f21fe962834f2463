"""Round-trip property tests: decode our encoder's output and check the
reconstruction against the source (SURVEY §4.3 — the reference validated
out-of-band against third-party decoders; these are the in-repo analog)."""

import numpy as np

from psxavenc_tpu import cli
from tests.conftest import (rand_frames, rand_pcm, write_avi_sized,
                            write_wav)
from tests.refmodel import decoders


def _snr(ref, got):
    ref = ref.astype(np.float64)
    got = got.astype(np.float64)
    noise = ((ref - got) ** 2).mean()
    if noise == 0:
        return np.inf
    return 10 * np.log10((ref ** 2).mean() / noise)


def test_spu_roundtrip_snr(tmp_path):
    n = 28 * 300
    pcm = rand_pcm(n, seed=42, scale=18000)
    wav = write_wav(tmp_path / "in.wav", pcm, 44100)
    out = tmp_path / "out.spu"
    assert cli.main(["-q", "-t", "spu", "-D", "-n", str(wav),
                     str(out)]) == 0
    data = out.read_bytes()
    # -n appends a trailing trap block; drop it before decoding.
    decoded = decoders.spu_decode(data[:n // 28 * 16])
    assert len(decoded) == n
    snr = _snr(pcm, decoded)
    assert snr > 25, snr


def test_xa_roundtrip_snr(tmp_path):
    n = 112 * 18 * 3  # 3 sectors stereo
    pcm = rand_pcm(n, channels=2, seed=9, scale=15000)
    wav = write_wav(tmp_path / "in.wav", pcm, 37800, channels=2)
    out = tmp_path / "out.xa"
    assert cli.main(["-q", "-t", "xa", str(wav), str(out)]) == 0
    data = out.read_bytes()
    state = {0: [0, 0], 1: [0, 0]}
    left, right = [], []
    for s in range(len(data) // 2336):
        payload = data[s * 2336 + 8:s * 2336 + 8 + 2304]
        for b in range(18):
            chans = decoders.xa_block_decode(
                payload[b * 128:(b + 1) * 128], True, False, state)
            left += chans[0]
            right += chans[1]
    left = np.array(left[:n], np.int16)
    right = np.array(right[:n], np.int16)
    assert _snr(pcm[:, 0], left[:len(pcm)]) > 20
    assert _snr(pcm[:, 1], right[:len(pcm)]) > 20


def test_bs_roundtrip_psnr(tmp_path):
    w = h = 64
    frames = rand_frames(w, h, 2, seed=12)
    avi = write_avi_sized(tmp_path / "in.avi", w, h, frames, 15)
    out = tmp_path / "out.sbs"
    assert cli.main(["-q", "-t", "sbs", "-s", f"{w}x{h}", "-a", "8192",
                     str(avi), str(out)]) == 0
    data = out.read_bytes()
    frame0 = data[:8192]
    y, cb, cr = decoders.bs_decode_frame(frame0, w, h)
    src_y = frames[0][0].reshape(h, w).astype(np.float64)
    psnr = _snr(src_y - src_y.mean(), y - y.mean())
    # Header invariants (mdec.c:725-755).
    assert frame0[3] == 0x38 and frame0[6] == 0x02 and frame0[7] == 0
    scale = frame0[4] | (frame0[5] << 8)
    assert 1 <= scale <= 63
    blocks_used = frame0[0] | (frame0[1] << 8)
    assert blocks_used % 32 == 0  # rounded to 64 halfwords -> 32 words
    assert psnr > 22, psnr


def test_bs_v3_roundtrip_psnr(tmp_path):
    w = h = 64
    frames = rand_frames(w, h, 1, seed=13)
    avi = write_avi_sized(tmp_path / "in.avi", w, h, frames, 15)
    out = tmp_path / "out.sbs"
    assert cli.main(["-q", "-t", "sbs", "-v", "v3", "-s", f"{w}x{h}",
                     "-a", "8192", str(avi), str(out)]) == 0
    frame0 = out.read_bytes()[:8192]
    assert frame0[6] == 0x03
    y, cb, cr = decoders.bs_decode_frame(frame0, w, h)
    src_y = frames[0][0].reshape(h, w).astype(np.float64)
    psnr = _snr(src_y - src_y.mean(), y - y.mean())
    assert psnr > 22, psnr