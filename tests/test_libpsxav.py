"""libpsxav-equivalent API surface vs the scalar model / oracle formats."""

import numpy as np

from psxavenc_tpu import libpsxav as lp
from tests.conftest import rand_pcm
from tests.refmodel import adpcm as refm


def test_sizing_helpers():
    s = lp.XaSettings(stereo=True, bits_per_sample=4, frequency=37800)
    assert lp.xa_get_samples_per_sector(s) == 112 * 18
    assert lp.xa_get_buffer_size_per_sector(s) == 2336
    assert lp.xa_get_sector_interleave(s) == 4
    s8 = lp.XaSettings(stereo=False, bits_per_sample=8, frequency=18900,
                       format=lp.XA_FORMAT_XACD)
    assert lp.xa_get_samples_per_sector(s8) == 112 * 18
    assert lp.xa_get_buffer_size_per_sector(s8) == 2352
    assert lp.xa_get_sector_interleave(s8) == 8
    assert lp.spu_get_buffer_size(28) == 16
    assert lp.spu_get_buffer_size(29) == 32
    assert lp.xa_get_buffer_size(s, 112 * 18 + 1) == 2 * 2336


def test_spu_encode_matches_model():
    pcm = rand_pcm(28 * 9 + 5, seed=11)
    state = lp.ChannelState()
    got = lp.spu_encode(state, pcm)
    mstate = refm.ChannelState()
    want = refm.spu_encode(mstate, [int(v) for v in pcm], len(pcm))
    assert got == want
    assert (state.prev1, state.prev2) == (mstate.prev1, mstate.prev2)


def test_spu_encode_simple_loop_flags():
    pcm = rand_pcm(28 * 4, seed=3)
    out = lp.spu_encode_simple(pcm, loop_start=28)
    assert len(out) == 4 * 16
    assert out[16 + 1] & lp.SPU_LOOP_START
    assert out[-16 + 1] & lp.SPU_LOOP_REPEAT
    out2 = lp.spu_encode_simple(pcm, loop_start=-1)
    assert len(out2) == 5 * 16  # trailing trap block
    assert out2[-16 + 1] == lp.SPU_LOOP_TRAP


def test_xa_encode_simple_roundtrip_shape():
    s = lp.XaSettings(stereo=True, bits_per_sample=4, frequency=37800)
    n = 112 * 18  # exactly one sector per channel
    pcm = rand_pcm(n, channels=2, seed=5).reshape(-1)
    out = lp.xa_encode_simple(s, pcm, n)
    assert len(out) == 2336
    # EOF submode set by finalize on both subheader copies.
    assert out[2] & 0x80 and out[6] & 0x80
    # Matches the scalar model's first block body.
    stl, strr = refm.ChannelState(), refm.ChannelState()
    blk = refm.encode_block_xa([int(v) for v in pcm], 112, True, False,
                               stl, strr)
    assert out[8:8 + 128] == blk


def test_cdrom_wrappers():
    sec = np.zeros(2352, np.uint8)
    lp.cdrom_init_sector(sec, 0, lp.SECTOR_TYPE_MODE2_FORM2)
    assert sec[15] == 2 and sec[12] == 0 and sec[13] == 2
    sub = lp.cdrom_init_xa_subheader(lp.SECTOR_TYPE_MODE2_FORM2)
    assert sub[2] == 0x28 and sub[6] == 0x28
    lp.cdrom_calculate_checksums(sec, lp.SECTOR_TYPE_MODE2_FORM2)
    assert sec[0x92C:0x930].any()