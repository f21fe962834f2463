"""Golden byte-diff tests for the XA-ADPCM formats (xa/xacd).

The reference leaves some sector bytes uninitialized (stack garbage) and
its EDC covers them, so those bytes differ run-to-run even between two
invocations of the reference itself:

- .xa (2336): the coding byte is OR-ed into an uninitialized buffer
  (adpcm.c:277-288 on a never-cleared stack array, filefmt.c:183), and the
  20-byte gap between the 18 ADPCM blocks and the EDC ([0x908+8, 0x91C)) is
  never written. The EDC at [0x91C, 0x920) covers both.
- .xacd (2352): subheaders are cleanly zeroed by psx_cdrom_init_sector, but
  the same data gap ([0x918, 0x92C)) is garbage and feeds the EDC at 0x92C.

We emit spec-clean zeros there; the diffs mask exactly those bytes. The EDC
algorithm itself is validated bit-exactly in test_cdrom.py against the
reference's own compiled cdrom.c.
"""

import pytest

from psxavenc_tpu import cli
from tests.conftest import rand_pcm, run_oracle, write_wav

XA_MASK = ("xa", 2336, [3, 7] + list(range(2312, 2336)))
XACD_MASK = ("xacd", 2352, list(range(2328, 2352)))


def _mask_for(fmt, bits):
    _, ssize, mask = XA_MASK if fmt == "xa" else XACD_MASK
    if bits == 8:
        # 8-bit blocks only assign data[0..3]; bytes [8..16) of every
        # 128-byte block keep stack garbage which memcpy(+12,+8,4)
        # duplicates (adpcm.c:221-231,321-322). Mask them.
        payload = 8 if fmt == "xa" else 24
        mask = list(mask)
        for b in range(18):
            mask += list(range(payload + b * 128 + 8, payload + b * 128 + 16))
    return ssize, mask


def _normalize(blob, sector_size, mask_offsets):
    arr = bytearray(blob)
    for base in range(0, len(arr), sector_size):
        for off in mask_offsets:
            arr[base + off] = 0
    return bytes(arr)


def _encode_both(tmp_path, wav_args, enc_args):
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "our").mkdir(exist_ok=True)
    wav = write_wav(tmp_path / "in.wav", *wav_args[:-1], **wav_args[-1])
    ref_out = tmp_path / "ref" / "out.xa"
    our_out = tmp_path / "our" / "out.xa"
    r = run_oracle(["-q"] + enc_args + [wav, ref_out])
    assert r.returncode == 0, r.stderr
    rc = cli.main(["-q"] + [str(a) for a in enc_args] + [str(wav),
                                                         str(our_out)])
    assert rc == 0
    return ref_out.read_bytes(), our_out.read_bytes()


@pytest.mark.parametrize("fmt,freq,chans,bits,n", [
    ("xa", 37800, 2, 4, 37800),        # 1s stereo, default config
    ("xa", 37800, 1, 4, 20000),        # mono, partial last sector
    ("xa", 18900, 2, 4, 18900),        # single rate
    ("xa", 37800, 2, 8, 30000),        # 8-bit
    ("xa", 37800, 1, 8, 12345),        # 8-bit mono partial
    ("xacd", 37800, 2, 4, 37800),      # 2352-byte sectors with EDC
    ("xacd", 18900, 1, 8, 9999),
])
def test_xa_golden(tmp_path, oracle, fmt, freq, chans, bits, n):
    pcm = rand_pcm(n, channels=chans, seed=n + chans)
    ref, ours = _encode_both(
        tmp_path, (pcm, freq, {"channels": chans}),
        ["-t", fmt, "-f", freq, "-c", chans, "-b", bits])
    assert len(ref) == len(ours)
    ssize, mask = _mask_for(fmt, bits)
    assert _normalize(ref, ssize, mask) == _normalize(ours, ssize, mask)
    # Our clean output must still carry the EOF flag on the last sector.
    sub = 0 if fmt == "xa" else 16
    last = len(ours) - ssize
    assert ours[last + sub + 2] & 0x80
    assert ref[last + sub + 2] & 0x80


def test_xa_file_channel_numbers(tmp_path, oracle):
    pcm = rand_pcm(37800, channels=2, seed=3)
    ref, ours = _encode_both(
        tmp_path, (pcm, 37800, {"channels": 2}),
        ["-t", "xacd", "-F", "7", "-C", "3"])
    ssize, mask = _mask_for("xacd", 4)
    assert _normalize(ref, ssize, mask) == _normalize(ours, ssize, mask)
    assert ours[16] == 7 and ours[17] == 3
