"""Native CD-ROM layer (EDC CRC32, sector init, checksums) validated
bit-exactly against the reference's own cdrom.c compiled as a shared lib
and driven on fully-initialized buffers (no UB)."""

import ctypes
import pathlib
import subprocess

import numpy as np
import pytest

from psxavenc_tpu import native

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def ref_cdrom():
    from psxavenc_tpu.utils.oracle import REFERENCE
    ref = REFERENCE / "libpsxav"
    if not ref.exists():
        from tests.conftest import golden_skip
        golden_skip("reference not available")
    out = REPO / "build" / "libref_cdrom.so"
    out.parent.mkdir(exist_ok=True)
    if not out.exists():
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", f"-I{ref}",
             str(ref / "cdrom.c"), "-o", str(out)],
            check=True, capture_output=True)
    lib = ctypes.CDLL(str(out))
    lib.psx_cdrom_init_sector.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_int]
    lib.psx_cdrom_calculate_checksums.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_int]
    return lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


@pytest.mark.parametrize("lba", [0, 1, 74, 75, 4499, 4500, 12345, 100000])
@pytest.mark.parametrize("stype", [0, 1, 2])
def test_sector_init(ref_cdrom, lba, stype):
    ours = np.zeros(2352, np.uint8)
    theirs = np.zeros(2352, np.uint8)
    native.sector_init(ours, lba, stype)
    ref_cdrom.psx_cdrom_init_sector(_ptr(theirs), lba, stype)
    assert np.array_equal(ours, theirs)


@pytest.mark.parametrize("stype", [1, 2])  # Mode1 path has a reference bug
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_checksums(ref_cdrom, stype, seed):
    rng = np.random.default_rng(seed)
    ours = rng.integers(0, 256, 2352).astype(np.uint8)
    theirs = ours.copy()
    native.calc_checksums(ours, stype)
    ref_cdrom.psx_cdrom_calculate_checksums(_ptr(theirs), stype)
    assert np.array_equal(ours, theirs)


def test_edc_known_vectors():
    # CRC of an empty buffer is 0; single zero byte stays 0 (poly is
    # only folded in on set bits).
    assert native.edc(b"") == 0
    assert native.edc(b"\x00" * 16) == 0
    # Cross-check the table-driven CRC against a bit-serial model.
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 333).astype(np.uint8).tobytes()
    edc = 0
    for byte in data:
        edc ^= byte
        for _ in range(8):
            edc = (edc >> 1) ^ (0xD8018001 * (edc & 1)) & 0xFFFFFFFF
            edc &= 0xFFFFFFFF
    assert native.edc(data) == edc
