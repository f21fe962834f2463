"""ctypes loader for the native host runtime (psxav_native.cpp).

The shared object is compiled on demand with g++ and cached next to the
source, keyed by a content hash — no pybind11 or setuptools needed.
"""

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "psxav_native.cpp"


def _build():
    src = _SRC.read_bytes()
    # -march=native vectorizes the integer hot loops (everything is
    # exact int math, so codegen can't change bytes); the .so is built
    # on first import on the machine that runs it, and the cache tag
    # covers the flags so flag changes rebuild. Falls back to the
    # portable baseline if the compiler rejects native (exotic hosts).
    flag_sets = [
        ["-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
         "-march=native"],
        ["-O3", "-std=c++17", "-shared", "-fPIC", "-pthread"],
    ]
    last_err = None
    for flags in flag_sets:
        tag = hashlib.sha256(src + " ".join(flags).encode()).hexdigest()[:16]
        out = _DIR / f"libpsxav_native_{tag}.so"
        if out.exists():
            return out
        with tempfile.TemporaryDirectory() as td:
            tmp = pathlib.Path(td) / out.name
            try:
                subprocess.run(["g++", *flags, str(_SRC), "-o", str(tmp)],
                               check=True, capture_output=True)
            except subprocess.CalledProcessError as e:  # try next set
                last_err = e
                continue
            os.replace(tmp, out)
        return out
    raise last_err


_lib = ctypes.CDLL(str(_build()))

_lib.psxn_edc.restype = ctypes.c_uint32
_lib.psxn_edc.argtypes = [ctypes.c_char_p, ctypes.c_long]
_lib.psxn_edc_batch.restype = None
_lib.psxn_edc_batch.argtypes = [ctypes.c_void_p] + [ctypes.c_long] * 5
_lib.psxn_sector_init.restype = None
_lib.psxn_sector_init.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_int]
_lib.psxn_calc_checksums.restype = None
_lib.psxn_calc_checksums.argtypes = [ctypes.c_void_p, ctypes.c_int]
_lib.psxn_xa_assemble.restype = None
_lib.psxn_xa_assemble.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
_lib.psxn_bs_pack.restype = ctypes.c_long
_lib.psxn_bs_pack.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_long, ctypes.c_void_p, ctypes.c_long]
_lib.psxn_adpcm_encode_units.restype = None
_lib.psxn_adpcm_encode_units.argtypes = [ctypes.c_void_p] * 7 + [
    ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_int]
_lib.psxn_bs_encode_frames.restype = None
_lib.psxn_bs_encode_frames.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_int,
    ctypes.c_int, ctypes.c_int, ctypes.c_long, ctypes.c_int,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_void_p]

SECTOR_MODE1 = 0
SECTOR_MODE2_FORM1 = 1
SECTOR_MODE2_FORM2 = 2


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.c_void_p)


def edc(data):
    data = bytes(data)
    return _lib.psxn_edc(data, len(data))


def edc_batch(sectors, crc_off, crc_len, edc_off):
    """In-place EDC for (n, stride) uint8 sector array."""
    assert sectors.dtype == np.uint8 and sectors.flags.c_contiguous
    n, stride = sectors.shape
    _lib.psxn_edc_batch(_ptr(sectors), n, stride, crc_off, crc_len, edc_off)


def sector_init(sector, lba, stype):
    assert sector.dtype == np.uint8 and sector.flags.c_contiguous
    _lib.psxn_sector_init(_ptr(sector), lba, stype)


def calc_checksums(sector, stype):
    assert sector.dtype == np.uint8 and sector.flags.c_contiguous
    _lib.psxn_calc_checksums(_ptr(sector), stype)


def xa_assemble(headers, nibbles, units_per_block, bits8):
    """(18, upb) headers + (18, upb, 28) nibbles -> 2304-byte payload."""
    headers = np.ascontiguousarray(headers, dtype=np.uint8)
    nibbles = np.ascontiguousarray(nibbles, dtype=np.uint8)
    payload = np.zeros(2304, dtype=np.uint8)
    _lib.psxn_xa_assemble(_ptr(payload), _ptr(headers), _ptr(nibbles),
                          units_per_block, int(bits8))
    return payload


def adpcm_encode_units(units, limits, prev1, prev2, filter_count,
                       shift_range):
    """Host ADPCM unit-stream encode (no-TPU fallback tier).

    Args mirror ops/adpcm.py::encode_units_scan: units (B, T, 28) int16,
    limits (B, T) int32, prev1/prev2 (B,) int32. Returns (headers (B, T)
    uint8, nibbles (B, T, 28) uint8, s1 (B, T) int32, s2 (B, T) int32)
    with per-unit post-states, bit-exact with the JAX kernels
    (tests/test_adpcm_kernel.py cross-checks)."""
    units = np.ascontiguousarray(units, dtype=np.int16)
    B, T, _ = units.shape
    limits = np.ascontiguousarray(
        np.clip(limits, -(1 << 30), 28), dtype=np.int32)
    state = np.ascontiguousarray(
        np.stack([np.asarray(prev1, np.int32),
                  np.asarray(prev2, np.int32)], axis=1))
    headers = np.zeros((B, T), np.uint8)
    nibbles = np.zeros((B, T, 28), np.uint8)
    s1 = np.zeros((B, T), np.int32)
    s2 = np.zeros((B, T), np.int32)
    _lib.psxn_adpcm_encode_units(
        _ptr(units), _ptr(limits), _ptr(state), _ptr(headers),
        _ptr(nibbles), _ptr(s1), _ptr(s2), B, T, filter_count,
        shift_range)
    return headers, nibbles, s1, s2


def bs_encode_frames(frames, budgets, *, codec, width, height,
                     capacity_words, n_threads=None, seeds=None):
    """Host BS video frame encoder (no-TPU fallback tier).

    Args/outputs mirror api.bs_encode_frames_packed: frames (B, w*h*3/2)
    uint8 NV21, budgets (B,) int32 byte budgets; returns a dict of numpy
    arrays {scale (B,), words (B, capacity_words) uint16, total_bits
    (B,), nz_count (B,)} — bit-identical to the device pipeline
    (tests/test_native_video.py cross-checks). scale 64 = unfittable
    (callers raise, mdec.c:723 parity). Frames fan out over host
    threads (the v3 DC chain is per-frame state, so frames stay
    independent).

    ``seeds``: optional (n_threads, 2) int32 in/out array carrying each
    worker's (answer-scale, walk-start) select seeds across calls, so a
    chunked caller starts every chunk warm. Seeds only steer the eval
    order; the selected scales and output bytes are seed-independent."""
    if width % 16 or height % 16 or width <= 0 or height <= 0:
        raise ValueError("frame geometry must be positive multiples of "
                         f"16, got {width}x{height}")
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    B = frames.shape[0]
    if frames.ndim != 2 or frames.shape[1] != width * height * 3 // 2:
        raise ValueError("frames must be (B, w*h*3/2) NV21 bytes")
    budgets = np.ascontiguousarray(budgets, dtype=np.int32)
    if budgets.shape != (B,):
        raise ValueError("budgets must be (B,)")
    words = np.zeros((B, capacity_words), np.uint16)
    scale = np.zeros(B, np.int32)
    total_bits = np.zeros(B, np.int32)
    nz = np.zeros(B, np.int32)
    if n_threads is None:
        n_threads = min(B, os.cpu_count() or 1)
    if seeds is not None and (
            seeds.dtype != np.int32 or not seeds.flags.c_contiguous
            or seeds.shape != (int(n_threads), 2)):
        raise ValueError("seeds must be a C-contiguous int32 array of "
                         f"shape ({int(n_threads)}, 2)")
    _lib.psxn_bs_encode_frames(
        _ptr(frames), _ptr(budgets), B, width, height, int(codec),
        capacity_words, int(n_threads), _ptr(words), _ptr(scale),
        _ptr(total_bits), _ptr(nz),
        _ptr(seeds) if seeds is not None else None)
    return {"scale": scale, "words": words, "total_bits": total_bits,
            "nz_count": nz}


def bs_pack(codes, lens, out_size):
    """Pack a BS symbol stream; returns (bytes_used, buffer) or (-1, None)
    when the frame exceeds out_size."""
    codes = np.ascontiguousarray(codes, dtype=np.uint32)
    lens = np.ascontiguousarray(lens, dtype=np.uint8)
    out = np.zeros(out_size, dtype=np.uint8)
    used = _lib.psxn_bs_pack(_ptr(codes), _ptr(lens), len(codes), _ptr(out),
                             out_size)
    if used < 0:
        return -1, None
    return used, out
