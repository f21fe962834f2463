import os

# Tests run on a virtual 8-device CPU mesh: deterministic, fast to compile,
# and exercises the same sharding code paths the driver validates.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import subprocess

import numpy as np
import pytest

import jax

# This image pins jax_platforms to "axon,cpu" (the TPU tunnel) regardless of
# JAX_PLATFORMS; override it in-process or every test round-trips the TPU.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: golden tests jit many shapes; reruns should
# not pay tracing+compile again.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO = pathlib.Path(__file__).resolve().parent.parent
ORACLE = REPO / "build" / "psxavenc_ref"


def _build_oracle():
    """Compile the reference binary (golden oracle) if not present.

    Built from /root/reference with a shim forcing FF_DCT_INT so the FDCT is
    the deterministic C islow path (matching the reference's own CI builds,
    which compile FFmpeg with --disable-mmx).
    """
    if ORACLE.exists():
        return True
    ref = pathlib.Path("/root/reference")
    if not ref.exists():
        return False
    golden = REPO / "tests" / "golden"
    (REPO / "build").mkdir(exist_ok=True)
    pkg = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "libavformat", "libavcodec",
         "libavutil", "libswresample", "libswscale"],
        capture_output=True, text=True)
    if pkg.returncode != 0:
        return False
    cmd = (
        ["gcc", "-O2", "-std=c11", "-ffast-math",
         f"-I{ref}/libpsxav", f"-I{golden}",
         f"{ref}/libpsxav/adpcm.c", f"{ref}/libpsxav/cdrom.c",
         f"{golden}/dct_shim.c",
         "-include", f"{golden}/dct_shim.h"]
        + [f"{ref}/psxavenc/{f}" for f in
           ("main.c", "args.c", "decoding.c", "filefmt.c", "mdec.c")]
        + ["-o", str(ORACLE)] + pkg.stdout.split() + ["-lm"])
    return subprocess.run(cmd, capture_output=True).returncode == 0


@pytest.fixture(scope="session")
def oracle():
    """Path to the compiled reference binary, or skip if unbuildable."""
    if not _build_oracle():
        pytest.skip("reference oracle not available")
    return ORACLE


def run_oracle(args, cwd=None):
    assert ORACLE.exists()
    return subprocess.run([str(ORACLE)] + [str(a) for a in args],
                          capture_output=True, cwd=cwd)


def write_wav(path, samples, sample_rate, channels=1, loop_start=None,
              loop_end=None):
    """Write a PCM s16le WAV; optionally with a smpl forward-loop chunk."""
    import struct

    samples = np.asarray(samples, dtype="<i2")
    if channels > 1:
        assert samples.ndim == 2 and samples.shape[1] == channels
    data = samples.tobytes()
    chunks = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate,
        sample_rate * 2 * channels, 2 * channels, 16)
    if loop_start is not None:
        smpl = struct.pack("<9I", 0, 0, 1000000000 // sample_rate, 60, 0, 0,
                           0, 1, 0)
        smpl += struct.pack("<6I", 0, 0, loop_start,
                            loop_end if loop_end is not None else loop_start,
                            0, 0)
        chunks += b"smpl" + struct.pack("<I", len(smpl)) + smpl
    chunks += b"data" + struct.pack("<I", len(data)) + data
    riff = b"WAVE" + chunks
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    pathlib.Path(path).write_bytes(blob)
    return path


def rand_pcm(n, channels=1, seed=0, scale=22000):
    """Deterministic band-limited-ish random PCM exercising the encoder."""
    rng = np.random.default_rng(seed)
    shape = (n, channels) if channels > 1 else (n,)
    x = rng.standard_normal(shape)
    # Cumulative sum gives a low-frequency component, plus white noise and
    # occasional full-scale spikes to exercise shift/filter edges.
    y = np.cumsum(x, axis=0)
    y = y / (np.abs(y).max() + 1e-9)
    z = 0.7 * y + 0.25 * rng.standard_normal(shape) * 0.3
    spikes = rng.random(shape) < 0.001
    z = np.where(spikes, rng.choice([-1.0, 1.0], shape), z)
    return np.clip(z * scale, -32768, 32767).astype(np.int16)
