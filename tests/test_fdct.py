"""FDCT vs libavcodec AVDCT(FF_DCT_INT) golden vectors."""

import pathlib
import subprocess

import numpy as np
import pytest

import jax

from psxavenc_tpu.ops import fdct

REPO = pathlib.Path(__file__).resolve().parent.parent
VEC = REPO / "build" / "fdct_vectors.bin"


@pytest.fixture(scope="session")
def vectors():
    if not VEC.exists():
        src = REPO / "tests" / "golden" / "fdct_vectors.c"
        exe = REPO / "build" / "fdct_vectors"
        pkg = subprocess.run(["pkg-config", "--cflags", "--libs",
                              "libavcodec", "libavutil"],
                             capture_output=True, text=True)
        if pkg.returncode != 0:
            from tests.conftest import golden_skip
            golden_skip("libavcodec not available")
        subprocess.run(["gcc", "-O2", str(src), "-o", str(exe)]
                       + pkg.stdout.split(), check=True, cwd=REPO / "build")
        subprocess.run([str(exe), "512", "42"], check=True,
                       cwd=REPO / "build")
    raw = np.fromfile(VEC, dtype="<i2").reshape(-1, 2, 8, 8)
    return raw[:, 0].astype(np.int32), raw[:, 1].astype(np.int32)


def test_fdct_bit_exact(vectors):
    blocks, expected = vectors
    got = np.asarray(jax.jit(fdct.fdct_islow)(blocks))
    mism = np.nonzero((got != expected).any(axis=(1, 2)))[0]
    assert mism.size == 0, f"first mismatching block: {mism[:5]}"


def test_fdct_dc_scale():
    # DC term equals the plain sum of samples (JPEG DCT x8 convention).
    rng = np.random.default_rng(0)
    b = rng.integers(-128, 128, (16, 8, 8)).astype(np.int32)
    out = np.asarray(fdct.fdct_islow(b))
    assert np.array_equal(out[:, 0, 0], b.sum(axis=(1, 2)))


def test_fdct_rows_matches_islow():
    """The unstacked row form (the one the fused Pallas kernels inline)
    is bit-identical to fdct_islow, including int16 pass-1 wrap on
    out-of-range inputs."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    b = rng.integers(-2000, 2000, (32, 8, 8)).astype(np.int32)
    want = np.asarray(fdct.fdct_islow(b))
    rows = [jnp.asarray(b[:, i // 8, i % 8]) for i in range(64)]
    out = fdct.fdct_rows(rows)
    got = np.stack([np.asarray(out[8 * u + v]) for u in range(8)
                    for v in range(8)], axis=1).reshape(-1, 8, 8)
    assert np.array_equal(got, want)
