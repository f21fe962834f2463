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

import pytest

import jax

# This image pins jax_platforms to "axon,cpu" (the TPU tunnel) regardless of
# JAX_PLATFORMS; override it in-process or every test round-trips the TPU.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: golden tests jit many shapes; reruns should
# not pay tracing+compile again.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from psxavenc_tpu.utils.oracle import ORACLE, build_oracle  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent

# CI hard-fail mode: environments that install the golden prerequisites
# (reference checkout + FFmpeg dev libs) set PSXAVENC_REQUIRE_ORACLE=1 so
# a regression in oracle/libav availability FAILS instead of silently
# skipping the golden checks.
REQUIRE_ORACLE = os.environ.get("PSXAVENC_REQUIRE_ORACLE") == "1"


def golden_skip(reason):
    """Skip for a missing golden prerequisite — or hard-fail under
    PSXAVENC_REQUIRE_ORACLE=1."""
    if REQUIRE_ORACLE:
        pytest.fail(f"PSXAVENC_REQUIRE_ORACLE=1 but {reason}")
    pytest.skip(reason)


def golden_skipif(missing, reason):
    """Module-level mark: skip when a prerequisite is missing, unless
    hard-fail mode is on (then the tests run and fail on the missing
    dependency instead of skipping)."""
    return pytest.mark.skipif(missing and not REQUIRE_ORACLE,
                              reason=reason)


@pytest.fixture(scope="session")
def oracle():
    """Path to the compiled reference binary, or skip if unbuildable."""
    if build_oracle() is None:
        golden_skip("reference oracle not available")
    return ORACLE


def run_oracle(args, cwd=None):
    assert ORACLE.exists()
    return subprocess.run([str(ORACLE)] + [str(a) for a in args],
                          capture_output=True, cwd=cwd)


from psxavenc_tpu.utils.synth import (  # noqa: F401,E402
    rand_frames, rand_pcm, write_avi_sized, write_wav)
