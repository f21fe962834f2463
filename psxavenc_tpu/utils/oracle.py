"""Builder for the reference binary (golden-test oracle / benchmark
baseline). Compiles /root/reference with a shim forcing FF_DCT_INT so the
FDCT is the deterministic C islow path (matching the reference's own CI
builds, which disable x86 SIMD)."""

import os
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parent.parent.parent
ORACLE = REPO / "build" / "psxavenc_ref"
# Overridable so CI can point at its own checkout of the upstream repo.
REFERENCE = pathlib.Path(
    os.environ.get("PSXAVENC_REFERENCE", "/root/reference"))


def build_oracle():
    """Returns the oracle path, or None if it cannot be built."""
    if ORACLE.exists():
        return ORACLE
    if not REFERENCE.exists():
        return None
    golden = REPO / "tests" / "golden"
    (REPO / "build").mkdir(exist_ok=True)
    pkg = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "libavformat", "libavcodec",
         "libavutil", "libswresample", "libswscale"],
        capture_output=True, text=True)
    if pkg.returncode != 0:
        return None
    cmd = (
        ["gcc", "-O2", "-std=c11", "-ffast-math",
         f"-I{REFERENCE}/libpsxav", f"-I{golden}",
         f"{REFERENCE}/libpsxav/adpcm.c", f"{REFERENCE}/libpsxav/cdrom.c",
         f"{golden}/dct_shim.c",
         "-include", f"{golden}/dct_shim.h"]
        + [f"{REFERENCE}/psxavenc/{f}" for f in
           ("main.c", "args.c", "decoding.c", "filefmt.c", "mdec.c")]
        + ["-o", str(ORACLE)] + pkg.stdout.split() + ["-lm"])
    if subprocess.run(cmd, capture_output=True).returncode != 0:
        return None
    return ORACLE
