#!/usr/bin/env python
"""Doc-consistency lint: parity/coverage claims must match the artifacts.

Run by CI (.github/workflows/ci.yml) and by hand. Checks:
  1. The shipped swresample bank count in data/swr_banks.npz matches the
     number claimed in COVERAGE.md and PARITY.md.
  2. PARITY.md describes the streaming tier as covering all containers
     (it regressed to "video formats" once; tests/test_streaming.py
     covers audio containers too).
  3. README's headline device-side video number is within 25% of the
     most recent BENCH_DETAILS.json, when that file exists.
  4. Same for README's device-side audio Msamples/s claim
     (vs audio_msps_device).
Exit 0 = consistent, 1 = drift (each failure printed).
"""
import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
fails = []


def check(cond, msg):
    if not cond:
        fails.append(msg)


def main():
    import numpy as np
    banks = np.load(REPO / "psxavenc_tpu" / "data" / "swr_banks.npz")
    n_banks = len({k.rsplit("_", 1)[0] for k in banks.keys()
                   if not k.startswith("mix_")})

    coverage = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"(\d+) probed ratio banks", coverage)
    check(m is not None, "COVERAGE.md: no 'N probed ratio banks' claim")
    if m:
        check(int(m.group(1)) == n_banks,
              f"COVERAGE.md claims {m.group(1)} banks, npz ships {n_banks}")

    parity = (REPO / "PARITY.md").read_text()
    m = re.search(r"(\d+) shipped pairs", parity)
    check(m is not None, "PARITY.md: no 'N shipped pairs' claim")
    if m:
        check(int(m.group(1)) == n_banks,
              f"PARITY.md claims {m.group(1)} pairs, npz ships {n_banks}")

    check("all containers) switches" in parity,
          "PARITY.md streaming-tier note regressed from 'all containers'")

    details = REPO / "BENCH_DETAILS.json"
    if details.exists():
        try:
            bench = json.loads(details.read_text())
            fps = bench.get("video_fps_device")
            readme = (REPO / "README.md").read_text()
            m = re.search(r"~([\d,]+) frames/s on-chip", readme)
            if fps and m:
                claimed = float(m.group(1).replace(",", ""))
                check(abs(claimed - fps) / fps < 0.25,
                      f"README claims ~{claimed:.0f} fps on-chip but "
                      f"BENCH_DETAILS.json says {fps:.0f}")
            msps = bench.get("audio_msps_device")
            m = re.search(r"~([\d,]+) Msamples/s device-side", readme)
            if msps and m:
                claimed = float(m.group(1).replace(",", ""))
                check(abs(claimed - msps) / msps < 0.25,
                      f"README claims ~{claimed:.0f} Msamples/s "
                      f"device-side but BENCH_DETAILS.json says "
                      f"{msps:.0f}")
        except (json.JSONDecodeError, KeyError):
            pass

    if fails:
        for f in fails:
            print(f"DOC LINT FAIL: {f}")
        return 1
    print(f"doc lint OK ({n_banks} banks consistent)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
