"""Batch job runner: encode many files in one process.

The reference encodes one file per invocation; batch workloads (game audio
banks, FMV sets) pay FFmpeg startup plus full process setup per file. This
front end runs a list of encode jobs in one process, sharing the jit cache
so each distinct (format, shape-bucket) pipeline compiles once and every
subsequent file reuses it.

Usage:
    python -m psxavenc_tpu.batch jobs.txt
    python -m psxavenc_tpu.batch - < jobs.txt

Each non-empty, non-comment line of the job file is a full psxavenc
argument vector, e.g.:

    -t vag -f 44100 voices/a.wav out/a.vag
    -t xacd -F 1 music/theme.wav out/theme.xa
    -t strcd -s 320x240 fmv/intro.avi out/intro.str
"""

import shlex
import sys
import time

from . import cli


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    if len(argv) != 1:
        print(__doc__, file=sys.stderr)
        return 1
    try:
        src = sys.stdin if argv[0] == "-" else open(argv[0])
    except OSError as e:
        print(f"Failed to open job file: {e}", file=sys.stderr)
        return 1
    jobs = [shlex.split(line) for line in src
            if line.strip() and not line.strip().startswith("#")]
    t0 = time.monotonic()
    failures = 0
    for i, job in enumerate(jobs):
        rc = cli.main(job)
        status = "ok" if rc == 0 else f"FAILED ({rc})"
        print(f"[{i + 1}/{len(jobs)}] {' '.join(job)}: {status}",
              file=sys.stderr)
        failures += rc != 0
    dt = time.monotonic() - t0
    print(f"{len(jobs) - failures}/{len(jobs)} jobs succeeded in {dt:.1f}s",
          file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
