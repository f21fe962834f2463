"""Batch job runner: encode many files in one process, batched on device.

The reference encodes one file per invocation; batch workloads (game audio
banks, FMV sets) pay FFmpeg startup plus full process setup per file. This
front end runs a list of encode jobs in one process and — beyond sharing
the jit cache — actually groups the device work across files (SURVEY
§2.2's headline batch axis):

- **audio jobs** (xa/xacd/spu/vag/spui/vagi): every file's channel
  streams concatenate on the batch axis and ALL files in a
  (filter-count, shift-range) class encode in ONE device call (sharded
  over the mesh when more than one device is visible). The muxers then
  replay with their precomputed slices — bytes identical to serial runs.
- **video jobs** (str/strcd/strv/sbs): every file's budgeted frames join
  one global frame sequence per (codec, geometry) class; the frame
  encoder consumes it in its usual device batches, so tail frames of one
  file share batches with head frames of the next instead of padding.
- **streaming-tier audio jobs** (inputs big enough for the O(1)-memory
  ingest) keep their bounded chunk feeds but run concurrently, with each
  round of chunks encoded in one shared device call (_ChunkBatcher) —
  the batch axis applies even to inputs too big to hold whole.

Grouping is on by default; PSXAVENC_BATCH_GROUP=0 restores strictly
serial execution (identical output bytes either way).

Usage:
    python -m psxavenc_tpu.batch jobs.txt
    python -m psxavenc_tpu.batch - < jobs.txt

Each non-empty, non-comment line of the job file is a full psxavenc
argument vector, e.g.:

    -t vag -f 44100 voices/a.wav out/a.vag
    -t xacd -F 1 music/theme.wav out/theme.xa
    -t strcd -s 320x240 fmv/intro.avi out/intro.str
"""

import contextlib
import io as iomod
import os
import shlex
import sys
import threading
import time

import numpy as np

from . import cli
from . import cli_args as ca
from .io import ingest

AUDIO_FORMATS = (ca.FORMAT_XA, ca.FORMAT_XACD, ca.FORMAT_SPU,
                 ca.FORMAT_VAG, ca.FORMAT_SPUI, ca.FORMAT_VAGI)
VIDEO_FORMATS = (ca.FORMAT_STR, ca.FORMAT_STRCD, ca.FORMAT_STRV,
                 ca.FORMAT_SBS)


class _CaptureDone(Exception):
    """Raised by the planning pass once the container has handed its
    device work to the batch planner."""


def _capture_encoder(store):
    """unit_encoder that records the prepared request and aborts the
    container (the plan pass needs only the layout, not the bytes)."""
    from .models import adpcm_stream as streams

    def enc(channel_samples, offsets, limits, filter_count, shift_range,
            prev1=None, prev2=None, use_pallas=None):
        units, lim = streams.gather_units(channel_samples, offsets,
                                          limits)
        store.append({"units": units, "lim": lim, "fc": filter_count,
                      "sr": shift_range, "prev1": prev1, "prev2": prev2})
        raise _CaptureDone()

    return enc


def _replay_encoder(results):
    """unit_encoder returning the precomputed grouped-encode slice."""

    def enc(*_args, **_kwargs):
        return results.pop(0)

    return enc


def _encode_audio_groups(reqs, quiet=False):
    """One device call per (filter_count, shift_range) class over the
    concatenated batch axis; sharded over the mesh when multi-device."""
    from .models import adpcm_stream as streams

    out = [None] * len(reqs)
    groups = {}
    for i, r in enumerate(reqs):
        groups.setdefault((r["fc"], r["sr"]), []).append(i)
    for (fc, sr), idxs in groups.items():
        t_max = max(reqs[i]["lim"].shape[1] for i in idxs)
        b_tot = sum(reqs[i]["lim"].shape[0] for i in idxs)
        units = np.zeros((b_tot, t_max, streams.SAMPLES_PER_UNIT),
                         np.int32)
        lim = np.zeros((b_tot, t_max), np.int32)
        p1 = np.zeros(b_tot, np.int32)
        p2 = np.zeros(b_tot, np.int32)
        state_t = np.zeros(b_tot, np.int64)
        b0 = 0
        for i in idxs:
            r = reqs[i]
            b, t = r["lim"].shape
            units[b0:b0 + b, :t] = r["units"]
            lim[b0:b0 + b, :t] = r["lim"]
            state_t[b0:b0 + b] = t - 1
            if r["prev1"] is not None:
                p1[b0:b0 + b] = r["prev1"]
                p2[b0:b0 + b] = r["prev2"]
            b0 += b
        if not quiet:
            print(f"[batch] audio group fc={fc} sr={sr}: "
                  f"{len(idxs)} jobs, {b_tot} streams x {t_max} units "
                  f"in one device call", file=sys.stderr)
        h, n, s1, s2 = _grouped_unit_encode(units, lim, fc, sr, p1, p2,
                                            state_t)
        b0 = 0
        for i in idxs:
            b, t = reqs[i]["lim"].shape
            out[i] = (h[b0:b0 + b, :t], n[b0:b0 + b, :t],
                      s1[b0:b0 + b], s2[b0:b0 + b])
            b0 += b
    return out


def _grouped_unit_encode(units, lim, fc, sr, p1, p2, state_t):
    """Multi-ACCELERATOR: shard the stream axis over the mesh
    (parallel.mesh.unit_encode_step). On CPU hosts the "devices" are
    virtual splits of the same cores, so the mesh adds only overhead
    while the native unit encoder (adpcm_stream's no-TPU tier) is
    strictly faster — route there instead (PSXAVENC_FORCE_MESH=1
    overrides, for mesh-path tests). Single device: the plain call."""
    import os

    import jax

    from .models import adpcm_stream as streams

    n_dev = len(jax.devices())
    B = lim.shape[0]
    use_mesh = n_dev > 1 and B >= n_dev and (
        jax.devices()[0].platform != "cpu"
        or os.environ.get("PSXAVENC_FORCE_MESH"))
    if use_mesh:
        import jax.numpy as jnp

        from .parallel import mesh as pm

        b_pad = -(-B // n_dev) * n_dev
        if b_pad != B:
            pad = b_pad - B
            units = np.concatenate([units, np.zeros(
                (pad,) + units.shape[1:], units.dtype)])
            lim = np.concatenate([lim, np.zeros((pad,) + lim.shape[1:],
                                                lim.dtype)])
            p1 = np.concatenate([p1, np.zeros(pad, p1.dtype)])
            p2 = np.concatenate([p2, np.zeros(pad, p2.dtype)])
        mesh = pm.make_mesh()
        step = pm.unit_encode_step(mesh, filter_count=fc, shift_range=sr)
        h, n, s1, s2 = step(jnp.asarray(units), jnp.asarray(lim),
                            jnp.asarray(p1), jnp.asarray(p2))
        h = np.asarray(h)[:B].astype(np.uint8)
        n = np.asarray(n)[:B].astype(np.uint8)
        rows = np.arange(B)
        s1 = np.asarray(s1)[rows, state_t]
        s2 = np.asarray(s2)[rows, state_t]
        return h, n, s1, s2
    return streams.encode_prepared_units(units, lim, fc, sr, prev1=p1,
                                         prev2=p2, state_t=state_t)


class _ThreadStderr:
    """Per-thread stderr demux for concurrently running streaming jobs:
    registered threads write to a private buffer (dumped in job order
    when the phase ends), everyone else passes through to the real
    stream — progress lines from parallel jobs never interleave."""

    def __init__(self, real):
        self.real = real
        self.bufs = {}

    def register(self):
        buf = iomod.StringIO()
        self.bufs[threading.get_ident()] = buf
        return buf

    def write(self, s):
        buf = self.bufs.get(threading.get_ident())
        (buf if buf is not None else self.real).write(s)
        return len(s)

    def flush(self):
        if threading.get_ident() not in self.bufs:
            self.real.flush()

    def isatty(self):
        return False

    def close(self):
        # Loggers may cache us as their stream and close at exit; the
        # real stream's lifetime is not ours to end.
        pass


class _ChunkBatcher:
    """Groups the bounded-memory streaming tier's per-chunk unit encodes
    across concurrently running jobs into shared device calls.

    Each streaming audio job runs in its own thread with a ``chunked``
    unit_encoder (the containers keep their memory-bounding chunk feeds —
    vag.SPU_CHUNK_BLOCKS / xa.AUDIO_CHUNK_SECTORS_SOLO). A chunk encode
    enqueues its gathered units and blocks; when every still-active job
    has a chunk pending, the whole round encodes through the same
    per-(filter_count, shift_range) grouped device call the whole-file
    batch path uses. State threading stays per job (the containers pass
    prev1/prev2 explicitly), so bytes are identical to serial execution.
    With a single streaming job the rounds are singletons — exactly the
    serial chunk feed. Beats the reference's one-file process model
    (main.c:51-212) on exactly the inputs too big for whole-file
    grouping."""

    def __init__(self, quiet=False):
        self.cv = threading.Condition()
        self.active = 0
        self.pending = []
        self.quiet = quiet
        self.rounds = 0
        self.grouped_rounds = 0
        self.max_round = 0

    def register(self):
        with self.cv:
            self.active += 1

    def unregister(self):
        with self.cv:
            self.active -= 1
            if self.pending and len(self.pending) >= self.active:
                self._flush_locked()

    def encoder(self):
        from .models import adpcm_stream as streams

        def enc(channel_samples, offsets, limits, filter_count,
                shift_range, prev1=None, prev2=None, use_pallas=None):
            units, lim = streams.gather_units(
                np.asarray(channel_samples), np.asarray(offsets),
                np.asarray(limits))
            slot = {"units": units, "lim": lim, "fc": filter_count,
                    "sr": shift_range, "prev1": prev1, "prev2": prev2,
                    "done": False, "out": None, "error": None}
            with self.cv:
                self.pending.append(slot)
                if len(self.pending) >= self.active:
                    self._flush_locked()
                else:
                    while not slot["done"]:
                        self.cv.wait()
            if slot["error"] is not None:
                raise RuntimeError(
                    f"shared chunk encode failed: {slot['error']}")
            return slot["out"]

        enc.chunked = True
        return enc

    def _flush_locked(self):
        reqs, self.pending = self.pending, []
        self.rounds += 1
        if len(reqs) > 1:
            self.grouped_rounds += 1
            self.max_round = max(self.max_round, len(reqs))
        try:
            results = _encode_audio_groups(reqs, quiet=True)
        except BaseException as e:
            # Mark every slot failed before re-raising: the other jobs'
            # threads are blocked in enc()'s wait loop and would hang
            # forever otherwise (they surface the error as their own).
            for slot in reqs:
                slot["error"] = e
                slot["done"] = True
            self.cv.notify_all()
            raise
        for slot, res in zip(reqs, results):
            slot["out"] = res
            slot["done"] = True
        self.cv.notify_all()


def _run_streaming_audio(plan, rcs, finish, quiet=False):
    """Run streaming-tier audio jobs concurrently with chunk rounds
    batched into shared device calls (bytes identical to serial)."""
    batcher = _ChunkBatcher(quiet=quiet)
    mux = _ThreadStderr(sys.stderr)
    bufs = [None] * len(plan)

    def run_one(k, i, args, dec):
        bufs[k] = mux.register()
        try:
            rcs[i] = finish(args, dec, unit_encoder=batcher.encoder())
        except BaseException:
            rcs[i] = 1
            raise
        finally:
            batcher.unregister()

    real_stderr = sys.stderr
    sys.stderr = mux
    try:
        # Register every job BEFORE any thread starts: if a fast job
        # registered itself in-thread it could reach its first chunk
        # while the others were still spawning (pending >= active with
        # active == 1) and flush a premature singleton round, silently
        # losing the round-sharing for that chunk.
        for _ in plan:
            batcher.register()
        threads = [threading.Thread(target=run_one, args=(k, i, a, d),
                                    daemon=True)
                   for k, (i, a, d) in enumerate(plan)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        sys.stderr = real_stderr
    for buf in bufs:
        if buf is not None and buf.getvalue():
            sys.stderr.write(buf.getvalue())
    if not quiet and batcher.grouped_rounds:
        print(f"[batch] streaming tier: {len(plan)} jobs, "
              f"{batcher.grouped_rounds}/{batcher.rounds} chunk rounds "
              f"shared a device call (widest {batcher.max_round})",
              file=sys.stderr)


def _video_plan(args, dec):
    """(sources, budgets) for a video job — the same frame/budget pairing
    the incremental muxers consume (frame k <- source min(k-1, last))."""
    from .containers import strf

    if args.format == ca.FORMAT_SBS:
        budgets = [args.alignment] * dec.video_frame_count
    elif args.format in (ca.FORMAT_STR, ca.FORMAT_STRCD):
        _, _, budgets = strf.str_schedule(args, dec, quiet=True)
    else:
        _, _, budgets = strf.strspu_schedule(args, dec, quiet=True)
    frames = dec.video_window()
    total = len(frames)
    sources = [frames[min(k, total - 1)] for k in range(len(budgets))]
    return sources, budgets


def _encode_video_groups(plans, quiet=False):
    """One shared frame sequence per (codec, w, h): the encoder's device
    batches span job boundaries (budgets ride as data)."""
    from .models.bs_video import BsFrameEncoder

    out = [None] * len(plans)
    groups = {}
    for i, (args, dec, sources, budgets) in enumerate(plans):
        key = (args.video_codec, dec.video_width, dec.video_height)
        groups.setdefault(key, []).append(i)
    for (codec, w, h), idxs in groups.items():
        all_sources, all_budgets, spans = [], [], []
        for i in idxs:
            _, _, sources, budgets = plans[i]
            spans.append((len(all_sources), len(sources)))
            all_sources.extend(sources)
            all_budgets.extend(budgets)
        if not quiet:
            print(f"[batch] video group {w}x{h} codec={codec}: "
                  f"{len(idxs)} jobs, {len(all_sources)} frames in "
                  f"shared device batches", file=sys.stderr)
        enc = BsFrameEncoder(codec, w, h)
        results = enc.encode_frames(all_sources, all_budgets)
        for i, (start, count) in zip(idxs, spans):
            out[i] = results[start:start + count]
    return out


def run_jobs(jobs, group=True, quiet=False):
    """Run parsed job argvs; returns per-job exit codes. With ``group``,
    audio unit encodes and video frame encodes batch across files; the
    output bytes are identical to serial execution either way."""
    t0 = time.monotonic()
    rcs = [None] * len(jobs)

    parsed = []
    for i, argv in enumerate(jobs):
        args = ca.Args()
        try:
            ok = ca.parse_args(args, list(argv))
        except ca.ArgError:
            ok = False
        if not ok:
            rcs[i] = 1
            continue
        parsed.append((i, args))

    plan_audio = []   # (job_index, args, dec, request_index)
    plan_video = []   # (job_index, args, dec, sources, budgets)
    plan_stream = []  # (job_index, args, dec) — streaming-tier audio
    serial = []       # (job_index, argv) — run through cli.main
    audio_reqs = []

    for i, args in parsed:
        if not group:
            serial.append((i, jobs[i]))
            continue
        fmt = args.format
        if fmt not in AUDIO_FORMATS and fmt not in VIDEO_FORMATS:
            serial.append((i, jobs[i]))
            continue
        try:
            dec = ingest.open_av_data(args, cli._DECODER_FLAGS[fmt])
        except ingest.OpenError:
            print(f"Failed to open input file: {args.input_file}",
                  file=sys.stderr)
            rcs[i] = 1
            continue
        except Exception as e:  # noqa: BLE001 — mirror cli.main
            print(str(e), file=sys.stderr)
            print(f"Failed to open input file: {args.input_file}",
                  file=sys.stderr)
            rcs[i] = 1
            continue
        if isinstance(dec, ingest.StreamingDecoder):
            if fmt in AUDIO_FORMATS:
                # Streaming audio keeps its bounded chunk feed but runs
                # concurrently: chunk rounds across jobs share device
                # calls (_ChunkBatcher).
                plan_stream.append((i, args, dec))
            else:
                # Streaming video encodes lazily through the frame
                # encoder's own 64-frame device batches (already near
                # full occupancy); run serially.
                dec.close()
                serial.append((i, jobs[i]))
            continue
        if fmt in AUDIO_FORMATS:
            n_before = len(audio_reqs)
            try:
                with contextlib.redirect_stderr(iomod.StringIO()):
                    cli._dispatch(args, dec, iomod.BytesIO(),
                                  unit_encoder=_capture_encoder(
                                      audio_reqs))
            except _CaptureDone:
                pass
            except (RuntimeError, NotImplementedError) as e:
                print(f"Error: {e}", file=sys.stderr)
                rcs[i] = 1
                continue
            if len(audio_reqs) == n_before:
                # No unit encode happened (e.g. empty input): the plan
                # pass already completed the job against a throwaway
                # sink; redo it for real, serially.
                dec.reset()
                serial.append((i, jobs[i]))
                continue
            dec.reset()
            plan_audio.append((i, args, dec, n_before))
        else:
            try:
                sources, budgets = _video_plan(args, dec)
            except (RuntimeError, NotImplementedError) as e:
                print(f"Error: {e}", file=sys.stderr)
                rcs[i] = 1
                continue
            plan_video.append((i, args, dec, sources, budgets))

    audio_results = _encode_audio_groups(audio_reqs, quiet=quiet) \
        if audio_reqs else []
    video_results = _encode_video_groups(
        [(a, d, s, b) for (_, a, d, s, b) in plan_video], quiet=quiet) \
        if plan_video else []

    def finish(args, dec, **inject):
        try:
            output = open(args.output_file, "wb")
        except OSError:
            print(f"Failed to open output file: {args.output_file}",
                  file=sys.stderr)
            return 1
        try:
            with output:
                cli._dispatch(args, dec, output, **inject)
        except (RuntimeError, NotImplementedError) as e:
            print(f"Error: {e}", file=sys.stderr)
            return 1
        if not (args.flags & ca.FLAG_HIDE_PROGRESS):
            print("\nDone.", file=sys.stderr)
        return 0

    for (i, args, dec, req0) in plan_audio:
        # Each audio container makes exactly one unit-encode call.
        rcs[i] = finish(args, dec,
                        unit_encoder=_replay_encoder(
                            [audio_results[req0]]))
    if plan_stream:
        _run_streaming_audio(plan_stream, rcs, finish, quiet=quiet)
    for k, (i, args, dec, _s, _b) in enumerate(plan_video):
        rcs[i] = finish(args, dec, frame_results=video_results[k])
    for (i, argv) in serial:
        rcs[i] = cli.main(list(argv))

    for i, argv in enumerate(jobs):
        status = "ok" if rcs[i] == 0 else f"FAILED ({rcs[i]})"
        if not quiet:
            print(f"[{i + 1}/{len(jobs)}] {' '.join(map(str, argv))}: "
                  f"{status}", file=sys.stderr)
    dt = time.monotonic() - t0
    failures = sum(1 for rc in rcs if rc != 0)
    if not quiet:
        print(f"{len(jobs) - failures}/{len(jobs)} jobs succeeded in "
              f"{dt:.1f}s", file=sys.stderr)
    return rcs


def main(argv=None):
    # Same platform override the single-file CLI honors (cli.main).
    plat = os.environ.get("PSXAVENC_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
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
    group = os.environ.get("PSXAVENC_BATCH_GROUP", "1") != "0"
    rcs = run_jobs(jobs, group=group)
    return 1 if any(rc != 0 for rc in rcs) else 0


if __name__ == "__main__":
    sys.exit(main())
