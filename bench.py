#!/usr/bin/env python
"""Benchmark: TPU batch encoder vs the reference CPU encoder.

Headline metric (BASELINE.md): BS v2 320x240 frames/sec, end-to-end on
device (pixels in, packed bitstream out) vs the reference binary encoding
the same frames on this host's CPU. Secondary metrics (SPU-ADPCM
Msamples/s etc.) go to stderr and BENCH_DETAILS.json.

Prints exactly one JSON line on stdout.
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
BASELINE_CACHE = REPO / "bench_baseline.json"

VIDEO_W, VIDEO_H = 320, 240
VIDEO_FRAMES = 60
FRAME_BUDGET = 18144          # 9 sectors * 2016; 16-aligned so the reference
                              # bug (1-byte OOB write in flush_bits,
                              # mdec.c:323) lands in malloc padding
AUDIO_RATE = 22050
AUDIO_SECONDS = 60


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_reference():
    """Time the reference binary on this host (cached in-repo)."""
    if BASELINE_CACHE.exists():
        return json.loads(BASELINE_CACHE.read_text())
    from psxavenc_tpu.utils.oracle import build_oracle
    from psxavenc_tpu.utils import synth

    oracle = build_oracle()
    if oracle is None:
        log("bench: reference oracle unavailable; using recorded baseline")
        return {"video_fps": 30.0, "audio_msps": 10.0, "provenance": "none"}

    out = {}
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        frames = synth.rand_frames(VIDEO_W, VIDEO_H, VIDEO_FRAMES, seed=9)
        avi = synth.write_avi_sized(td / "bench.avi", VIDEO_W, VIDEO_H,
                                    frames, 15)
        t0 = time.monotonic()
        r = subprocess.run([str(oracle), "-q", "-t", "sbs", "-a",
                            str(FRAME_BUDGET), str(avi),
                            str(td / "out.sbs")], capture_output=True)
        tv = time.monotonic() - t0
        assert r.returncode == 0, r.stderr
        out["video_fps"] = VIDEO_FRAMES / tv

        n = AUDIO_RATE * AUDIO_SECONDS
        pcm = synth.rand_pcm(n, seed=9)
        wav = synth.write_wav(td / "bench.wav", pcm, AUDIO_RATE)
        t0 = time.monotonic()
        r = subprocess.run([str(oracle), "-q", "-t", "spu", "-f",
                            str(AUDIO_RATE), str(wav),
                            str(td / "out.spu")], capture_output=True)
        ta = time.monotonic() - t0
        assert r.returncode == 0, r.stderr
        out["audio_msps"] = n / ta / 1e6
    out["provenance"] = "measured on this host"
    BASELINE_CACHE.write_text(json.dumps(out, indent=1))
    return out


def _timed_loop(fn, min_seconds=2.0, max_iters=200):
    fn()  # warmup/compile
    t0 = time.monotonic()
    iters = 0
    while True:
        fn()
        iters += 1
        dt = time.monotonic() - t0
        if dt >= min_seconds or iters >= max_iters:
            return iters, dt


def measure_ours_video(batch=128, iters=6, serial_baseline=True):
    """End-to-end video throughput INCLUDING the host->device frame
    upload and host-side frame assembly, through the PRODUCTION encoder
    (models.bs_video.BsFrameEncoder — the path the CLI muxers drive,
    incl. its double-buffered uploader thread). The serial baseline
    emulates the same work without the overlap (upload -> compute ->
    fetch per chunk). Returns (e2e_fps, overlap_gain_pct)."""
    from psxavenc_tpu import api
    from psxavenc_tpu.io.ingest import _scale_frame_nv21
    from psxavenc_tpu.models.bs_video import BsFrameEncoder
    from psxavenc_tpu.ops import bs as bs_ops
    from psxavenc_tpu.utils import synth

    uniq = min(batch, 16)
    frames = synth.rand_frames(VIDEO_W, VIDEO_H, uniq, seed=3)
    nv21 = np.stack([
        _scale_frame_nv21(y, cb, cr, VIDEO_W, VIDEO_H, VIDEO_W, VIDEO_H)
        for (y, cb, cr) in frames])
    nv21 = np.tile(nv21, (batch // uniq, 1))
    frame_list = [nv21[i] for i in range(batch)]
    sizes = [FRAME_BUDGET] * batch
    budgets = np.full(32, FRAME_BUDGET, np.int32)
    cap = (FRAME_BUDGET - 8) // 2

    enc = BsFrameEncoder(bs_ops.BS_V2, VIDEO_W, VIDEO_H)
    enc.encode_frames(frame_list, sizes)  # compile + warm the tunnel

    # Serial baseline: the same 32-frame chunks, upload -> compute ->
    # fetch with no overlap.
    def serial_pass():
        for base in range(0, batch, 32):
            out = api.bs_encode_frames_packed(
                nv21[base:base + 32], budgets, codec=bs_ops.BS_V2,
                width=VIDEO_W, height=VIDEO_H, capacity_words=cap)
            np.asarray(out["words"])
            np.asarray(out["scale"])

    if serial_baseline:
        serial_pass()
        t0 = time.monotonic()
        for _ in range(iters):
            serial_pass()
        serial = (time.monotonic() - t0) / iters
    else:
        # CPU fallback: the XLA serial pass is dispatch-bound off-TPU
        # (minutes at this batch) and the overlap gain is a tunnel
        # metric anyway.
        serial = 0.0

    t0 = time.monotonic()
    for _ in range(iters):
        enc.encode_frames(frame_list, sizes)
    dbl = (time.monotonic() - t0) / iters
    enc.close()
    gain = 100.0 * (serial - dbl) / serial if serial > 0 else 0.0
    return batch / dbl, gain


def measure_ours_audio(batch=4096, t_units=1000, use_pallas=True):
    """Device-side SPU-ADPCM throughput via the fused Pallas kernel.

    Timing is forced through a checksum fetch (block_until_ready is
    unreliable on the axon platform); the scalar fetch latency is included,
    so this is a lower bound. The end-to-end tunnel-limited number is
    reported separately in the details (the dev tunnel's ~20 MB/s is not
    representative of a production PCIe host).

    ``use_pallas=False`` (the CPU-fallback bench) times the NATIVE C++
    unit encoder instead — the tier a no-TPU CLI run actually uses (the
    Mosaic kernel only runs compiled on TPU; the XLA scan is
    dispatch-bound off-TPU and never the production path).
    """
    import jax
    import jax.numpy as jnp

    if not use_pallas:
        from psxavenc_tpu import native

        batch, t_units = 64, 500
        rng = np.random.default_rng(1)
        pcm = np.cumsum(rng.integers(-800, 800, (batch, t_units * 28)),
                        axis=1)
        units = np.clip(pcm, -32768, 32767).astype(np.int16).reshape(
            batch, t_units, 28)
        limits = np.full((batch, t_units), 28, np.int32)
        z = np.zeros(batch, np.int32)
        native.adpcm_encode_units(units[:4, :50], limits[:4, :50],
                                  z[:4], z[:4], 5, 12)  # warm build
        t0 = time.monotonic()
        iters = 0
        while True:
            native.adpcm_encode_units(units, limits, z, z, 5, 12)
            iters += 1
            dt = time.monotonic() - t0
            if dt >= 2.0 or iters >= 50:
                break
        return batch * t_units * 28 * iters / dt / 1e6

    from psxavenc_tpu.ops import adpcm_pallas as pk

    rng = np.random.default_rng(1)
    pcm = np.cumsum(rng.integers(-800, 800, (batch, t_units * 28)),
                    axis=1)
    units = jax.device_put(
        np.clip(pcm, -32768, 32767).astype(np.int32).reshape(
            batch, t_units, 28))
    limits = jax.device_put(np.full((batch, t_units), 28, np.int32))
    z = jax.device_put(np.zeros(batch, np.int32))

    @jax.jit
    def run(u, l, a, b):
        h, w, p1, p2 = pk.encode_units_pallas(
            u, l, a, b, filter_count=5, shift_range=12)
        return h.sum() + w.sum() + p1[:, -1].sum()

    np.asarray(run(units, limits, z, z))  # compile + warm
    t0 = time.monotonic()
    iters = 0
    while True:
        np.asarray(run(units, limits, z, z))
        iters += 1
        dt = time.monotonic() - t0
        if dt >= 2.0 or iters >= 50:
            break
    return batch * t_units * 28 * iters / dt / 1e6


def _validate_pallas():
    """Bit-exact cross-check of the Pallas ADPCM kernel against the XLA
    kernel on the bench device, all variants (the CPU test suite cannot
    compile Pallas)."""
    import jax
    import jax.numpy as jnp
    from psxavenc_tpu.ops import adpcm as ops
    from psxavenc_tpu.ops import adpcm_pallas as pk

    rng = np.random.default_rng(7)
    for fc, sr in ((5, 12), (4, 12), (4, 8)):
        B, T = 128, 3
        units = rng.integers(-20000, 20000, (B, T, 28)).astype(np.int32)
        limits = np.full((B, T), 28, np.int32)
        limits[0, -1] = 9
        z = np.zeros(B, np.int32)
        args = tuple(jnp.asarray(a) for a in (units, limits, z, z))
        h_ref, _, s1r, _ = ops.encode_units_scan(*args, filter_count=fc,
                                                 shift_range=sr)
        h, _, s1, _ = pk.encode_units_pallas(*args, filter_count=fc,
                                             shift_range=sr)
        assert np.array_equal(np.asarray(h), np.asarray(h_ref)), (fc, sr)
        assert np.array_equal(np.asarray(s1), np.asarray(s1r)), (fc, sr)
    log("pallas adpcm kernel: bit-exact vs XLA kernel on this device")

    # ADPCM shim specifics: masked/partial units (limit <= 0 occurs on XA
    # trailing pad units) and cross-segment state threading.
    from psxavenc_tpu.models import adpcm_stream as streams

    n = 28 * 700
    pcm = np.clip(np.cumsum(rng.integers(-900, 900, (2, n)), axis=1),
                  -32768, 32767).astype(np.int16)
    offs, lims = streams.uniform_unit_layout(720, n - 13)
    offs2 = np.stack([offs, offs])
    lims2 = np.stack([lims, lims])
    seg = streams._PALLAS_SEG_UNITS
    try:
        streams._PALLAS_SEG_UNITS = 256  # force multi-segment threading
        hp, np_, s1p, s2p = streams.encode_unit_streams(
            pcm, offs2, lims2, 4, 12, use_pallas=True)
    finally:
        streams._PALLAS_SEG_UNITS = seg
    hx, nx, s1x, s2x = streams.encode_unit_streams(
        pcm, offs2, lims2, 4, 12, use_pallas=False)
    assert np.array_equal(hp, hx) and np.array_equal(np_, nx)
    assert np.array_equal(s1p, s1x) and np.array_equal(s2p, s2x)
    log("pallas adpcm CLI shim: bit-exact incl. masked units + "
        "segment state threading")

    from psxavenc_tpu import api
    from psxavenc_tpu.ops import bitpack as bp
    from psxavenc_tpu.ops import bs as bsm

    frames = rng.integers(0, 256, (8, 320 * 240 * 3 // 2)).astype(np.uint8)
    budgets = np.full(8, 18144, np.int32)
    ox = api.bs_encode_frames(frames, budgets, codec=bsm.BS_V2, width=320,
                              height=240, pallas_sweep=False)
    op = api.bs_encode_frames(frames, budgets, codec=bsm.BS_V2, width=320,
                              height=240, pallas_sweep=True)
    for k in ("scale", "codes", "bits", "nz_count", "total_bits"):
        assert np.array_equal(np.asarray(ox[k]), np.asarray(op[k])), k
    log("pallas scale-sweep kernel: bit-exact vs XLA sweep on this device")

    # The default fused packer on device, v2 and v3dc (the emit+pack and
    # placement kernels are codec-agnostic; this pins the composed
    # path): must equal the XLA "blocks" path bytewise. The alternate
    # packers (fused/fused_gather/blocks_pallas) are interpret-tested in
    # CI and their components cross-checked above; keeping them out of
    # the device sweep bounds cold-cache bench time (each composed
    # program is a 60-100 s remote compile).
    for codec in (bsm.BS_V2, bsm.BS_V3DC):
        base = api.bs_encode_frames_packed(
            frames, budgets, codec=codec, width=320, height=240,
            capacity_words=(18144 - 8) // 2, pallas_sweep=True,
            packer="blocks")
        alt = api.bs_encode_frames_packed(
            frames, budgets, codec=codec, width=320, height=240,
            capacity_words=(18144 - 8) // 2, pallas_sweep=True,
            packer="fused_mxu")
        assert np.array_equal(np.asarray(base["words"]),
                              np.asarray(alt["words"])), codec
    log("fused_mxu packer: bit-exact vs XLA blocks path on device, "
        "v2 + v3dc")

    # Bit-packer kernels (phase-1 pack + sliding-window placement).
    s = ox["codes"].shape[2]
    eofc = jnp.zeros((8, 1, s), jnp.uint32).at[:, 0, 0].set(0x1FF)
    eofb = jnp.zeros((8, 1, s), jnp.int32).at[:, 0, 0].set(10)
    codes = jnp.concatenate([ox["codes"].astype(jnp.uint32), eofc], axis=1)
    bits = jnp.concatenate([ox["bits"].astype(jnp.int32), eofb], axis=1)
    cap = (18144 - 8) // 2
    w0, _ = bp.pack_frames_blocks(codes, bits, capacity_words=cap)
    for kwargs in ({"pallas_pack": True}, {"pallas_place": True},
                   {"pallas_pack": True, "pallas_place": True}):
        w1, _ = bp.pack_frames_blocks(codes, bits, capacity_words=cap,
                                      **kwargs)
        assert np.array_equal(np.asarray(w0), np.asarray(w1)), kwargs
    log("pallas bit-packer kernels: bit-exact vs XLA packer on device")


def measure_video_device(batch=64, iters=8, codec=None):
    """Device-side video throughput (pixels -> packed words), pipelined
    launches with one checksum fetch to drain the queue, fetch-latency
    subtracted. ``codec`` defaults to BS v2 (the headline config);
    passing BS_V3DC records the DC-delta codec's rate."""
    import jax
    import jax.numpy as jnp
    from psxavenc_tpu import api
    from psxavenc_tpu.ops import bs as bs_ops

    if codec is None:
        codec = bs_ops.BS_V2

    cap = (FRAME_BUDGET - 8) // 2
    rng = np.random.default_rng(3)
    frames = jax.device_put(rng.integers(
        0, 256, (batch, VIDEO_W * VIDEO_H * 3 // 2)).astype(np.uint8))
    budgets = jax.device_put(np.full(batch, FRAME_BUDGET, np.int32))

    # Frames/budgets MUST be jit ARGUMENTS: closure-captured device
    # arrays are compile-time constants and XLA folds whole leading
    # stages (the coefs pipeline of constant frames folded at compile
    # time here and overstated throughput by ~25% in earlier rounds).
    @jax.jit
    def run(fr, bu):
        out = api.bs_encode_frames_packed(
            fr, bu, codec=codec, width=VIDEO_W,
            height=VIDEO_H, capacity_words=cap)
        return (out["words"].astype(jnp.int32).sum() + out["scale"].sum())

    @jax.jit
    def tiny(bu):
        return bu.sum()

    np.asarray(run(frames, budgets))
    np.asarray(tiny(budgets))
    lats = []
    for _ in range(5):
        t0 = time.monotonic()
        np.asarray(tiny(budgets))
        lats.append(time.monotonic() - t0)
    fetch = sorted(lats)[2]
    t0 = time.monotonic()
    last = None
    for _ in range(iters):
        last = run(frames, budgets)
    np.asarray(last)
    dt = (time.monotonic() - t0 - fetch) / iters
    return batch / dt


def measure_audio_cli_path(seconds=20):
    """Single-file CLI audio path (2-lane stereo stream): the fused
    Pallas shim vs the XLA scan, wall-clock incl. transfers."""
    from psxavenc_tpu.models import adpcm_stream as streams

    n = 28 * 1350 * seconds  # ~37.8 kHz worth of units per second
    rng = np.random.default_rng(5)
    pcm = np.clip(np.cumsum(rng.integers(-900, 900, (2, n)), axis=1),
                  -32768, 32767).astype(np.int16)
    t_units = n // 28
    offs, lims = streams.uniform_unit_layout(t_units, n)
    offs2 = np.stack([offs, offs])
    lims2 = np.stack([lims, lims])

    out = {}
    for label, use in (("pallas", True), ("fallback", False)):
        streams.encode_unit_streams(pcm, offs2, lims2, 4, 12,
                                    use_pallas=use)  # compile
        # Best of 3: the dev tunnel's per-transfer latency swings
        # 30-400ms with its own state (e.g. right after a heavy video
        # loop) — the minimum reflects the path, not the tunnel mood.
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            streams.encode_unit_streams(pcm, offs2, lims2, 4, 12,
                                        use_pallas=use)
            best = min(best, time.monotonic() - t0)
        out[label] = 2 * n / best / 1e6
    return out


def measure_batch_runner(n_files=32, seconds=2):
    """Multi-file grouped throughput: N spu jobs through the batch
    runner (ONE device call for the whole group) vs running them
    serially, wall-clock files/sec. This is the framework's headline
    batch axis (SURVEY §2.2)."""
    from psxavenc_tpu import batch
    from psxavenc_tpu.utils import synth

    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        jobs = []
        for i in range(n_files):
            pcm = synth.rand_pcm(AUDIO_RATE * seconds, seed=100 + i)
            wav = synth.write_wav(td / f"j{i}.wav", pcm, AUDIO_RATE)
            jobs.append(["-q", "-t", "spu", "-f", str(AUDIO_RATE),
                         str(wav), str(td / f"j{i}.spu")])
        out = {}
        for label, group in (("grouped", True), ("serial", False)):
            # Warm pass first: remote TPU compiles take 60-100 s and
            # would otherwise be billed to whichever mode ran cold.
            batch.run_jobs(jobs, group=group, quiet=True)
            t0 = time.monotonic()
            rcs = batch.run_jobs(jobs, group=group, quiet=True)
            dt = time.monotonic() - t0
            assert all(rc == 0 for rc in rcs), rcs
            out[label] = n_files / dt
    return out


def measure_video_native_cpu(batch=32, iters=3):
    """The native C++ frame-encoder tier's rate on this host's cores —
    what a no-TPU user of the CLI actually gets (~2x the reference
    binary per core; the XLA path off-TPU is dispatch-bound and no
    longer the CPU default)."""
    from psxavenc_tpu import native
    from psxavenc_tpu.io.ingest import _scale_frame_nv21
    from psxavenc_tpu.ops import bs as bs_ops
    from psxavenc_tpu.utils import synth

    frames = synth.rand_frames(VIDEO_W, VIDEO_H, batch, seed=3)
    nv21 = np.stack([
        _scale_frame_nv21(y, cb, cr, VIDEO_W, VIDEO_H, VIDEO_W, VIDEO_H)
        for (y, cb, cr) in frames])
    budgets = np.full(batch, FRAME_BUDGET, np.int32)
    cap = (FRAME_BUDGET - 8) // 2
    run = lambda: native.bs_encode_frames(
        nv21, budgets, codec=bs_ops.BS_V2, width=VIDEO_W, height=VIDEO_H,
        capacity_words=cap)
    run()
    t0 = time.monotonic()
    for _ in range(iters):
        run()
    return batch / ((time.monotonic() - t0) / iters)


def _tpu_reachable(timeout):
    """Probe the axon TPU tunnel in a SUBPROCESS. A wedged tunnel (e.g.
    a pool grant lost to a killed client) hangs ``jax.devices()``
    indefinitely, and once backend discovery has hung in-process it
    cannot be recovered; probing out-of-process lets the bench fall
    back to CPU and still emit its JSON line instead of hanging the
    driver."""
    probe = ("import jax, jax.numpy as jnp; "
             "assert jax.devices()[0].platform == 'tpu'; "
             "print(float(jnp.ones((8, 128)).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, timeout=timeout)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    # Remote TPU compiles take 60-100s each; cache them across runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    device_fallback = False
    if os.environ.get("PSXAVENC_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PSXAVENC_PLATFORM"])
    else:
        # Generous default: the tunnel's first contact can legitimately
        # stall for minutes (CLAUDE.md); only a truly wedged tunnel
        # should trip this.
        probe_s = float(os.environ.get("PSXAVENC_BENCH_PROBE_TIMEOUT",
                                       "900"))
        if not _tpu_reachable(probe_s):
            log(f"bench: TPU tunnel unreachable within {probe_s:.0f}s "
                "probe; falling back to CPU — device-rate figures from "
                "this run are NOT TPU numbers")
            jax.config.update("jax_platforms", "cpu")
            device_fallback = True

    dev = jax.devices()[0]
    log(f"bench device: {dev}")
    if dev.platform == "tpu":
        _validate_pallas()
    ref = measure_reference()
    log(f"reference: video {ref['video_fps']:.2f} fps, "
        f"audio {ref['audio_msps']:.2f} Msamples/s")

    # CLI-path audio first: its wall-clock is dominated by per-transfer
    # tunnel latency, which degrades for minutes after the heavy video
    # loops saturate the link.
    audio_cli = measure_audio_cli_path() if dev.platform == "tpu" else {}
    if audio_cli:
        log(f"ours: CLI-path audio pallas {audio_cli['pallas']:.1f} vs "
            f"fallback (native) {audio_cli['fallback']:.1f} Msamples/s")
    # Device-side measurements run BEFORE the e2e upload loops: the
    # tunnel degrades for minutes after heavy H2D traffic, and the
    # fetch-baseline calibration inherits that (observed: the headline
    # batch-64 reading landed 20% under the same run's batch-32/v3dc
    # numbers when it was measured right after the e2e loop).
    video_dev_fps = measure_video_device(batch=128) \
        if dev.platform == "tpu" \
        else None
    if video_dev_fps is not None:
        log(f"ours: video {video_dev_fps:.2f} fps (device-side)")
    # Batch-size sweep: r5's per-frame overhead cuts (fpp=2 select,
    # one-launch DC chain, fused emitter chains) moved the sweet spot
    # from 32-64 (r3/r4) to 128 — paired runs +1.6 to +7.4% over 64 —
    # so the headline and the production long-file chunk now use 128.
    batch_sweep = {}
    if dev.platform == "tpu":
        for b in (32, 64):
            batch_sweep[str(b)] = measure_video_device(batch=b, iters=8)
        batch_sweep["128"] = video_dev_fps
        log(f"ours: device batch sweep {batch_sweep}")
    v3dc_fps = None
    if dev.platform == "tpu":
        from psxavenc_tpu.ops import bs as bs_ops_m

        v3dc_fps = measure_video_device(codec=bs_ops_m.BS_V3DC)
        log(f"ours: video v3dc {v3dc_fps:.2f} fps (device-side)")
    audio_msps = measure_ours_audio(use_pallas=(dev.platform == "tpu"))
    log(f"ours: audio {audio_msps:.2f} Msamples/s")
    video_fps, overlap_gain = measure_ours_video(
        serial_baseline=(dev.platform == "tpu"))
    video_native_fps = measure_video_native_cpu()
    log(f"ours: video {video_native_fps:.1f} fps (native C++ no-TPU "
        f"tier, this host's cores)")
    log(f"ours: video {video_fps:.2f} fps (e2e tunnel, incl. frame "
        f"upload; double-buffered upload gains {overlap_gain:.0f}% over "
        f"serial)")
    if video_dev_fps is None:
        video_dev_fps = video_fps
    batch_runner = measure_batch_runner() if dev.platform == "tpu" else {}
    if batch_runner:
        log(f"ours: batch runner {batch_runner['grouped']:.1f} files/s "
            f"grouped vs {batch_runner['serial']:.1f} serial")

    # Roofline accounting: judge "fast" against the chip, not only the
    # reference CPU (psxavenc_tpu/utils/roofline.py documents the op
    # censuses and the peak assumptions).
    roofline = {}
    if dev.platform == "tpu":
        from psxavenc_tpu.utils import roofline as rl

        chip = rl.chip_for(getattr(dev, "device_kind", ""))
        cap = (FRAME_BUDGET - 8) // 2
        v_ms = 1e3 * 128 / video_dev_fps
        v_sol, v_pct = rl.video_report(v_ms, chip, VIDEO_W, VIDEO_H,
                                       128, cap)
        a_sol, a_pct = rl.audio_report(audio_msps, chip)
        roofline = {
            "video_full_ms_per_128": round(v_ms, 3),
            "video_sol_ms_per_128": round(v_sol, 3),
            "video_pct_of_roofline": round(100 * v_sol / v_ms, 1),
            "audio_sol_msps": round(a_sol, 1),
            "audio_pct_of_roofline": round(a_pct, 1),
        }
        log(f"roofline: video FULL {v_ms:.2f} ms/128-frame batch vs "
            f"{v_sol:.2f} ms light speed "
            f"({roofline['video_pct_of_roofline']:.0f}% of roofline); "
            f"audio {audio_msps:.0f} Msps vs {a_sol:.0f} SOL "
            f"({a_pct:.0f}% of roofline)")

    details = {
        "device": str(dev) + (" [FALLBACK: TPU tunnel unreachable]"
                              if device_fallback else ""),
        "video_fps": video_fps,
        "video_fps_device": video_dev_fps,
        "video_fps_native_cpu": video_native_fps,
        "video_fps_ref_cpu": ref["video_fps"],
        "video_vs_ref": video_fps / ref["video_fps"],
        "video_device_vs_ref": video_dev_fps / ref["video_fps"],
        "audio_msps_device": audio_msps,
        "audio_msps_ref_cpu": ref["audio_msps"],
        "audio_vs_ref": audio_msps / ref["audio_msps"],
        "audio_cli_path_msps": audio_cli,
        "video_e2e_overlap_gain_pct": overlap_gain,
        "video_device_batch_sweep_fps": batch_sweep,
        "video_fps_device_v3dc": v3dc_fps,
        "batch_runner_files_per_sec": batch_runner,
        "roofline": roofline,
        "notes": "video_fps is end-to-end through the dev tunnel and "
                 "since r4 INCLUDES the raw-NV21 frame upload (r3's "
                 "number kept frames device-resident, so r3/r4 e2e "
                 "values are not comparable), with the production "
                 "double-buffered uploader; the tunnel link (not "
                 "compute) is the bound and is not representative of "
                 "PCIe hosts; video_fps_device is the on-device "
                 "pipeline rate (pipelined launches, fetch-latency "
                 "corrected); audio is device-side via the Pallas "
                 "kernel with checksum-forced timing",
    }
    if device_fallback:
        # Keep the committed TPU record: a CPU-fallback run must not
        # masquerade as device numbers (README figures are lint-checked
        # against this file).
        log("bench: CPU fallback — BENCH_DETAILS.json left untouched")
    else:
        (REPO / "BENCH_DETAILS.json").write_text(
            json.dumps(details, indent=1))

    # Headline = single-chip encode throughput (BASELINE.json's target is
    # ">50x reference-CPU encode throughput on a single TPU chip"); the
    # end-to-end number through this dev host's ~20 MB/s TPU tunnel is
    # recorded alongside in BENCH_DETAILS.json.
    line = {
        "metric": "BS v2 320x240 encode throughput (frames/sec/chip)",
        "value": round(video_dev_fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(video_dev_fps / ref["video_fps"], 2),
    }
    if device_fallback:
        # A wedged tunnel means this run measured the no-TPU native
        # tier; surface the committed TPU record alongside (clearly
        # labeled as cached, never as this run's measurement).
        line["device_fallback"] = "cpu (TPU tunnel unreachable)"
        try:
            rec = json.loads((REPO / "BENCH_DETAILS.json").read_text())
            line["cached_tpu_fps_per_chip"] = round(
                rec["video_fps_device"], 2)
            line["cached_tpu_vs_baseline"] = round(
                rec["video_fps_device"] / rec["video_fps_ref_cpu"], 2)
            line["cached_tpu_source"] = "BENCH_DETAILS.json (last " \
                "successful on-device run; see its notes)"
        except Exception:  # noqa: BLE001 — record missing/corrupt
            pass
    print(json.dumps(line))


if __name__ == "__main__":
    main()
