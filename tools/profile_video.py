#!/usr/bin/env python
"""Stage-level device timing for the BS video pipeline.

Times the fused encode (pixels -> packed words) and its stages on the
current default device.

Measurement rules learned the hard way on the axon tunnel:
- block_until_ready is unreliable; force completion with a reduced-scalar
  checksum fetch.
- A fetch costs ~25 ms; pipeline N async launches and fetch once, then
  subtract a calibrated fetch baseline.
- Arrays MUST be passed as jit arguments: closure-captured device arrays
  become compile-time constants and XLA can constant-fold entire stages
  (a "0.2 ms" scatter that really costs 150 ms).

Usage: python tools/profile_video.py [batch] [iters]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


_FETCH_BASELINE = [0.0]


def timed(label, fn, iters):
    np.asarray(fn())  # compile + warm
    t0 = time.monotonic()
    last = None
    for _ in range(iters):
        last = fn()   # async dispatch; device executes in order
    np.asarray(last)  # one fetch drains the whole queue
    dt = (time.monotonic() - t0 - _FETCH_BASELINE[0]) / iters
    print(f"{label:48s} {dt * 1e3:9.2f} ms/batch", flush=True)
    return dt


def calibrate_fetch(jax, probe):
    @jax.jit
    def f(x):
        return x.sum()

    np.asarray(f(probe))
    samples = []
    for _ in range(6):
        t0 = time.monotonic()
        np.asarray(f(probe))
        samples.append(time.monotonic() - t0)
    _FETCH_BASELINE[0] = sorted(samples)[len(samples) // 2]
    print(f"fetch baseline: {_FETCH_BASELINE[0] * 1e3:.1f} ms",
          flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from psxavenc_tpu import api
    from psxavenc_tpu.ops import bitpack as bp
    from psxavenc_tpu.ops import bs as bs_ops

    W, H, budget = 320, 240, 18144
    cap = (budget - 8) // 2
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev}  batch={batch} iters={iters}", flush=True)

    rng = np.random.default_rng(3)
    frames = jax.device_put(
        rng.integers(0, 256, (batch, W * H * 3 // 2)).astype(np.uint8))
    budgets = jax.device_put(np.full(batch, budget, np.int32))
    calibrate_fetch(jax, budgets)

    def make_full(packer):
        @jax.jit
        def f(frames, budgets):
            out = api.bs_encode_frames_packed(
                frames, budgets, codec=bs_ops.BS_V2, width=W, height=H,
                capacity_words=cap, pallas_sweep=on_tpu, packer=packer)
            return (out["words"].astype(jnp.int32).sum()
                    + out["scale"].sum() + out["total_bits"].sum())
        return lambda: f(frames, budgets)

    @jax.jit
    def coefs_only(frames):
        return api._frames_to_coefs(frames, W, H).sum()

    @jax.jit
    def symbols_only(frames, budgets):
        c = api._frames_to_coefs(frames, W, H)
        out = bs_ops.encode_frames_symbols(c, budgets, codec=bs_ops.BS_V2,
                                           pallas_sweep=on_tpu)
        return out["codes"].astype(jnp.int32).sum() + out["scale"].sum()

    # Pre-computed symbols for isolated pack timing.
    c = api._frames_to_coefs(frames, W, H)
    out = bs_ops.encode_frames_symbols(c, budgets, codec=bs_ops.BS_V2,
                                       pallas_sweep=on_tpu)
    B, nb, s = out["codes"].shape
    eof_codes = jnp.zeros((B, 1, s), jnp.uint32).at[:, 0, 0].set(0x1FF)
    eof_bits = jnp.zeros((B, 1, s), jnp.int32).at[:, 0, 0].set(10)
    codes = jax.device_put(np.asarray(jnp.concatenate(
        [out["codes"].astype(jnp.uint32), eof_codes], axis=1)))
    bitsarr = jax.device_put(np.asarray(jnp.concatenate(
        [out["bits"].astype(jnp.int32), eof_bits], axis=1)))

    def make_pack(place, pack=False):
        @jax.jit
        def f(codes, bitsarr):
            w, t = bp.pack_frames_blocks(codes, bitsarr,
                                         capacity_words=cap,
                                         pallas_place=place,
                                         pallas_pack=pack)
            return w.sum() + t.sum()
        return lambda: f(codes, bitsarr)

    @jax.jit
    def pack_flat(codes, bitsarr):
        w, t = jax.vmap(lambda cc, bb: bp.pack_bits(
            cc.reshape(-1), bb.reshape(-1), capacity_words=cap))(
            codes, bitsarr)
        return w.sum() + t.sum()

    # Validate the Mosaic pack kernels on this device first.
    wa, _ = bp.pack_frames_blocks(codes, bitsarr, capacity_words=cap)
    if on_tpu:
        for kwargs in ({"pallas_place": True}, {"pallas_pack": True}):
            wb, _ = bp.pack_frames_blocks(codes, bitsarr,
                                          capacity_words=cap, **kwargs)
            assert np.array_equal(np.asarray(wa), np.asarray(wb)), kwargs
        print("pallas pack kernels: bit-exact vs XLA packer on device")

    timed("coefs (rearrange+FDCT)", lambda: coefs_only(frames), iters)
    timed("symbols (sweep+emit)", lambda: symbols_only(frames, budgets),
          iters)
    timed("pack flat (per-symbol scatter)",
          lambda: pack_flat(codes, bitsarr), iters)
    timed("pack blocks (XLA p1 + scatter)", make_pack(False), iters)
    if on_tpu:
        timed("pack blocks (XLA p1 + pallas place)", make_pack(True),
              iters)
        timed("pack blocks (pallas p1 + scatter)",
              make_pack(False, True), iters)
        timed("pack blocks (pallas p1 + pallas place)",
              make_pack(True, True), iters)
    dt = timed("FULL blocks", make_full("blocks"), iters)
    if on_tpu:
        dt = min(dt, timed("FULL fused (scatter place)",
                           make_full("fused"), iters))
        dt = min(dt, timed("FULL fused_gather",
                           make_full("fused_gather"), iters))
        dt = min(dt, timed("FULL fused_mxu (default)",
                           make_full("fused_mxu"), iters))
        print(f"device-side video: {batch / dt:.1f} fps")


if __name__ == "__main__":
    main()
