#!/usr/bin/env python
"""Stage-level device timing for the BS video pipeline.

Times the fused encode (pixels -> packed words) and its stages on the
current default device. On the axon TPU tunnel, block_until_ready is
unreliable, so every timed program ends in a reduced-scalar checksum that
is fetched to force completion; the (~ms) fetch latency is amortized by
iterating.

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
    print(f"{label:44s} {dt * 1e3:9.2f} ms/batch", flush=True)
    return dt


def calibrate_fetch(jax, jnp):
    """One scalar round-trip through the axon tunnel (subtracted from
    every measurement)."""
    x = jax.device_put(np.zeros(8, np.float32))

    @jax.jit
    def f():
        return x.sum()

    np.asarray(f())
    samples = []
    for _ in range(6):
        t0 = time.monotonic()
        np.asarray(f())
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
    calibrate_fetch(jax, jnp)

    rng = np.random.default_rng(3)
    frames = jax.device_put(
        rng.integers(0, 256, (batch, W * H * 3 // 2)).astype(np.uint8))
    budgets = jax.device_put(np.full(batch, budget, np.int32))

    @jax.jit
    def full(pallas_sweep, pallas_place):
        pass  # placeholder (jit of closures below instead)

    def make_full(sweep, place):
        @jax.jit
        def f():
            out = api.bs_encode_frames_packed(
                frames, budgets, codec=bs_ops.BS_V2, width=W, height=H,
                capacity_words=cap, pallas_sweep=sweep,
                pallas_place=place)
            return (out["words"].astype(jnp.int32).sum()
                    + out["scale"].sum() + out["total_bits"].sum())
        return f

    @jax.jit
    def coefs_only():
        c = api._frames_to_coefs(frames, W, H)
        return c.sum()

    @jax.jit
    def symbols_only():
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

    def make_pack(place):
        @jax.jit
        def f():
            w, t = bp.pack_frames_blocks(codes, bitsarr,
                                         capacity_words=cap,
                                         pallas_place=place)
            return w.sum() + t.sum()
        return f

    @jax.jit
    def pack_legacy():
        w, t = jax.vmap(lambda cc, bb: bp.pack_bits(
            cc.reshape(-1), bb.reshape(-1), capacity_words=cap))(
            codes, bitsarr)
        return w.sum() + t.sum()

    # Validate pallas placement vs XLA placement on this device first.
    wa, ta = bp.pack_frames_blocks(codes, bitsarr, capacity_words=cap,
                                   pallas_place=False)
    if on_tpu:
        wb, tb = bp.pack_frames_blocks(codes, bitsarr, capacity_words=cap,
                                       pallas_place=True)
        assert np.array_equal(np.asarray(wa), np.asarray(wb)), \
            "pallas placement mismatch"
        print("pallas placement: bit-exact vs XLA scatter on device")
    wl, tl = pack_legacy(), None
    del wl

    timed("coefs (rearrange+FDCT)", coefs_only, iters)
    timed("symbols (sweep+emit)", symbols_only, iters)
    timed("pack legacy (per-symbol scatter)", pack_legacy, iters)
    timed("pack blocks (XLA word scatter)", make_pack(False), iters)
    if on_tpu:
        timed("pack blocks (pallas placement)", make_pack(True), iters)
    timed("FULL xla-place", make_full(on_tpu, False), iters)
    if on_tpu:
        dt = timed("FULL pallas-place", make_full(on_tpu, True), iters)
        print(f"device-side video: {batch / dt:.1f} fps")


if __name__ == "__main__":
    main()
