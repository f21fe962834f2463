#!/usr/bin/env python
"""Fine-grained stage timing for the fused_gather video pipeline.

Same measurement discipline as profile_video.py (pipelined launches, one
checksum fetch, calibrated fetch baseline, arrays as jit arguments).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

_FETCH_BASELINE = [0.0]


def timed(label, fn, iters):
    np.asarray(fn())
    t0 = time.monotonic()
    last = None
    for _ in range(iters):
        last = fn()
    np.asarray(last)
    dt = (time.monotonic() - t0 - _FETCH_BASELINE[0]) / iters
    print(f"{label:44s} {dt * 1e3:9.2f} ms/batch", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from psxavenc_tpu import api
    from psxavenc_tpu.ops import bitpack as bp
    from psxavenc_tpu.ops import bitpack_pallas as bpk
    from psxavenc_tpu.ops import bs as bs_ops
    from psxavenc_tpu.ops import bs_pallas

    W, H, budget = 320, 240, 18144
    cap = (budget - 8) // 2
    dev = jax.devices()[0]
    print(f"device: {dev}  batch={batch} iters={iters}", flush=True)

    rng = np.random.default_rng(3)
    frames = jax.device_put(
        rng.integers(0, 256, (batch, W * H * 3 // 2)).astype(np.uint8))
    budgets = jax.device_put(np.full(batch, budget, np.int32))

    @jax.jit
    def probe_fetch(x):
        return x.sum()

    np.asarray(probe_fetch(budgets))
    samples = []
    for _ in range(6):
        t0 = time.monotonic()
        np.asarray(probe_fetch(budgets))
        samples.append(time.monotonic() - t0)
    _FETCH_BASELINE[0] = sorted(samples)[len(samples) // 2]
    print(f"fetch baseline: {_FETCH_BASELINE[0] * 1e3:.1f} ms", flush=True)

    @jax.jit
    def coefs_only(frames):
        return api._frames_to_coefs(frames, W, H).sum()

    @jax.jit
    def select_only(frames, budgets):
        c = api._frames_to_coefs(frames, W, H)
        sel = bs_ops.encode_frames_symbols(c, budgets, codec=bs_ops.BS_V2,
                                           pallas_sweep=True, emit=False)
        return sel["scale"].sum() + sel["total_bits"].sum()

    @jax.jit
    def thru_emit(frames, budgets):
        c = api._frames_to_coefs(frames, W, H)
        sel = bs_ops.encode_frames_symbols(c, budgets, codec=bs_ops.BS_V2,
                                           pallas_sweep=True, emit=False)
        streams, bbits = bs_pallas.emit_pack_pallas(
            sel["c"], sel["scale_idx"] + 1, sel["dc_code"], sel["dc_bits"])
        return streams.astype(jnp.int32).sum() + bbits.sum()

    @jax.jit
    def thru_u32(frames, budgets):
        c = api._frames_to_coefs(frames, W, H)
        sel = bs_ops.encode_frames_symbols(c, budgets, codec=bs_ops.BS_V2,
                                           pallas_sweep=True, emit=False)
        streams, bbits = bs_pallas.emit_pack_pallas(
            sel["c"], sel["scale_idx"] + 1, sel["dc_code"], sel["dc_bits"])
        B = streams.shape[0]
        eof_stream = jnp.zeros((B, 1, streams.shape[2]),
                               jnp.int32).at[:, 0, 0].set(0x1FF << 6)
        streams = jnp.concatenate([streams, eof_stream], axis=1)
        bbits = jnp.concatenate(
            [bbits, jnp.full((B, 1), 10, jnp.int32)], axis=1)
        goff = jnp.cumsum(bbits, axis=1) - bbits
        vals32, e0 = bp.streams_to_u32(streams, goff)
        return vals32.astype(jnp.int32).sum() + e0.sum()

    @jax.jit
    def full(frames, budgets):
        out = api.bs_encode_frames_packed(
            frames, budgets, codec=bs_ops.BS_V2, width=W, height=H,
            capacity_words=cap, pallas_sweep=True, packer="fused_gather")
        return (out["words"].astype(jnp.int32).sum() + out["scale"].sum())

    @jax.jit
    def full_mxu(frames, budgets):
        out = api.bs_encode_frames_packed(
            frames, budgets, codec=bs_ops.BS_V2, width=W, height=H,
            capacity_words=cap, pallas_sweep=True, packer="fused_mxu")
        return (out["words"].astype(jnp.int32).sum() + out["scale"].sum())

    @jax.jit
    def pixrows_only(frames):
        return api._frames_to_pixrows(frames, W, H).sum()

    @jax.jit
    def select_pix_only(frames, budgets):
        pix = api._frames_to_pixrows(frames, W, H)
        sel = bs_ops.select_frames_pixels(pix, budgets,
                                          codec=bs_ops.BS_V2)
        return sel["scale"].sum() + sel["total_bits"].sum()

    @jax.jit
    def thru_emit_pix(frames, budgets):
        pix = api._frames_to_pixrows(frames, W, H)
        sel = bs_ops.select_frames_pixels(pix, budgets,
                                          codec=bs_ops.BS_V2)
        streams, bbits = bs_pallas.emit_pack_pallas(
            sel["c64"], sel["scale_idx"] + 1, sel["dc_code"],
            sel["dc_bits"])
        return streams.astype(jnp.int32).sum() + bbits.sum()

    timed("coefs", lambda: coefs_only(frames), iters)
    timed("+select (pallas)", lambda: select_only(frames, budgets), iters)
    timed("+emit_pack", lambda: thru_emit(frames, budgets), iters)
    timed("pixrows", lambda: pixrows_only(frames), iters)
    timed("+select_pix (fused FDCT)",
          lambda: select_pix_only(frames, budgets), iters)
    timed("+emit_pack_pix (fused FDCT)",
          lambda: thru_emit_pix(frames, budgets), iters)
    timed("+u32 prep (XLA)", lambda: thru_u32(frames, budgets), iters)
    timed("FULL fused_gather", lambda: full(frames, budgets), iters)
    dt = timed("FULL fused_mxu", lambda: full_mxu(frames, budgets),
               iters)
    print(f"device-side video: {batch / dt:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
