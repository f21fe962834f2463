#!/usr/bin/env python
"""Standalone device timing + bit-exactness check for the ADPCM kernel.

Usage: python tools/audio_kernel_bench.py [batch] [t_units]
Prints Gsamples/s with the same checksum-forced timing discipline as
bench.py (block_until_ready is unreliable on axon).
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    t_units = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from psxavenc_tpu.ops import adpcm as ops
    from psxavenc_tpu.ops import adpcm_pallas as pk

    print("device:", jax.devices()[0], flush=True)

    # --- bit-exactness, all three production variants.
    rng = np.random.default_rng(7)
    for fc, sr in ((5, 12), (4, 12), (4, 8)):
        B, T = 128, 3
        units = rng.integers(-20000, 20000, (B, T, 28)).astype(np.int32)
        limits = np.full((B, T), 28, np.int32)
        limits[0, -1] = 9
        z = np.zeros(B, np.int32)
        args = tuple(jnp.asarray(a) for a in (units, limits, z, z))
        h_ref, n_ref, s1r, s2r = ops.encode_units_scan(
            *args, filter_count=fc, shift_range=sr)
        h, w, s1, s2 = pk.encode_units_pallas(
            *args, filter_count=fc, shift_range=sr)
        assert np.array_equal(np.asarray(h), np.asarray(h_ref)), (fc, sr)
        assert np.array_equal(np.asarray(s1), np.asarray(s1r)), (fc, sr)
        assert np.array_equal(np.asarray(s2), np.asarray(s2r)), (fc, sr)
        wn = np.asarray(w).astype(np.uint32)
        vbits = 4 if sr == 12 else 8
        pw = 32 // vbits
        mask = (1 << vbits) - 1
        vals = np.zeros((B, T, 28), np.uint32)
        for k in range(wn.shape[2]):
            for m in range(pw):
                idx = pw * k + m
                if idx < 28:
                    vals[:, :, idx] = (wn[:, :, k] >> (vbits * m)) & mask
        assert np.array_equal(
            vals & mask, np.asarray(n_ref).astype(np.uint32) & mask), \
            (fc, sr)
        print(f"bit-exact on device: fc={fc} sr={sr}", flush=True)

    # --- throughput (same synthetic load as bench.measure_ours_audio).
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

    np.asarray(run(units, limits, z, z))
    for rep in range(3):
        t0 = time.monotonic()
        iters = 0
        while True:
            np.asarray(run(units, limits, z, z))
            iters += 1
            dt = time.monotonic() - t0
            if dt >= 2.0 or iters >= 50:
                break
        msps = batch * t_units * 28 * iters / dt / 1e6
        print(f"rep {rep}: {msps:.0f} Msamples/s ({iters} iters)",
              flush=True)


if __name__ == "__main__":
    main()
