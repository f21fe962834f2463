"""Batch tensor API example: encode many streams/frames in single device
calls, optionally sharded over a device mesh.

Run: PYTHONPATH=/root/.axon_site:. python examples/batch_api.py
"""

import numpy as np

import jax

from psxavenc_tpu import api
from psxavenc_tpu.ops import bs as bs_ops
from psxavenc_tpu.parallel import mesh as pm


def main():
    rng = np.random.default_rng(0)

    # --- 256 independent SPU-ADPCM streams, 100 units (2800 samples) each.
    units = rng.integers(-20000, 20000, (256, 100, 28)).astype(np.int32)
    limits = np.full((256, 100), 28, np.int32)
    zero = np.zeros(256, np.int32)
    blocks, p1, p2 = api.spu_encode_blocks(units, limits, zero, zero)
    print("SPU blocks:", blocks.shape, blocks.dtype)  # (256, 100, 16)

    # --- a batch of BS v2 frames with per-frame byte budgets.
    frames = rng.integers(0, 256, (8, 64 * 64 * 3 // 2)).astype(np.uint8)
    budgets = np.full(8, 4 * 2016, np.int32)
    out = api.bs_encode_frames_packed(frames, budgets, codec=bs_ops.BS_V2,
                                      width=64, height=64,
                                      capacity_words=(4 * 2016 - 8) // 2)
    print("BS scales:", np.asarray(out["scale"]))
    print("packed words:", out["words"].shape, out["words"].dtype)

    # --- the same step sharded over every available chip.
    m = pm.make_mesh()
    step = pm.encode_step_sharded(m, codec=bs_ops.BS_V2, width=64,
                                  height=64)
    n = len(jax.devices())
    B = 2 * n
    codes, bits, hdrs, nibs, stats = step(
        pm.shard_batch(m, np.tile(frames[:1], (B, 1))),
        pm.shard_batch(m, np.full(B, 4 * 2016, np.int32)),
        pm.shard_batch(m, np.tile(units[:1], (B, 1, 1))),
        pm.shard_batch(m, np.full((B, 100), 28, np.int32)),
        pm.shard_batch(m, np.zeros(B, np.int32)),
        pm.shard_batch(m, np.zeros(B, np.int32)))
    print(f"sharded over {n} device(s); stats = {np.asarray(stats)}")


if __name__ == "__main__":
    main()
