"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np

import jax

from psxavenc_tpu import api
from psxavenc_tpu.ops import bs as bs_ops
from psxavenc_tpu.parallel import mesh as pm


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """The sharded step must produce the same bytes as local vmap."""
    rng = np.random.default_rng(1)
    width = height = 32
    B, T = 8, 3
    frames = rng.integers(0, 256,
                          (B, width * height * 3 // 2)).astype(np.uint8)
    budgets = np.full(B, 4 * 2016, dtype=np.int32)
    units = rng.integers(-3000, 3000, (B, T, 28)).astype(np.int32)
    limits = np.full((B, T), 28, dtype=np.int32)
    z = np.zeros(B, np.int32)

    mesh = pm.make_mesh()
    step = pm.encode_step_sharded(mesh, codec=bs_ops.BS_V2, width=width,
                                  height=height)
    s_codes, s_bits, s_hdrs, s_nibs, _ = step(
        pm.shard_batch(mesh, frames), pm.shard_batch(mesh, budgets),
        pm.shard_batch(mesh, units), pm.shard_batch(mesh, limits),
        pm.shard_batch(mesh, z), pm.shard_batch(mesh, z))

    video = api.bs_encode_frames(frames, budgets, codec=bs_ops.BS_V2,
                                 width=width, height=height)
    hdrs, nibs, _, _ = api.spu_encode_batch(units, limits, z, z)

    assert np.array_equal(np.asarray(s_codes), np.asarray(video["codes"]))
    assert np.array_equal(np.asarray(s_bits), np.asarray(video["bits"]))
    assert np.array_equal(np.asarray(s_hdrs), np.asarray(hdrs))
    assert np.array_equal(np.asarray(s_nibs), np.asarray(nibs))


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    scale = int(out[0])
    assert 1 <= scale <= 63

def test_packed_video_step_sharded_files():
    """8 independent files' frames encode in ONE sharded step (one frame
    per device) and the packed bitstreams match the single-device
    encoder bit-for-bit (VERDICT round-1 item 7)."""
    rng = np.random.default_rng(9)
    width = height = 48
    B = 8
    cap = (4 * 2016 - 8) // 2
    frames = rng.integers(0, 256,
                          (B, width * height * 3 // 2)).astype(np.uint8)
    budgets = np.full(B, 4 * 2016, dtype=np.int32)

    mesh = pm.make_mesh()
    step = pm.packed_video_step(mesh, codec=bs_ops.BS_V2, width=width,
                                height=height, capacity_words=cap)
    sharded = step(pm.shard_batch(mesh, frames),
                   pm.shard_batch(mesh, budgets))
    local = api.bs_encode_frames_packed(
        frames, budgets, codec=bs_ops.BS_V2, width=width, height=height,
        capacity_words=cap, pallas_sweep=False)
    for k in ("words", "scale", "total_bits", "nz_count"):
        assert np.array_equal(np.asarray(sharded[k]),
                              np.asarray(local[k])), k


def test_bs_frame_encoder_autoshards():
    """With 8 devices the CLI's frame encoder shards its chunk batch; the
    assembled frames must be identical to the plain batched encode (every
    golden video test also exercises this path on the test mesh)."""
    from psxavenc_tpu.models.bs_video import BsFrameEncoder

    rng = np.random.default_rng(4)
    width = height = 32
    enc = BsFrameEncoder(bs_ops.BS_V2, width, height)
    assert len(enc._devices) == 8
    frames = [rng.integers(0, 256, width * height * 3 // 2).astype(
        np.uint8) for _ in range(5)]
    budgets = [4 * 2016] * 5
    results = enc.encode_frames(frames, budgets)

    out = api.bs_encode_frames_packed(
        np.stack(frames), np.asarray(budgets, np.int32),
        codec=bs_ops.BS_V2, width=width, height=height,
        capacity_words=(4 * 2016 - 8) // 2, pallas_sweep=False)
    for i, (buf, info) in enumerate(results):
        assert info["quant_scale"] == int(out["scale"][i])
        payload = np.asarray(out["words"][i]).astype("<u2").tobytes()
        assert bytes(buf[8:]) == payload[:len(buf) - 8]


def test_bs_frame_encoder_uploader_ordering_and_errors():
    """The double-buffered uploader thread must preserve result order
    across many chunks, and an unfittable frame's RuntimeError must
    propagate through the worker-thread future (not hang or reorder)."""
    import pytest

    from psxavenc_tpu.models.bs_video import BsFrameEncoder

    rng = np.random.default_rng(9)
    width = height = 32
    enc = BsFrameEncoder(bs_ops.BS_V2, width, height)
    n = 70  # 3 chunks of 32 on the 8-device mesh
    frames = [rng.integers(0, 256, width * height * 3 // 2).astype(
        np.uint8) for _ in range(n)]
    budgets = [4 * 2016] * n
    results = enc.encode_frames(frames, budgets)
    assert len(results) == n

    out = api.bs_encode_frames_packed(
        np.stack(frames), np.asarray(budgets, np.int32),
        codec=bs_ops.BS_V2, width=width, height=height,
        capacity_words=(4 * 2016 - 8) // 2, pallas_sweep=False)
    for i, (buf, info) in enumerate(results):
        assert info["quant_scale"] == int(out["scale"][i]), i

    # A budget too small for noise even at scale 63: the reference
    # asserts (mdec.c:723); we raise — across the threaded pipeline.
    with pytest.raises(RuntimeError, match="quant scale 63"):
        enc.encode_frames(frames[:3], [64] * 3)
