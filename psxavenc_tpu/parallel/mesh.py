"""Multi-chip scaling: batch-axis sharding over a device mesh.

The encoder's compute is embarrassingly parallel across streams and frames
(SURVEY §2.2): codec state threads only along time *within* a stream, so a
1-D mesh sharding the batch axis scales without any compute-path
collectives. Shardings are declared with NamedSharding/PartitionSpec and
jit inserts the data movement; the only collective is a tiny psum of
per-shard statistics (encoded sizes, quant-scale sums) so callers get
global aggregates without gathering payloads to one host.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import api

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

BATCH_AXIS = "batch"


def make_mesh(devices=None):
    """1-D device mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (BATCH_AXIS,))


def shard_batch(mesh, array):
    """Place ``array`` with its leading axis sharded over the mesh."""
    return jax.device_put(array, NamedSharding(mesh, P(BATCH_AXIS)))


def _replicated(mesh):
    return NamedSharding(mesh, P())


def packed_video_step(mesh, *, codec, width, height, capacity_words,
                      pallas_sweep=False, packer=None):
    """The production sharded video encoder: pixels in, packed bitstream
    words out, batch axis split over the mesh via shard_map (each device
    runs the fused pipeline — incl. its Pallas kernels — on its local
    shard; no compute-path collectives, SURVEY §2.2). The batch dimension
    must be a multiple of the mesh size; callers pad.

    Byte-for-byte identical to the single-device encoder — asserted by
    tests/test_parallel.py and by every golden video test when the test
    mesh has >1 device."""
    spec = P(BATCH_AXIS)
    fn = partial(api.bs_encode_frames_packed, codec=codec, width=width,
                 height=height, capacity_words=capacity_words,
                 pallas_sweep=pallas_sweep, packer=packer)
    out_specs = {"scale": spec, "words": spec, "total_bits": spec,
                 "nz_count": spec}
    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(spec, spec),
                             out_specs=out_specs))


def unit_encode_step(mesh, *, filter_count, shift_range):
    """Sharded ADPCM unit encoder for file batches: (B, T, 28) units ->
    per-unit headers/nibbles/decoder-states with the batch axis over the
    mesh. Consumed by psxavenc_tpu.batch's grouped audio encode (many
    files' channel streams concatenated on B; streams are independent,
    so no compute-path collectives)."""
    from ..ops import adpcm as adpcm_ops

    spec = P(BATCH_AXIS)
    fn = partial(adpcm_ops.encode_units_scan, filter_count=filter_count,
                 shift_range=shift_range)
    return jax.jit(shard_map(fn, mesh=mesh,
                             in_specs=(spec, spec, spec, spec),
                             out_specs=(spec, spec, spec, spec)))


def encode_step_sharded(mesh, *, codec, width, height):
    """Build the full batched A/V encode step, jitted over the mesh.

    The step consumes a batch of video frames and a batch of audio unit
    streams (both sharded on the leading axis) and produces per-item
    encoder outputs plus globally-reduced statistics. This is the
    "training step" analog for this framework: one fused device program
    covering both codec families.
    """
    batch = NamedSharding(mesh, P(BATCH_AXIS))
    repl = _replicated(mesh)

    @partial(jax.jit,
             in_shardings=(batch, batch, batch, batch, batch, batch),
             out_shardings=(batch, batch, batch, batch, repl))
    def step(frames, budgets, units, limits, prev1, prev2):
        video = api.bs_encode_frames(frames, budgets, codec=codec,
                                     width=width, height=height)
        headers, nibbles, p1, p2 = api.spu_encode_batch(units, limits,
                                                        prev1, prev2)
        # Global aggregates ride a cross-chip reduction (the only
        # collective the algorithm needs).
        stats = jnp.stack([
            jnp.sum(video["total_bits"]),
            jnp.sum(video["scale"]),
            jnp.sum(headers.astype(jnp.int32) & 0xF),
        ])
        return video["codes"], video["bits"], headers, nibbles, stats

    return step
