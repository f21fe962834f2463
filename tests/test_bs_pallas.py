"""Mosaic scale-sweep kernel vs the XLA sweep (interpret mode on CPU so a
kernel regression fails pytest, not just the TPU bench validation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from psxavenc_tpu.ops import bs as bs_ops
from psxavenc_tpu.ops import bs_pallas as bsp


def _xla_chunk(c, s0):
    """Per-scale AC bit/nonzero totals for scales s0+1..s0+CHUNK."""
    zz = bs_ops.ZAGZIG[1:]
    q = jnp.asarray(bs_ops.QUANT_PSX[zz])
    bits_out, nz_out = [], []
    for i in range(bsp.CHUNK):
        s = s0 + i + 1
        ac = bs_ops._ac_quant(c, (q * min(s, 63))[None, :, None])
        nz = ac != 0
        run = bs_ops._runs(nz, axis=1)
        bits = jnp.where(nz, bs_ops.ac_bits_closed_form(run, jnp.abs(ac)),
                         0)
        bits_out.append(np.asarray(bits.sum(axis=(1, 2))))
        nz_out.append(np.asarray(nz.sum(axis=(1, 2))))
    return np.stack(bits_out, axis=1), np.stack(nz_out, axis=1)


@pytest.mark.parametrize("seed,nb,s0", [(0, bsp.TILE, 0),
                                        (1, bsp.TILE + 100, 16)])
def test_sweep_chunk_pallas_interpret(seed, nb, s0):
    rng = np.random.default_rng(seed)
    c = rng.integers(-3000, 3000, (2, 63, nb)).astype(np.int32)
    got_b, got_n = bsp.sweep_chunk_pallas(jnp.asarray(c), jnp.int32(s0),
                                          interpret=True)
    want_b, want_n = _xla_chunk(jnp.asarray(c), s0)
    assert np.array_equal(np.asarray(got_b), want_b)
    assert np.array_equal(np.asarray(got_n), want_n)


def test_nz_counts_pallas_interpret():
    """Exact nonzero counts for all 63 scales == the quantizer's truth,
    and the lower bound never exceeds the exact closed-form bit total."""
    rng = np.random.default_rng(5)
    c = rng.integers(-3000, 3000, (2, 63, bsp.TILE + 37)).astype(np.int32)
    nz, lb = bsp.nz_counts_pallas(jnp.asarray(c), interpret=True)
    nz, lb = np.asarray(nz), np.asarray(lb)
    zz = bs_ops.ZAGZIG[1:]
    q = jnp.asarray(bs_ops.QUANT_PSX[zz])
    for s in range(1, 64):
        ac = bs_ops._ac_quant(jnp.asarray(c), (q * s)[None, :, None])
        nzm = ac != 0
        want = np.asarray(nzm.sum(axis=(1, 2)))
        assert np.array_equal(nz[:, s - 1], want), s
        run = bs_ops._runs(nzm, axis=1)
        bits = jnp.where(nzm,
                         bs_ops.ac_bits_closed_form(run, jnp.abs(ac)), 0)
        exact = np.asarray(bits.sum(axis=(1, 2)))
        assert (lb[:, s - 1] <= exact).all(), s
        assert (lb[:, s - 1] >= 3 * want).all(), s
