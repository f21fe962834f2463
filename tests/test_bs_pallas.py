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


def test_lb_probe_pallas_interpret():
    """The probed lower bounds match a direct evaluation, never exceed
    the exact closed-form bit totals, and are monotone in scale."""
    rng = np.random.default_rng(5)
    c = rng.integers(-3000, 3000, (2, 63, bsp.TILE + 37)).astype(np.int32)
    lb = np.asarray(bsp.lb_probe_pallas(jnp.asarray(c), interpret=True))
    zz = bs_ops.ZAGZIG[1:]
    qv = bs_ops.QUANT_PSX[zz]
    a = np.abs(np.asarray(c))
    prev = None
    for i, sidx in enumerate(bsp.LB_PROBES):
        sc = sidx + 1
        d = (qv * sc)[None, :, None]
        half = d >> 1
        want = (3 * (a >= d - half) + 2 * (a >= 2 * d - half)
                + (a >= 3 * d - half) + 2 * (a >= 4 * d - half)
                + (a >= 5 * d - half)).sum(axis=(1, 2))
        assert np.array_equal(lb[:, i], want), sidx
        ac = bs_ops._ac_quant(jnp.asarray(c), jnp.asarray(d))
        nzm = ac != 0
        run = bs_ops._runs(nzm, axis=1)
        bits = jnp.where(nzm,
                         bs_ops.ac_bits_closed_form(run, jnp.abs(ac)), 0)
        exact = np.asarray(bits.sum(axis=(1, 2)))
        assert (lb[:, i] <= exact).all(), sidx
        if prev is not None:
            assert (lb[:, i] <= prev).all(), sidx  # monotone
        prev = lb[:, i]


def test_emit_pack_pallas_interpret(monkeypatch):
    """Fused emit+pack kernel == XLA emit + per-block packer, and the
    full fused api path == the blocks path (interpret mode)."""
    import functools

    import jax

    from psxavenc_tpu import api
    from psxavenc_tpu.ops import bitpack

    monkeypatch.setattr(bsp, "sweep_chunk_pallas", functools.partial(
        bsp.sweep_chunk_pallas, interpret=True))
    monkeypatch.setattr(bsp, "lb_probe_pallas", functools.partial(
        bsp.lb_probe_pallas, interpret=True))
    monkeypatch.setattr(bsp, "emit_pack_pallas", functools.partial(
        bsp.emit_pack_pallas, interpret=True))

    rng = np.random.default_rng(11)
    B = 2
    W = H = 32
    frames = rng.integers(0, 256, (B, W * H * 3 // 2)).astype(np.uint8)
    budgets = np.array([2200, 900], np.int32)
    cap = (2200 - 8) // 2
    for codec in (bs_ops.BS_V2, bs_ops.BS_V3):
        blocks = api.bs_encode_frames_packed(
            jnp.asarray(frames), jnp.asarray(budgets), codec=codec,
            width=W, height=H, capacity_words=cap, pallas_sweep=True,
            packer="blocks")
        fused = api.bs_encode_frames_packed(
            jnp.asarray(frames), jnp.asarray(budgets), codec=codec,
            width=W, height=H, capacity_words=cap, pallas_sweep=True,
            packer="fused")
        for k in ("scale", "words", "total_bits", "nz_count"):
            assert np.array_equal(np.asarray(blocks[k]),
                                  np.asarray(fused[k])), (codec, k)


def test_sweep_chunk_thresholded_interpret():
    """With per-frame thresholds: the first fitting scale is exact,
    unfit scales report totals > thr (possibly partial), and scales
    above the first fit are skipped with an over-threshold sentinel —
    everything first-fit selection needs, nothing more."""
    rng = np.random.default_rng(9)
    # Two tiles so abandonment (a tile-granular decision) actually
    # triggers: scales whose first-tile partial exceeds thr skip tile 2.
    c = rng.integers(-3000, 3000, (2, 63, 2 * bsp.TILE)).astype(np.int32)
    exact_b, exact_n = bsp.sweep_chunk_pallas(jnp.asarray(c), jnp.int32(0),
                                              interpret=True)
    exact_b = np.asarray(exact_b)
    # Pick thresholds mid-range so some scales are abandoned per frame.
    thr = np.array([int(exact_b[0, bsp.CHUNK // 2]),
                    int(exact_b[1, 1])], np.int32)
    got_b, got_n = bsp.sweep_chunk_pallas(jnp.asarray(c), jnp.int32(0),
                                          jnp.asarray(thr), interpret=True)
    got_b = np.asarray(got_b)
    for f in range(2):
        fit_seen = False
        for i in range(bsp.CHUNK):
            if fit_seen:
                # Scales above the first fit are irrelevant to first-fit
                # selection and report an over-threshold sentinel.
                assert got_b[f, i] > thr[f], (f, i)
            elif exact_b[f, i] <= thr[f]:
                # The first fitting scale is exact.
                assert got_b[f, i] == exact_b[f, i], (f, i)
                fit_seen = True
            else:
                # Unfit scales report (possibly partial) totals > thr.
                assert got_b[f, i] > thr[f], (f, i)
