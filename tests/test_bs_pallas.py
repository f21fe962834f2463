"""Mosaic scale-select kernel vs the XLA sweep (interpret mode on CPU so a
kernel regression fails pytest, not just the TPU bench validation)."""

import functools

import numpy as np
import pytest

import jax.numpy as jnp

from psxavenc_tpu.ops import bs as bs_ops
from psxavenc_tpu.ops import bs_pallas as bsp
from psxavenc_tpu.ops import fdct as fdct_ops


def _xla_all_scales(c):
    """Exact per-scale AC bit/nonzero totals for every scale 1..63."""
    zz = bs_ops.ZAGZIG[1:]
    q = jnp.asarray(bs_ops.QUANT_PSX[zz])
    bits_out, nz_out = [], []
    for s in range(1, 64):
        ac = bs_ops._ac_quant(c, (q * s)[None, :, None])
        nz = ac != 0
        run = bs_ops._runs(nz, axis=1)
        bits = jnp.where(nz, bs_ops.ac_bits_closed_form(run, jnp.abs(ac)),
                         0)
        bits_out.append(np.asarray(bits.sum(axis=(1, 2))))
        nz_out.append(np.asarray(nz.sum(axis=(1, 2))))
    return np.stack(bits_out, axis=1), np.stack(nz_out, axis=1)


def _first_fit(bits_ps, nz_ps, thr):
    """Reference first-fit rule over exact per-scale totals."""
    B = bits_ps.shape[0]
    scale = np.full(B, 64, np.int32)
    bits = np.zeros(B, np.int32)
    nz = np.zeros(B, np.int32)
    for f in range(B):
        for i in range(63):
            if bits_ps[f, i] <= thr[f]:
                scale[f] = i + 1
                bits[f] = bits_ps[f, i]
                nz[f] = nz_ps[f, i]
                break
    return scale, bits, nz


@pytest.mark.parametrize("seed,nb", [(0, bsp.TILE), (1, bsp.TILE + 100)])
def test_select_scale_pallas_interpret(seed, nb):
    """The kernel's (scale, bits, nz) match the exact first-fit rule over
    a full XLA sweep, across a spread of thresholds (tight budgets force
    a long in-kernel walk, loose ones an immediate fit)."""
    rng = np.random.default_rng(seed)
    c = rng.integers(-3000, 3000, (2, 63, nb)).astype(np.int32)
    bits_ps, nz_ps = _xla_all_scales(jnp.asarray(c))
    for q in (0.0, 0.3, 0.9):
        # Thresholds between min and max per-scale totals.
        thr = (bits_ps.min(axis=1)
               + q * (bits_ps.max(axis=1) - bits_ps.min(axis=1))
               ).astype(np.int32)
        want = _first_fit(bits_ps, nz_ps, thr)
        got = bsp.select_scale_pallas(jnp.asarray(c), jnp.asarray(thr),
                                      interpret=True)
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), w), q


def test_select_scale_pallas_edges_interpret():
    """Nothing fits -> 64; everything fits -> scale 1; all-zero frames
    fit at scale 1 with zero bits."""
    rng = np.random.default_rng(3)
    c = rng.integers(-3000, 3000, (3, 63, bsp.TILE)).astype(np.int32)
    c[2] = 0
    bits_ps, nz_ps = _xla_all_scales(jnp.asarray(c))
    thr = np.array([-5, 10 ** 8, 0], np.int32)
    got = bsp.select_scale_pallas(jnp.asarray(c), jnp.asarray(thr),
                                  interpret=True)
    scale, bits, nz = (np.asarray(g) for g in got)
    assert scale[0] == 64 and bits[0] == 0 and nz[0] == 0
    assert scale[1] == 1 and bits[1] == bits_ps[1, 0]
    assert nz[1] == nz_ps[1, 0]
    assert scale[2] == 1 and bits[2] == 0 and nz[2] == 0


def test_select_seed_gallop_adversarial_interpret():
    """The cross-frame seeded gallop must stay exact for ADVERSARIAL
    scale sequences: alternating loose/tight budgets (answers jumping
    between 1 and high scales), unfittable frames mid-batch (stored
    seed clamps to 63), and monotone ramps — every frame's answer must
    match the exact first-fit rule regardless of what the previous
    frame seeded."""
    rng = np.random.default_rng(11)
    B = 8
    c = rng.integers(-3000, 3000, (B, 63, bsp.TILE)).astype(np.int32)
    bits_ps, nz_ps = _xla_all_scales(jnp.asarray(c))
    lo = bits_ps.min(axis=1)
    hi = bits_ps.max(axis=1)
    # Per-frame quantiles: alternate extremes, insert unfittable frames,
    # then a ramp.
    q = np.array([1.0, 0.0, 1.0, -1.0, 0.05, 0.95, 0.5, -1.0])
    thr = np.where(q < 0, np.int32(-1),
                   (lo + q * (hi - lo))).astype(np.int32)
    want = _first_fit(bits_ps, nz_ps, thr)
    got = bsp.select_scale_pallas(jnp.asarray(c), jnp.asarray(thr),
                                  interpret=True)
    for name, g, w in zip(("scale", "bits", "nz"), got, want):
        assert np.array_equal(np.asarray(g), w), (name, np.asarray(g), w)


def test_select_speculative_hit_and_drift_interpret():
    """The speculative fused probe (one pass evaluating LB(seed-1) +
    exact(seed)) must stay exact on its designed-for sequences: runs of
    identical frames (every frame after the first is a speculation HIT),
    then +/-1 scale drifts (near-miss seeds), then a sharp jump."""
    rng = np.random.default_rng(23)
    base = rng.integers(-3000, 3000, (1, 63, bsp.TILE)).astype(np.int32)
    B = 10
    c = np.repeat(base, B, axis=0)
    bits_ps, nz_ps = _xla_all_scales(jnp.asarray(c))
    row = bits_ps[0]
    # Threshold hitting scale ~20 exactly for frames 0..5 (hit run),
    # then one frame whose answer is one scale HIGHER (thr just below
    # row[19]), one LOWER (thr at row[18] if that precedes), and a jump
    # to scale 1 and back.
    s_mid = 20
    thr = np.empty(B, np.int32)
    thr[:6] = row[s_mid - 1]
    thr[6] = row[s_mid - 1] - 1          # forces a walk past the seed
    thr[7] = max(row[: s_mid - 1].min(), row[s_mid - 1])  # may fit earlier
    thr[8] = row.max()                    # scale 1 region
    thr[9] = row[s_mid - 1]               # back near the old seed
    want = _first_fit(bits_ps, nz_ps, thr)
    got = bsp.select_scale_pallas(jnp.asarray(c), jnp.asarray(thr),
                                  interpret=True)
    for name, g, w in zip(("scale", "bits", "nz"), got, want):
        assert np.array_equal(np.asarray(g), w), (name, np.asarray(g), w)
    # The hit run really does choose the same scale each time.
    assert (np.asarray(got[0])[:6] == np.asarray(got[0])[0]).all()


def test_ladder_lower_bound_properties():
    """The in-kernel ladder LB never exceeds the exact totals and is
    monotone non-increasing in scale (the two facts that make the
    binary-search start exact-safe)."""
    def g_curve(r):
        return (np.minimum(r, 3) + (r >= 5) + (r >= 8) + (r >= 10)
                + 2 * (r >= 14) + (r >= 17))

    # (a) per-(run, |level|) validity of the per-element bound against
    # the exact closed-form code lengths: bits(r, a) >= w_lb(a) + bonus;
    # and the safety condition g(r+d) - g(r) <= 3 + g(d-1) that makes
    # the whole-frame sum monotone in scale (see ladder_lb's docstring).
    runs = np.arange(0, 64)
    mags = np.arange(1, 600)
    R, A = np.meshgrid(runs, mags, indexing="ij")
    bits = np.asarray(bs_ops.ac_bits_closed_form(
        jnp.asarray(R.astype(np.int32)), jnp.asarray(A.astype(np.int32))))
    w_lb = (3 + 2 * (A >= 2) + (A >= 3) + 2 * (A >= 4) + (A >= 5)
            + 2 * (A >= 7))
    bonus = np.where(R >= 1, np.minimum(A, 3) - 1, 0) + g_curve(R)
    assert (bits >= w_lb + bonus).all()
    gv = g_curve(np.arange(0, 128))
    for d in range(1, 64):
        assert (gv[d:64 + d] - gv[:64] <= 3 + gv[d - 1]).all(), d

    def ladder_np(a, d, half):
        nz = (a >= d - half).astype(np.int64)
        c2 = (a >= 2 * d - half).astype(np.int64)
        c3 = (a >= 3 * d - half).astype(np.int64)
        lb = (3 * nz + 2 * c2 + c3 + 2 * (a >= 4 * d - half)
              + (a >= 5 * d - half) + 2 * (a >= 7 * d - half))
        pos = np.broadcast_to(
            np.arange(1, a.shape[1] + 1)[None, :, None], a.shape)
        nzpos = np.where(nz > 0, pos, 0)
        prev = np.maximum.accumulate(nzpos, axis=1)
        prev_ex = np.roll(prev, 1, axis=1)
        prev_ex[:, 0] = 0
        run = pos - prev_ex - 1
        b = np.where(run >= 1, c2 + c3, 0) + g_curve(run)
        return (lb + nz * b).sum(axis=(1, 2))

    # (b) whole-frame LB <= exact totals and monotone in scale.
    rng = np.random.default_rng(5)
    c = rng.integers(-3000, 3000, (2, 63, bsp.TILE + 37)).astype(np.int32)
    zz = bs_ops.ZAGZIG[1:]
    qv = bs_ops.QUANT_PSX[zz].astype(np.int64)
    a = np.abs(np.asarray(c)).astype(np.int64)
    bits_ps, _ = _xla_all_scales(jnp.asarray(c))
    prev = None
    for s in range(1, 64):
        d = (qv * s)[None, :, None]
        lb = ladder_np(a, d, d >> 1)
        assert (lb <= bits_ps[:, s - 1]).all(), s
        if prev is not None:
            assert (lb <= prev).all(), s  # monotone
        prev = lb


def test_encode_frames_symbols_pallas_matches_xla(monkeypatch):
    """The full pallas_sweep=True path (select kernel + emission) equals
    the XLA sweep path in interpret mode."""
    monkeypatch.setattr(bsp, "select_scale_pallas", functools.partial(
        bsp.select_scale_pallas, interpret=True))
    rng = np.random.default_rng(7)
    B = 2
    W = H = 32
    nb = (W // 16) * (H // 16) * 6
    coefs = rng.integers(-2000, 2000, (B, nb, 64)).astype(np.int32)
    budgets = np.array([1800, 700], np.int32)
    for codec in (bs_ops.BS_V2, bs_ops.BS_V3, bs_ops.BS_V3DC):
        ox = bs_ops.encode_frames_symbols(
            jnp.asarray(coefs), jnp.asarray(budgets), codec=codec,
            pallas_sweep=False)
        op = bs_ops.encode_frames_symbols(
            jnp.asarray(coefs), jnp.asarray(budgets), codec=codec,
            pallas_sweep=True)
        for k in ("scale", "codes", "bits", "nz_count", "total_bits"):
            assert np.array_equal(np.asarray(ox[k]), np.asarray(op[k])), \
                (codec, k)


def test_emit_pack_pallas_interpret(monkeypatch):
    """Fused emit+pack kernel == XLA emit + per-block packer, and the
    full fused api path == the blocks path (interpret mode)."""
    from psxavenc_tpu import api

    monkeypatch.setattr(bsp, "select_scale_pallas", functools.partial(
        bsp.select_scale_pallas, interpret=True))
    monkeypatch.setattr(bsp, "emit_pack_pallas", functools.partial(
        bsp.emit_pack_pallas, interpret=True))
    monkeypatch.setattr(bsp, "select_scale_pix_pallas", functools.partial(
        bsp.select_scale_pix_pallas, interpret=True))
    monkeypatch.setattr(bsp, "dc_stage_pallas", functools.partial(
        bsp.dc_stage_pallas, interpret=True))

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


def test_emit_pack_pallas_multichunk_interpret():
    """The emit kernel's hand-rolled per-frame chunk loop (one grid step
    per frame since r4) at NB > TILE — the production 320x240 shape
    class that the 32x32 api test doesn't reach: chunk-sliced stores of
    streams/bbits must be bit-identical to the XLA per-block packer."""
    from psxavenc_tpu.ops import bitpack as bp

    rng = np.random.default_rng(13)
    B, NB = 2, bsp.TILE + 137                      # 2 chunks, ragged tail
    c = rng.integers(-800, 800, (B, 63, NB)).astype(np.int32)
    scale = np.array([3, 17], np.int32)
    dc_bits = rng.integers(2, 11, (B, NB)).astype(np.int32)
    dc_code = rng.integers(0, 1 << 10, (B, NB)).astype(np.int32) \
        & ((1 << dc_bits) - 1)
    streams, bbits = bsp.emit_pack_pallas(
        jnp.asarray(c), jnp.asarray(scale), jnp.asarray(dc_code),
        jnp.asarray(dc_bits), interpret=True)

    # XLA reference: emit symbols per block, pack densely.
    zz = bs_ops.ZAGZIG[1:]
    q = jnp.asarray(bs_ops.QUANT_PSX[zz])
    for b in range(B):
        ac = np.asarray(bs_ops._ac_quant(
            jnp.asarray(c[b:b + 1]), (q * int(scale[b]))[None, :, None])
        )[0]
        ac = np.clip(ac, -0x200, 0x1FE)
        nzm = ac != 0
        run = np.zeros_like(ac)
        for col in range(NB):
            r = 0
            for i in range(63):
                if nzm[i, col]:
                    run[i, col] = r
                    r = 0
                else:
                    r += 1
        bits_nz = np.asarray(bs_ops.ac_bits_closed_form(
            jnp.asarray(run), jnp.asarray(np.abs(ac))))
        code_nz = np.asarray(bs_ops.ac_code_closed_form(
            jnp.asarray(run), jnp.asarray(ac),
            jnp.asarray(bits_nz))).astype(np.uint32)
        codes = np.zeros((NB, 65), np.uint32)
        bl = np.zeros((NB, 65), np.int32)
        codes[:, 0] = dc_code[b]
        bl[:, 0] = dc_bits[b]
        for col in range(NB):
            k = 1
            for i in range(63):
                if nzm[i, col]:
                    codes[col, k] = code_nz[i, col]
                    bl[col, k] = bits_nz[i, col]
                    k += 1
            codes[col, k] = 0x2
            bl[col, k] = 2
        offs = np.cumsum(bl, axis=1) - bl
        ref_s = np.asarray(bp._pack_block_streams(
            jnp.asarray(codes), jnp.asarray(bl), jnp.asarray(offs),
            bcap=bp.BLOCK_CAP_WORDS))
        assert np.array_equal(bl.sum(axis=1), np.asarray(bbits)[b]), b
        assert np.array_equal(ref_s.astype(np.uint32) & 0xFFFF,
                              np.asarray(streams)[b].astype(np.uint32)
                              & 0xFFFF), b


def _rand_pix(rng, B, NB):
    """Random centered pixels in the valid [-128, 127] range."""
    return rng.integers(-128, 128, (B, 64, NB)).astype(np.int32)


def test_select_scale_pix_pallas_interpret():
    """The fused FDCT+select kernel == the coefs-input select kernel on
    the (bit-identical) FDCT of the same pixels, including a ragged tail
    chunk and unfittable/loose thresholds; its coefficient output (the
    emit kernel's input) matches the explicit XLA row-form FDCT."""
    rng = np.random.default_rng(21)
    B, NB = 3, bsp.TILE + 73
    pix = _rand_pix(rng, B, NB)
    c = bs_ops.pixrows_to_coefs_zz(jnp.asarray(pix))
    bits_ps, _ = _xla_all_scales(c)
    thr = np.array([bits_ps[0].min(),
                    int(bits_ps[1].min() * 0.4 + bits_ps[1].max() * 0.6),
                    -1], np.int32)
    want = bsp.select_scale_pallas(c, jnp.asarray(thr), interpret=True)
    *got, c64 = bsp.select_scale_pix_pallas(
        jnp.asarray(pix), jnp.asarray(thr), interpret=True)
    for name, g, w in zip(("scale", "bits", "nz"), got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w)), name
    c64 = np.asarray(c64)
    assert np.array_equal(c64[:, :63, :NB], np.asarray(c))
    assert (c64[:, 63, :] == 0).all()
    assert (c64[:, :, NB:] == 0).all()


def test_emit_pack_pallas_on_select_coefs_interpret():
    """emit_pack_pallas fed the select kernel's (B, 64, nb_pad)
    coefficient output (wide lanes, zero pad row) == emit_pack_pallas
    on the explicit (B, 63, NB) coefficients (multi-chunk, ragged
    tail)."""
    rng = np.random.default_rng(22)
    B, NB = 2, bsp.TILE + 137
    pix = _rand_pix(rng, B, NB)
    c = bs_ops.pixrows_to_coefs_zz(jnp.asarray(pix))
    thr = jnp.asarray(np.full(B, 10 ** 8, np.int32))
    *_, c64 = bsp.select_scale_pix_pallas(jnp.asarray(pix), thr,
                                          interpret=True)
    scale = jnp.asarray(np.array([2, 29], np.int32))
    dc_bits = rng.integers(2, 11, (B, NB)).astype(np.int32)
    dc_code = (rng.integers(0, 1 << 10, (B, NB)).astype(np.int32)
               & ((1 << dc_bits) - 1))
    want = bsp.emit_pack_pallas(c, scale, jnp.asarray(dc_code),
                                jnp.asarray(dc_bits), interpret=True)
    got = bsp.emit_pack_pallas(c64, scale, jnp.asarray(dc_code),
                               jnp.asarray(dc_bits), interpret=True)
    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_select_frames_pixels_matches_symbols(monkeypatch):
    """select_frames_pixels (pixel-sum DC stage + fused kernel) returns
    the same selection metadata as encode_frames_symbols(emit=False) on
    the explicit coefficients, for all three codecs."""
    monkeypatch.setattr(bsp, "select_scale_pallas", functools.partial(
        bsp.select_scale_pallas, interpret=True))
    monkeypatch.setattr(bsp, "select_scale_pix_pallas", functools.partial(
        bsp.select_scale_pix_pallas, interpret=True))
    monkeypatch.setattr(bsp, "dc_stage_pallas", functools.partial(
        bsp.dc_stage_pallas, interpret=True))
    rng = np.random.default_rng(23)
    B, W, H = 2, 48, 32
    nb = (W // 16) * (H // 16) * 6
    frames = rng.integers(0, 256, (B, W * H * 3 // 2)).astype(np.uint8)
    budgets = jnp.asarray(np.array([2000, 800], np.int32))
    pix = jnp.stack([bs_ops.rearrange_nv21_rows(jnp.asarray(f), W, H)
                     for f in frames])
    coefs = jnp.stack([
        fdct_ops.fdct_islow(
            bs_ops.rearrange_nv21_frame(jnp.asarray(f), W, H)
        ).reshape(nb, 64) for f in frames])
    for codec in (bs_ops.BS_V2, bs_ops.BS_V3, bs_ops.BS_V3DC):
        want = bs_ops.encode_frames_symbols(
            coefs, budgets, codec=codec, pallas_sweep=True, emit=False)
        got = bs_ops.select_frames_pixels(pix, budgets, codec=codec)
        for k in ("scale", "scale_idx", "nz_count", "total_bits",
                  "dc_bits", "dc_code"):
            assert np.array_equal(np.asarray(got[k]),
                                  np.asarray(want[k])), (codec, k)


@pytest.mark.parametrize("codec", [bs_ops.BS_V3, bs_ops.BS_V3DC])
def test_dc_stage_pallas_interpret(codec):
    """The one-launch Mosaic DC chain == the XLA associative-scan stage
    (bs._dc_stage) for v3 and v3dc, including non-multiple-of-8 batches
    and the +-256 wrap deltas."""
    rng = np.random.default_rng(31)
    B, mb = 5, 37                       # NB = 222 blocks, B pads to 8
    dc_q = rng.integers(-512, 511, (B, 6 * mb)).astype(np.int32)
    # Force some exact-half (+-256-wrap-prone) deltas.
    dc_q[0, :12] = np.array([510, -510, 2, -2, 254, -254, 6, 510, -2,
                             2, -510, 254], np.int32)
    want_b, want_c = bs_ops._dc_stage(jnp.asarray(dc_q), codec)
    got_b, got_c = bsp.dc_stage_pallas(jnp.asarray(dc_q), codec,
                                       interpret=True)
    assert np.array_equal(np.asarray(got_b), np.asarray(want_b))
    assert np.array_equal(np.asarray(got_c), np.asarray(want_c))


def test_emit_prep_pallas_interpret(monkeypatch):
    """The emit kernel's fused placement prep (frame-global offsets via
    lane cumsum, EOF block injection, funnel shift to sub-word
    alignment, LE u16-pair packing) == the XLA flow (EOF append +
    cumsum + bitpack.streams_to_u32 on the emit kernel's streams), and
    the full fused_mxu/fused_gather api paths == the blocks path."""
    import functools as ft

    from psxavenc_tpu import api
    from psxavenc_tpu.ops import bitpack as bp
    from psxavenc_tpu.ops import bitpack_pallas as bpk

    rng = np.random.default_rng(41)
    B, NB = 2, bsp.TILE + 73
    c = rng.integers(-900, 900, (B, 63, NB)).astype(np.int32)
    scale = jnp.asarray(np.array([2, 31], np.int32))
    dc_bits = rng.integers(2, 11, (B, NB)).astype(np.int32)
    dc_code = (rng.integers(0, 1 << 10, (B, NB)).astype(np.int32)
               & ((1 << dc_bits) - 1))
    eof = 0x1FF

    streams, bbits = bsp.emit_pack_pallas(
        jnp.asarray(c), scale, jnp.asarray(dc_code),
        jnp.asarray(dc_bits), interpret=True)
    eof_stream = jnp.zeros((B, 1, streams.shape[2]),
                           jnp.int32).at[:, 0, 0].set(eof << 6)
    st = jnp.concatenate([streams, eof_stream], axis=1)
    bb = jnp.concatenate([bbits, jnp.full((B, 1), 10, jnp.int32)],
                         axis=1)
    goff = jnp.cumsum(bb, axis=1) - bb
    vals_ref, e0_ref = bp.streams_to_u32(st.astype(jnp.uint32), goff)

    vals, e0, bb_got, total = bsp.emit_prep_pallas(
        jnp.asarray(c), scale, jnp.asarray(dc_code),
        jnp.asarray(dc_bits), eof=eof, interpret=True)
    n1 = NB + 1
    assert np.array_equal(np.asarray(vals)[:, :n1].astype(np.uint32),
                          np.asarray(vals_ref))
    assert np.array_equal(np.asarray(e0)[:, :n1], np.asarray(e0_ref))
    assert (np.asarray(vals)[:, n1:] == 0).all()
    assert np.array_equal(np.asarray(bb_got), np.asarray(bbits))
    assert np.array_equal(np.asarray(total),
                          np.asarray(goff[:, -1] + 10))

    # Full api path: fused_mxu and fused_gather (prep + vals placement)
    # vs the XLA blocks packer.
    for fn in ("select_scale_pallas", "select_scale_pix_pallas",
               "dc_stage_pallas", "emit_pack_pallas",
               "emit_prep_pallas"):
        monkeypatch.setattr(bsp, fn, ft.partial(getattr(bsp, fn),
                                                interpret=True))
    for fn in ("place_vals_mxu_pallas", "place_vals_gather_pallas"):
        monkeypatch.setattr(bpk, fn, ft.partial(getattr(bpk, fn),
                                                interpret=True))
    W = H = 32
    frames = rng.integers(0, 256, (B, W * H * 3 // 2)).astype(np.uint8)
    budgets = np.array([2200, 900], np.int32)
    cap = (2200 - 8) // 2
    for codec in (bs_ops.BS_V2, bs_ops.BS_V3DC):
        want = api.bs_encode_frames_packed(
            jnp.asarray(frames), jnp.asarray(budgets), codec=codec,
            width=W, height=H, capacity_words=cap, pallas_sweep=True,
            packer="blocks")
        for packer in ("fused_mxu", "fused_gather"):
            got = api.bs_encode_frames_packed(
                jnp.asarray(frames), jnp.asarray(budgets), codec=codec,
                width=W, height=H, capacity_words=cap,
                pallas_sweep=True, packer=packer)
            for k in ("scale", "words", "total_bits", "nz_count"):
                assert np.array_equal(np.asarray(want[k]),
                                      np.asarray(got[k])), (codec,
                                                            packer, k)
