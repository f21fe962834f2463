"""Native C++ BS video encoder tier (psxn_bs_encode_frames).

The no-TPU fallback for the whole video pipeline must be bit-identical
to the device pipeline (api.bs_encode_frames_packed): same FDCT
(mdec.c:524-548 islow variant), same first-fit scale (mdec.c:663-723),
same Huffman emission and 16-bit packing (mdec.c:321-385). The XLA
formulation is dispatch-bound off-TPU; this tier is what CPU-only hosts
actually run, so it gets its own cross-checks here (the golden CLI
suites exercise it end-to-end against the reference binary too).
"""

import numpy as np
import pytest

import jax

from psxavenc_tpu import api, native
from psxavenc_tpu.models.bs_video import BsFrameEncoder
from psxavenc_tpu.ops import bs as bs_ops

from conftest import rand_frames

W, H = 320, 240


def _to_nv21(planes, w=W, h=H):
    y, cb, cr = planes
    yv = np.asarray(y).reshape(h, w)
    cbp = np.asarray(cb).reshape(h // 2, w // 2)
    crp = np.asarray(cr).reshape(h // 2, w // 2)
    c = np.stack([crp, cbp], axis=-1).reshape(-1)
    return np.concatenate([yv.reshape(-1), c]).astype(np.uint8)


def _frames(n, w=W, h=H, seed=3):
    rng = np.random.default_rng(seed)
    structured = [_to_nv21(f, w, h) for f in rand_frames(w, h, n - 1,
                                                         seed=seed)]
    noise = rng.integers(0, 256, w * h * 3 // 2).astype(np.uint8)
    return np.stack(structured + [noise])


def _xla_packed(frames, budgets, codec, w=W, h=H):
    cap = (int(np.max(budgets)) - 8 + 1) // 2
    out = jax.jit(lambda f, b: api.bs_encode_frames_packed(
        f, b, codec=codec, width=w, height=h, capacity_words=cap,
        pallas_sweep=False, packer="blocks"))(frames, budgets)
    return {k: np.asarray(v) for k, v in out.items()}, cap


@pytest.mark.parametrize("codec", [bs_ops.BS_V2, bs_ops.BS_V3,
                                   bs_ops.BS_V3DC])
def test_native_matches_xla_pipeline(codec):
    """scale / total_bits / nz / packed words all equal the XLA packed
    pipeline across codecs, on structured and noise frames with mixed
    budgets (incl. a tight one that forces a high scale)."""
    frames = _frames(4)
    budgets = np.array([18144, 8016, 4032, 18144], np.int32)
    ref, cap = _xla_packed(frames, budgets, codec)
    nat = native.bs_encode_frames(frames, budgets, codec=codec,
                                  width=W, height=H, capacity_words=cap)
    assert np.array_equal(ref["scale"], nat["scale"])
    fit = ref["scale"] <= 63
    assert fit.all(), "fixture budgets should all be encodable"
    for k in ("total_bits", "nz_count"):
        assert np.array_equal(ref[k], nat[k]), k
    assert np.array_equal(ref["words"].astype(np.uint16), nat["words"])


def test_native_unfittable_scale64():
    """A noise frame under an impossible budget reports scale 64 (the
    XLA path's metadata is junk there by design — only the scale is
    comparable, callers raise either way, mdec.c:723)."""
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (2, W * H * 3 // 2)).astype(np.uint8)
    budgets = np.array([2016, 18144], np.int32)
    ref, cap = _xla_packed(frames, budgets, bs_ops.BS_V2)
    nat = native.bs_encode_frames(frames, budgets, codec=bs_ops.BS_V2,
                                  width=W, height=H, capacity_words=cap)
    assert np.array_equal(ref["scale"], nat["scale"])
    assert nat["scale"][0] == 64 and nat["scale"][1] <= 63
    # The fitting frame's outputs are unaffected by its neighbor.
    assert np.array_equal(ref["words"][1].astype(np.uint16),
                          nat["words"][1])
    assert ref["total_bits"][1] == nat["total_bits"][1]


def test_native_seeds_never_change_bytes():
    """The cross-call select seeds only steer eval order: chunked calls
    with a carried seeds array produce byte-identical outputs to one
    cold whole-batch call — including across a budget change and an
    unfittable frame (which must seed the next chunk at 63, not 64)."""
    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, (8, W * H * 3 // 2)).astype(np.uint8)
    budgets = np.array([18144, 18144, 8016, 2016, 18144, 18144, 8016,
                        18144], np.int32)
    cap = (18144 - 8 + 1) // 2
    cold = native.bs_encode_frames(frames, budgets, codec=bs_ops.BS_V2,
                                   width=W, height=H,
                                   capacity_words=cap)
    seeds = np.zeros((1, 2), np.int32)
    parts = []
    for base in range(0, 8, 2):
        parts.append(native.bs_encode_frames(
            frames[base:base + 2], budgets[base:base + 2],
            codec=bs_ops.BS_V2, width=W, height=H, capacity_words=cap,
            n_threads=1, seeds=seeds))
    assert (seeds[0] != 0).any()            # seeds actually carried
    for k in ("scale", "words", "total_bits", "nz_count"):
        got = np.concatenate([p[k] for p in parts])
        # Unfittable frames report junk metadata apart from scale
        # (callers raise); compare them scale-only like the XLA parity
        # test does.
        if k == "scale":
            assert np.array_equal(cold[k], got)
        else:
            fit = cold["scale"] <= 63
            assert np.array_equal(cold[k][fit], got[fit]), k


def test_native_small_geometry():
    """16x16 (one macroblock) exercises the rearrange edge cases."""
    w = h = 16
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (3, w * h * 3 // 2)).astype(np.uint8)
    budgets = np.array([2016, 96, 512], np.int32)
    for codec in (bs_ops.BS_V2, bs_ops.BS_V3DC):
        ref, cap = _xla_packed(frames, budgets, codec, w, h)
        nat = native.bs_encode_frames(frames, budgets, codec=codec,
                                      width=w, height=h,
                                      capacity_words=cap)
        assert np.array_equal(ref["scale"], nat["scale"])
        fit = ref["scale"] <= 63
        assert np.array_equal(ref["total_bits"][fit],
                              nat["total_bits"][fit])
        assert np.array_equal(ref["words"][fit].astype(np.uint16),
                              nat["words"][fit])


@pytest.mark.parametrize("seed", range(4))
def test_native_fuzz_vs_xla(seed):
    """Randomized geometries, budgets and content (smooth gradients,
    flat blocks, saturated noise) — scale/words/totals must match the
    XLA pipeline everywhere a frame fits."""
    rng = np.random.default_rng(3000 + seed)
    w = 16 * int(rng.integers(1, 7))
    h = 16 * int(rng.integers(1, 5))
    B = 3
    codec = [bs_ops.BS_V2, bs_ops.BS_V3, bs_ops.BS_V3DC][seed % 3]
    kinds = rng.integers(0, 3, B)
    frames = []
    for k in kinds:
        if k == 0:      # smooth
            frames.append(_to_nv21(rand_frames(w, h, 1, seed=seed)[0],
                                   w, h))
        elif k == 1:    # flat with hard blocks (long zero runs)
            f = np.full(w * h * 3 // 2, 128, np.uint8)
            f[: w * 4] = 255
            frames.append(f)
        else:           # saturated noise
            frames.append(rng.integers(0, 256, w * h * 3 // 2)
                          .astype(np.uint8))
    frames = np.stack(frames)
    nbytes = w * h // 256 * 6
    budgets = rng.integers(max(16, nbytes), max(64, nbytes * 40),
                           B).astype(np.int32)
    ref, cap = _xla_packed(frames, budgets, codec, w, h)
    nat = native.bs_encode_frames(frames, budgets, codec=codec,
                                  width=w, height=h, capacity_words=cap)
    assert np.array_equal(ref["scale"], nat["scale"])
    fit = ref["scale"] <= 63
    assert np.array_equal(ref["total_bits"][fit], nat["total_bits"][fit])
    assert np.array_equal(ref["nz_count"][fit], nat["nz_count"][fit])
    assert np.array_equal(ref["words"][fit].astype(np.uint16),
                          nat["words"][fit])


@pytest.mark.parametrize("codec", [bs_ops.BS_V2, bs_ops.BS_V3DC])
def test_frame_encoder_tiers_identical(codec, monkeypatch):
    """BsFrameEncoder produces byte-identical assembled frames (headers
    included) through the native and device tiers."""
    frames = list(_frames(5, seed=9))
    sizes = [18144, 18144, 8016, 18144, 18144]

    monkeypatch.setenv("PSXAVENC_VIDEO_TIER", "native")
    enc_n = BsFrameEncoder(codec, W, H)
    assert enc_n._tier == "native"
    res_n = enc_n.encode_frames(frames, sizes)
    enc_n.close()

    monkeypatch.setenv("PSXAVENC_VIDEO_TIER", "device")
    enc_d = BsFrameEncoder(codec, W, H)
    assert enc_d._tier == "device"
    res_d = enc_d.encode_frames(frames, sizes)
    enc_d.close()

    assert len(res_n) == len(res_d) == len(frames)
    for (buf_n, info_n), (buf_d, info_d) in zip(res_n, res_d):
        assert info_n == info_d
        assert np.array_equal(buf_n, buf_d)
    assert enc_n.quant_scale_sum == enc_d.quant_scale_sum


def test_frame_encoder_native_async(monkeypatch):
    """The async dispatch/fetch path works on the native tier (the
    str/sbs frame feeds prefetch through it)."""
    frames = list(_frames(3, seed=21))
    sizes = [18144, 18144, 18144]
    monkeypatch.setenv("PSXAVENC_VIDEO_TIER", "native")
    enc = BsFrameEncoder(bs_ops.BS_V2, W, H)
    handle = enc.encode_frames_async(frames, sizes)
    got = enc.fetch(handle)
    want = enc.encode_frames(frames, sizes)
    enc.close()
    for (bg, ig), (bw, iw) in zip(got, want):
        assert ig == iw and np.array_equal(bg, bw)


def test_stack_frames_zero_copy_and_fallbacks():
    """The batch builder returns a no-copy view for consecutive rows of
    one allocation (whole-file ingest layout) and byte-identical copies
    for padding, repeats, gaps, and foreign rows."""
    from psxavenc_tpu.models.bs_video import _stack_frames

    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (64, 640)).astype(np.uint8)
    rows = [base[i] for i in range(8, 40)]
    out = _stack_frames(rows, 32)
    assert out.__array_interface__["data"][0] == \
        base[8].__array_interface__["data"][0]          # view, not copy
    assert np.array_equal(out, base[8:40])

    padded = _stack_frames(rows[:30], 32)               # pad -> copy
    assert np.array_equal(padded, np.stack(rows[:30] + [rows[29]] * 2))
    gapped = rows[:16] + [base[i] for i in range(25, 41)]
    gap = _stack_frames(gapped, 32)                     # gap -> copy
    assert gap.__array_interface__["data"][0] != \
        base[8].__array_interface__["data"][0]
    assert np.array_equal(gap, np.stack(gapped))
    other = np.zeros(640, np.uint8)
    mixed = _stack_frames(rows[:31] + [other], 32)      # foreign -> copy
    assert np.array_equal(mixed, np.stack(rows[:31] + [other]))

    # A non-contiguous later row whose element count, dtype, base and
    # start address all line up with the raw-span layout must still fall
    # back to a copy: the strided view's logical bytes differ from the
    # fsz contiguous bytes at its address.
    flat = base.reshape(-1)
    fsz = 640
    tricky = [flat[:fsz]] + \
        [flat[j * fsz: j * fsz + 2 * fsz: 2] for j in range(1, 32)]
    assert all(t.nbytes == fsz and not t.flags["C_CONTIGUOUS"]
               for t in tricky[1:])
    strided = _stack_frames(tricky, 32)
    assert np.array_equal(strided, np.stack(tricky))


def test_frame_encoder_native_raises_unfittable(monkeypatch):
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, W * H * 3 // 2).astype(np.uint8)]
    monkeypatch.setenv("PSXAVENC_VIDEO_TIER", "native")
    enc = BsFrameEncoder(bs_ops.BS_V2, W, H)
    with pytest.raises(RuntimeError, match="quant scale 63"):
        enc.encode_frames(frames, [2016])
    enc.close()
