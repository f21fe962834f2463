"""Batch tensor API — the TPU-native throughput surface.

The reference is a one-file-at-a-time CLI; the latent parallel axes
(SURVEY §2.2) become explicit batch dimensions here:

- ``spu_encode_batch``: B independent channel streams at once (channels,
  voice banks, many files) — one ``lax.scan`` over time, everything else
  vectorized.
- ``xa_encode_batch``: same kernel with XA filter count/shift range.
- ``bs_encode_frames``: B video frames at once (one file's frames or many
  files') — rearrange + FDCT + 63-scale sweep vmapped over the batch.

These are pure jittable functions over fixed shapes; ``parallel.mesh``
shards their batch axis across chips.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .ops import adpcm as adpcm_ops
from .ops import bitpack as bitpack_ops
from .ops import bs as bs_ops
from .ops import fdct as fdct_ops


@partial(jax.jit, static_argnames=())
def spu_encode_batch(units, limits, prev1, prev2):
    """SPU-ADPCM: (B, T, 28) int32 sample units -> headers (B, T),
    nibbles (B, T, 28), final decoder state."""
    return adpcm_ops.encode_units_scan(
        units, limits, prev1, prev2,
        filter_count=adpcm_ops.SPU_FILTER_COUNT,
        shift_range=adpcm_ops.SHIFT_RANGE_4BPS)


@jax.jit
def spu_encode_blocks(units, limits, prev1, prev2):
    """SPU-ADPCM straight to 16-byte block bytes on device: (B, T, 28) ->
    (B, T, 16) uint8 (loop-flag byte left 0 for the host muxer to fill,
    adpcm.c:356-376 layout)."""
    headers, nibbles, p1, p2 = adpcm_ops.encode_units_scan(
        units, limits, prev1, prev2,
        filter_count=adpcm_ops.SPU_FILTER_COUNT,
        shift_range=adpcm_ops.SHIFT_RANGE_4BPS)
    B, T = headers.shape
    pairs = nibbles.reshape(B, T, 14, 2)
    packed = ((pairs[..., 0] & 0x0F) | (pairs[..., 1] << 4)).astype(
        jnp.uint8)
    blocks = jnp.concatenate(
        [headers.astype(jnp.uint8)[..., None],
         jnp.zeros((B, T, 1), jnp.uint8), packed], axis=-1)
    return blocks, p1, p2


@partial(jax.jit, static_argnames=("bits8",))
def xa_encode_batch(units, limits, prev1, prev2, *, bits8=False):
    """XA-ADPCM unit batch (4 filters; 4- or 8-bit)."""
    return adpcm_ops.encode_units_scan(
        units, limits, prev1, prev2,
        filter_count=adpcm_ops.XA_FILTER_COUNT,
        shift_range=(adpcm_ops.SHIFT_RANGE_8BPS if bits8
                     else adpcm_ops.SHIFT_RANGE_4BPS))


def _use_pallas_sweep():
    """The Mosaic sweep kernel only compiles for real TPUs."""
    return jax.devices()[0].platform == "tpu"


@partial(jax.jit, static_argnames=("codec", "width", "height",
                                   "pallas_sweep"))
def bs_encode_frames(frames, budgets, *, codec, width, height,
                     pallas_sweep=None):
    """BS frame batch: (B, w*h*3/2) uint8 NV21 -> per-frame symbol streams.

    Returns dict with scale (B,), codes/bits (B, NB, 65), nz_count (B,),
    total_bits (B,).
    """
    if pallas_sweep is None:
        pallas_sweep = _use_pallas_sweep()
    coefs = _frames_to_coefs(frames, width, height)
    return bs_ops.encode_frames_symbols(coefs, budgets, codec=codec,
                                        pallas_sweep=pallas_sweep)


def _frames_to_coefs(frames, width, height):
    def one(frame):
        blocks = bs_ops.rearrange_nv21_frame(frame, width, height)
        return fdct_ops.fdct_islow(blocks).reshape(-1, 64)

    return jax.vmap(one)(frames)


def _frames_to_pixrows(frames, width, height):
    """(B, w*h*3/2) NV21 -> (B, 64, NB) centered pixel rows, the input
    of the fused FDCT kernels (the (B, NB, 64) coefficient tensor never
    exists on this path)."""
    return jax.vmap(
        lambda f: bs_ops.rearrange_nv21_rows(f, width, height))(frames)


@partial(jax.jit,
         static_argnames=("codec", "width", "height", "capacity_words",
                          "pallas_sweep", "packer"))
def bs_encode_frames_packed(frames, budgets, *, codec, width, height,
                            capacity_words, pallas_sweep=None,
                            packer=None):
    """Fully fused BS frame batch: pixels in, packed bitstream words out.

    Nothing but the packed payload (and a few scalars) leaves the device —
    the full rearrange/FDCT/quantize/RLE/scale-select/bit-pack pipeline is
    one XLA program. ``capacity_words`` must cover the largest budget:
    (max_frame_bytes - 8) // 2.

    ``packer`` selects the bit-pack strategy (all bit-identical):
    "fused_mxu" (TPU default: Mosaic winner-emission + per-block pack in
    one kernel, then output-stationary placement spreading candidate
    windows with one-hot MXU matmuls), "fused_gather" (same, placement
    via per-candidate compare/selects — ~1 ms/64-frame-batch slower),
    "fused" (same emission, placement via the u32-pair scatter),
    "blocks" (XLA per-block dense windows + scatter; the default off
    TPU), "blocks_pallas" (per-block Mosaic kernels), or "flat" (the
    per-symbol-scatter semantics reference — ~10x slower on v5e, XLA
    scatter costs ~7 ns per scattered element).
    """
    eof = 0x1FF if codec == bs_ops.BS_V2 else 0x3FF

    if pallas_sweep is None:
        pallas_sweep = _use_pallas_sweep()
    if packer is None:
        packer = "fused_mxu" if pallas_sweep else "blocks"

    if packer in ("fused", "fused_pallas", "fused_gather", "fused_mxu"):
        # Fused Mosaic winner-emission + per-block packing: the
        # (B, NB, 65) code/bit tensors never exist. Falls back to the
        # emitting path for batches with a >256-bit block stream.
        from .ops import bs_pallas

        prep = None
        if pallas_sweep:
            # Fused FDCT path: the select kernel FDCTs each frame in
            # VMEM from the pixel rows (the search hides the transform)
            # and writes the coefficients as its second output, which
            # the emit kernel consumes directly — the FDCT runs exactly
            # once and the separate XLA rearrange+FDCT stage disappears
            # (mdec.c:605-641 feeds rearrange+FDCT straight into the
            # per-scale loop too).
            pix = _frames_to_pixrows(frames, width, height)
            sel = bs_ops.select_frames_pixels(pix, budgets, codec=codec)
            if packer in ("fused_gather", "fused_mxu"):
                # Fully fused prep: the emit kernel also computes the
                # global bit offsets, injects the EOF block, and emits
                # the PLACED u32 contribution words — the per-block
                # stream tensor and the XLA streams_to_u32 stage never
                # exist.
                prep = bs_pallas.emit_prep_pallas(
                    sel["c64"], sel["scale_idx"] + 1, sel["dc_code"],
                    sel["dc_bits"], eof=eof)
            else:
                streams, block_bits = bs_pallas.emit_pack_pallas(
                    sel["c64"], sel["scale_idx"] + 1, sel["dc_code"],
                    sel["dc_bits"])
        else:
            coefs = _frames_to_coefs(frames, width, height)
            sel = bs_ops.encode_frames_symbols(
                coefs, budgets, codec=codec, pallas_sweep=False,
                emit=False)
            streams, block_bits = bs_pallas.emit_pack_pallas(
                sel["c"], sel["scale_idx"] + 1, sel["dc_code"],
                sel["dc_bits"])
        B = frames.shape[0]
        if prep is not None:
            vals32, e0, block_bits, _total = prep
        else:
            eof_stream = jnp.zeros((B, 1, streams.shape[2]),
                                   jnp.int32).at[:, 0, 0].set(eof << 6)
            streams = jnp.concatenate([streams, eof_stream], axis=1)
            block_bits = jnp.concatenate(
                [block_bits, jnp.full((B, 1), 10, jnp.int32)], axis=1)
            goff = jnp.cumsum(block_bits, axis=1) - block_bits
        overflow = jnp.any(block_bits > 16 * bitpack_ops.BLOCK_CAP_WORDS)

        def fast(_):
            from .ops import bitpack_pallas

            if prep is not None:
                place_v = {
                    "fused_gather":
                        bitpack_pallas.place_vals_gather_pallas,
                    "fused_mxu": bitpack_pallas.place_vals_mxu_pallas,
                }[packer]
                return place_v(vals32, e0,
                               capacity_words=capacity_words).astype(
                    jnp.uint32)
            if packer in ("fused_pallas", "fused_gather", "fused_mxu"):
                place = {
                    "fused_gather":
                        bitpack_pallas.place_streams_gather_pallas,
                    "fused_mxu": bitpack_pallas.place_streams_mxu_pallas,
                    "fused_pallas": bitpack_pallas.place_streams_pallas,
                }[packer]
                total = goff[:, -1] + block_bits[:, -1]
                return place(streams, goff, total,
                             capacity_words=capacity_words).astype(
                    jnp.uint32)
            return jax.vmap(lambda st, go: bitpack_ops._place_streams(
                st.astype(jnp.uint32), go,
                capacity_words=capacity_words))(streams, goff)

        def slow(_):
            # Emit symbols at the already-selected scale (no re-sweep)
            # and pack through the always-exact flat path. The pixel
            # path slices its select kernel's coefficient output back
            # to (B, 63, NB) here — only executed when a block
            # overflows.
            nb_true = sel["dc_code"].shape[1]
            c = sel["c"] if "c" in sel else \
                sel["c64"][:, :63, :nb_true].astype(jnp.int32)
            codes_s, bits_s = bs_ops.emit_symbols_at(
                c, sel["scale_idx"], sel["dc_bits"],
                sel["dc_code"])
            eof_codes = jnp.zeros((B, 1, codes_s.shape[2]),
                                  jnp.uint32).at[:, 0, 0].set(eof)
            eof_bits = jnp.zeros((B, 1, bits_s.shape[2]),
                                 jnp.int32).at[:, 0, 0].set(10)
            cs = jnp.concatenate(
                [codes_s.astype(jnp.uint32), eof_codes], axis=1)
            bs_ = jnp.concatenate(
                [bits_s.astype(jnp.int32), eof_bits], axis=1)
            w, _t = jax.vmap(lambda cc, bb: bitpack_ops.pack_bits(
                cc.reshape(-1), bb.reshape(-1),
                capacity_words=capacity_words))(cs, bs_)
            return w.astype(jnp.uint32)

        words = jax.lax.cond(overflow, slow, fast, 0)
        return {"scale": sel["scale"],
                "words": words.astype(jnp.uint16),
                "total_bits": sel["total_bits"],
                "nz_count": sel["nz_count"]}

    coefs = _frames_to_coefs(frames, width, height)
    out = bs_ops.encode_frames_symbols(coefs, budgets, codec=codec,
                                       pallas_sweep=pallas_sweep)

    # The 10-bit end-of-frame code rides as one synthetic extra block.
    B, nb, s = out["codes"].shape
    eof_codes = jnp.zeros((B, 1, s), jnp.uint32).at[:, 0, 0].set(eof)
    eof_bits = jnp.zeros((B, 1, s), jnp.int32).at[:, 0, 0].set(10)
    codes = jnp.concatenate(
        [out["codes"].astype(jnp.uint32), eof_codes], axis=1)
    bits = jnp.concatenate(
        [out["bits"].astype(jnp.int32), eof_bits], axis=1)
    # Materialize the symbol tensors before the scatter: without this
    # barrier XLA fuses the whole emit computation into the scatter's
    # operand windows and recomputes it per scattered element (~5x the
    # entire pipeline cost, measured on v5e).
    codes, bits = jax.lax.optimization_barrier((codes, bits))
    if packer == "flat":
        words, total_bits = jax.vmap(
            lambda c, b: bitpack_ops.pack_bits(
                c.reshape(-1), b.reshape(-1),
                capacity_words=capacity_words))(codes, bits)
    else:
        words, total_bits = bitpack_ops.pack_frames_blocks(
            codes, bits, capacity_words=capacity_words,
            pallas_place=(packer == "blocks_pallas"),
            pallas_pack=(packer == "blocks_pallas"))
    # uint16 halves the device->host payload; '<u2'.tobytes() is the
    # on-disk little-endian layout directly.
    return {"scale": out["scale"], "words": words.astype(jnp.uint16),
            "total_bits": total_bits, "nz_count": out["nz_count"]}
