"""BS video frame encoder model: device pipeline + host bit-packing.

Pipeline per frame (mdec.c:580-755 behavior, TPU-restructured):
  NV21 bytes -> macroblock rearrange -> batched integer FDCT -> all-scale
  quantize/RLE sweep -> chosen-scale symbol stream  [device, one jit call]
  -> 16-bit LE bit-pack -> 8-byte frame header       [host, native C++]
"""

import numpy as np
import jax.numpy as jnp

from .. import native
from ..ops import bs as bs_ops
from ..ops import fdct as fdct_ops

import jax
from functools import partial


@partial(jax.jit, static_argnames=("codec", "width", "height"))
def _frame_device(frame, frame_max_size, *, codec, width, height):
    blocks = bs_ops.rearrange_nv21_frame(frame, width, height)
    coefs = fdct_ops.fdct_islow(blocks).reshape(-1, 64)
    return bs_ops.encode_frame_symbols(coefs, frame_max_size, codec=codec)


class BsFrameEncoder:
    """Stateful frame encoder (frame index, quant-scale stats) matching
    mdec_encoder_t's observable behavior."""

    def __init__(self, codec, width, height):
        assert width % 16 == 0 and height % 16 == 0
        self.codec = codec  # bs_ops.BS_V2 / BS_V3 / BS_V3DC
        self.width = width
        self.height = height
        self.quant_scale_sum = 0
        self.frame_index = 0

    def encode_frame(self, frame_nv21, frame_max_size):
        """Encode one frame into a zero-padded ``frame_max_size`` buffer.

        Returns (buffer, info) where info carries quant_scale, bytes_used
        (rounded to 4), blocks_used.
        """
        out = _frame_device(jnp.asarray(frame_nv21),
                            jnp.int32(frame_max_size), codec=self.codec,
                            width=self.width, height=self.height)
        scale = int(out["scale"])
        if scale >= 64:
            raise RuntimeError(
                "frame does not fit budget even at quant scale 63 "
                "(the reference asserts here too, mdec.c:723)")

        codes = np.asarray(out["codes"]).reshape(-1)
        bits = np.asarray(out["bits"]).reshape(-1).astype(np.uint8)
        # Final end-of-frame code (mdec.c:645-651,710).
        eof = 0x1FF if self.codec == bs_ops.BS_V2 else 0x3FF
        codes = np.concatenate([codes, np.array([eof], np.uint32)])
        bits = np.concatenate([bits, np.array([10], np.uint8)])

        bytes_used, buffer = native.bs_pack(codes, bits, frame_max_size)
        if bytes_used < 0:
            raise AssertionError(
                "packer overflow at the device-chosen scale — bit "
                "accounting bug")
        predicted = 8 + 2 * ((int(out["total_bits"]) + 15) >> 4)
        assert bytes_used == predicted, (bytes_used, predicted)

        nb = (self.width // 16) * (self.height // 16) * 6
        hwords = int(out["nz_count"]) + 2 * nb + 2
        hwords = (hwords + 0x3F) & ~0x3F
        blocks_used = (hwords + 1) >> 1
        bytes_used = (bytes_used + 0x3) & ~0x3

        # 8-byte BS frame header (mdec.c:725-755).
        buffer[0] = blocks_used & 0xFF
        buffer[1] = (blocks_used >> 8) & 0xFF
        buffer[2] = 0x00
        buffer[3] = 0x38
        buffer[4] = scale & 0xFF
        buffer[5] = (scale >> 8) & 0xFF
        buffer[6] = 0x02 if self.codec == bs_ops.BS_V2 else 0x03
        buffer[7] = 0x00

        self.quant_scale_sum += scale
        return buffer, {
            "quant_scale": scale,
            "bytes_used": bytes_used,
            "blocks_used": blocks_used,
        }
