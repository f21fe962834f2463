"""BS video frame encoder model: device pipeline + host assembly.

Pipeline (mdec.c:580-755 behavior, TPU-restructured):
  NV21 bytes -> macroblock rearrange -> batched integer FDCT ->
  quantization-scale sweep -> chosen-scale symbols -> device bit-pack
  [one fused jit call over a CHUNK of frames] -> 8-byte frame headers
  and buffer assembly on the host.

Frames are encoded in power-of-two chunks so every frame of a file (and
across files of the same geometry) shares one compiled program; per-frame
byte budgets ride in as data.
"""

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .. import api
from ..ops import bs as bs_ops


def _stack_frames(frames, pad_to):
    """(list of per-frame byte rows) -> (pad_to, frame_bytes) uint8.

    Zero-copy fast path: when the frames are exactly consecutive rows
    of one C-contiguous 2-D array (the whole-file ingest layout), the
    batch IS a slice of that array — no 50+ MB stack copy. This host
    class faults in fresh allocations at ~100 MB/s, which made np.stack
    cost more than the entire native encode; any padding, reordering or
    mixed sources falls back to the copy."""
    n = len(frames)
    f0 = frames[0]
    if (pad_to == n and isinstance(f0, np.ndarray) and f0.ndim == 1
            and f0.nbytes > 0 and f0.flags["C_CONTIGUOUS"]):
        # Ultimate bases collapse to the backing allocation; every row
        # must live in THAT allocation at exactly addr0 + j*fsz for the
        # strided view below to be in-bounds memory.
        ub = f0.base if f0.base is not None else f0
        addr0 = f0.__array_interface__["data"][0]
        fsz = f0.nbytes
        ok = True
        for j, f in enumerate(frames):
            if (not isinstance(f, np.ndarray) or f.ndim != 1
                    or f.nbytes != fsz or f.dtype != f0.dtype
                    # EVERY row must be contiguous, not just f0: a
                    # strided view can match nbytes/base/start address
                    # while its logical bytes differ from the raw span.
                    or not f.flags["C_CONTIGUOUS"]
                    or (f.base if f.base is not None else f) is not ub
                    or f.__array_interface__["data"][0]
                    != addr0 + j * fsz):
                ok = False
                break
        if ok:
            return np.lib.stride_tricks.as_strided(
                f0, shape=(n, f0.shape[0]),
                strides=(fsz, f0.itemsize), writeable=False)
    rows = [np.asarray(f) for f in frames]
    rows += [rows[-1]] * (pad_to - n)
    return np.stack(rows)


class BsFrameEncoder:
    """Stateful frame encoder (frame index, quant-scale stats) matching
    mdec_encoder_t's observable behavior, with chunk-batched device work."""

    CHUNK = 8  # frames per device call (padded to this granularity)

    def __init__(self, codec, width, height):
        assert width % 16 == 0 and height % 16 == 0
        self.codec = codec  # bs_ops.BS_V2 / BS_V3 / BS_V3DC
        self.width = width
        self.height = height
        self.quant_scale_sum = 0
        self.frame_index = 0
        # Multi-chip: with >1 device the frame batch axis shards over a
        # 1-D mesh (parallel/mesh.py); identical bytes to single-device.
        import jax

        self._devices = jax.devices()
        self._sharded_steps = {}
        # Compute tier: the device pipeline on TPU; the native C++
        # frame encoder (psxn_bs_encode_frames, bit-identical) on
        # CPU-only hosts, where the XLA path is dispatch-bound (~3 fps
        # vs the native tier's ~300 on one core — the video analog of
        # the native ADPCM tier). PSXAVENC_VIDEO_TIER=device|native
        # overrides.
        tier = os.environ.get("PSXAVENC_VIDEO_TIER", "auto")
        if tier == "auto":
            tier = "device" if self._devices[0].platform == "tpu" \
                else "native"
        if tier == "native":
            try:
                from .. import native as _native
                self._native = _native
            except Exception:  # noqa: BLE001 — no compiler: device tier
                tier = "device"
                self._native = None
        else:
            self._native = None
        self._tier = tier
        # Native-tier select seeds, carried across encode_frames calls
        # (keyed by worker count) so incremental muxer feeds start every
        # call warm; they steer eval order only, never output bytes.
        self._native_seeds = {}
        # One worker thread stages the NEXT batch's host prep + host->
        # device upload + dispatch while the main thread fetches the
        # current batch's payload: H2D(k+1) overlaps compute(k)+D2H(k)
        # (the transfers ride independent directions/DMA queues; on the
        # dev tunnel this measures ~14% e2e, on a PCIe host the upload
        # hides entirely behind the fetch).
        self._uploader = ThreadPoolExecutor(max_workers=1)

    def close(self):
        """Release the uploader thread (idempotent; also via __del__ —
        long-lived batch processes create one encoder per geometry)."""
        self._uploader.shutdown(wait=False)

    def __del__(self):  # noqa: D105 — best-effort resource release
        try:
            self._uploader.shutdown(wait=False)
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass

    def _native_encode(self, fr, budgets, cap_words):
        """Native-tier frame encode with per-worker select seeds carried
        across calls (keyed by worker count; order-only, never bytes)."""
        nt = min(len(fr), os.cpu_count() or 1)
        seeds = self._native_seeds.setdefault(
            nt, np.zeros((nt, 2), np.int32))
        return self._native.bs_encode_frames(
            fr, budgets, codec=self.codec, width=self.width,
            height=self.height, capacity_words=cap_words,
            n_threads=nt, seeds=seeds)

    def _sharded_step(self, cap_words):
        key = cap_words
        step = self._sharded_steps.get(key)
        if step is None:
            from ..parallel import mesh as pm

            mesh = pm.make_mesh(self._devices)
            on_tpu = self._devices[0].platform == "tpu"
            step = pm.packed_video_step(
                mesh, codec=self.codec, width=self.width,
                height=self.height, capacity_words=cap_words,
                pallas_sweep=on_tpu)
            self._sharded_steps[key] = step
        return step

    def encode_frames(self, frames_nv21, frame_max_sizes):
        """Encode N frames with per-frame budgets -> list of (buffer, info).

        One fused device call per CHUNK of frames; the packed payload is
        the only thing fetched. Launches are pipelined one batch deep:
        batch k+1 is uploaded and dispatched before batch k's payload is
        fetched, overlapping host<->device transfers with compute (the
        device executes in order; per-fetch latency dominates small
        hosts' wall-clock).
        """
        n = len(frames_nv21)
        results = []
        if n == 0:
            return results
        # One packing capacity for the whole call: chunk-local maxima would
        # force a recompile whenever a chunk happens to miss the largest
        # budget.
        cap_bytes = int(max(frame_max_sizes))
        cap_words = max(1, (cap_bytes - 8 + 1) // 2)
        n_dev = len(self._devices)
        # Long files use a larger device batch (fixed per-call costs —
        # scale probe/select, launch — amortize), short ones avoid
        # padding waste. Bucketed chunk sizes bound the compile count
        # per geometry. r5: the per-frame overhead cuts moved the
        # device sweet spot from 32-64 to 128 (paired runs +1.6 to
        # +7.4% over 64); on the dev tunnel e2e stays H2D-bound either
        # way, but PCIe hosts see the device rate.
        chunk = 128 if n >= 96 else (32 if n >= 32 else self.CHUNK)
        # Chunk granularity must divide over the mesh.
        gran = -(-chunk // n_dev) * n_dev if n_dev > 1 else chunk
        if self._tier == "native":
            # No compiled shapes to bucket and no pad-frame waste: one
            # call, frames fan out over host threads inside.
            gran = n

        def launch(base):
            ids = list(range(base, min(base + gran, n)))
            fr = _stack_frames([frames_nv21[i] for i in ids], gran)
            budgets = np.array(
                [frame_max_sizes[i] for i in ids]
                + [frame_max_sizes[ids[-1]]] * (gran - len(ids)),
                np.int32)
            if self._tier == "native":
                out = self._native_encode(fr, budgets, cap_words)
            elif n_dev > 1:
                out = self._sharded_step(cap_words)(fr, budgets)
            else:
                out = api.bs_encode_frames_packed(
                    fr, budgets, codec=self.codec, width=self.width,
                    height=self.height, capacity_words=cap_words)
            return ids, out

        def collect(ids, out):
            words = np.asarray(out["words"])
            scales = np.asarray(out["scale"])
            total_bits = np.asarray(out["total_bits"])
            nzs = np.asarray(out["nz_count"])
            for j, i in enumerate(ids):
                results.append(self._assemble(
                    int(scales[j]), words[j], int(total_bits[j]),
                    int(nzs[j]), int(frame_max_sizes[i])))

        # Double-buffer: the worker thread preps/uploads/dispatches batch
        # k+1 while this thread blocks fetching batch k's payload.
        fut = self._uploader.submit(launch, 0)
        try:
            for base in range(gran, n + gran, gran):
                pending = fut.result()
                fut = self._uploader.submit(launch, base) \
                    if base < n else None
                collect(*pending)
        finally:
            # collect() raises on unfittable frames (mdec.c:723 parity);
            # consume the in-flight batch's outcome so its exception is
            # not silently dropped and the worker is not abandoned
            # mid-dispatch.
            if fut is not None:
                fut.add_done_callback(lambda f: f.exception())
        return results

    def encode_frames_async(self, frames_nv21, frame_max_sizes):
        """Stage one device batch without fetching; returns a handle for
        :meth:`fetch`. The host prep + upload + dispatch run on the
        uploader thread, so the caller (the str/sbs frame feeds prefetch
        one batch ahead) overlaps them with consuming the previous
        batch."""
        sizes = list(frame_max_sizes)
        return (self._uploader.submit(self._dispatch_async, frames_nv21,
                                      sizes), sizes)

    def _dispatch_async(self, frames_nv21, frame_max_sizes):
        cap_bytes = int(max(frame_max_sizes))
        cap_words = max(1, (cap_bytes - 8 + 1) // 2)
        n_dev = len(self._devices)
        n = len(frames_nv21)
        # Same shape buckets as encode_frames (compile reuse).
        gran = 128 if n >= 96 else (32 if n > self.CHUNK else self.CHUNK)
        gran = max(gran, -(-n // n_dev) * n_dev) if n_dev > 1 else gran
        gran = -(-gran // n_dev) * n_dev if n_dev > 1 else gran
        if self._tier == "native":
            gran = n                     # no shape buckets, no pad waste
        fr = _stack_frames(list(frames_nv21), gran)
        budgets = np.array(list(frame_max_sizes)
                           + [frame_max_sizes[-1]] * (gran - n), np.int32)
        if self._tier == "native":
            out = self._native_encode(fr, budgets, cap_words)
        elif n_dev > 1:
            out = self._sharded_step(cap_words)(fr, budgets)
        else:
            out = api.bs_encode_frames_packed(
                fr, budgets, codec=self.codec, width=self.width,
                height=self.height, capacity_words=cap_words)
        return (out, list(frame_max_sizes))

    def fetch(self, handle):
        """Materialize an async batch -> list of (buffer, info)."""
        fut, sizes = handle
        out, _ = fut.result()
        words = np.asarray(out["words"])
        scales = np.asarray(out["scale"])
        total_bits = np.asarray(out["total_bits"])
        nzs = np.asarray(out["nz_count"])
        return [self._assemble(int(scales[j]), words[j],
                               int(total_bits[j]), int(nzs[j]),
                               int(sizes[j]))
                for j in range(len(sizes))]

    def _assemble(self, scale, words, total_bits, nz, frame_max_size):
        if scale >= 64:
            raise RuntimeError(
                "frame does not fit budget even at quant scale 63 "
                "(the reference asserts here too, mdec.c:723)")
        buffer = np.zeros(frame_max_size, dtype=np.uint8)
        payload = words.astype("<u2").tobytes()
        buffer[8:] = np.frombuffer(payload[:frame_max_size - 8], np.uint8)
        # pack_bits' total already includes the 10-bit end-of-frame code.
        bytes_used = 8 + 2 * ((total_bits + 15) >> 4)
        assert bytes_used <= frame_max_size
        bytes_used = (bytes_used + 0x3) & ~0x3

        nb = (self.width // 16) * (self.height // 16) * 6
        hwords = nz + 2 * nb + 2
        hwords = (hwords + 0x3F) & ~0x3F
        blocks_used = (hwords + 1) >> 1

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
