"""psxavenc_tpu — TPU-native PlayStation 1/2 A/V batch encoder.

A ground-up JAX/XLA rebuild of the capabilities of psxavenc (the reference
CLI encoder): XA-ADPCM and SPU-ADPCM audio, MDEC "BS" v2/v3/v3dc video, and
the .xa/.vag/.str/.sbs container formats with CD-ROM XA sector framing.

Architecture (TPU-first, not a translation of the reference):

- ``ops/``        — JAX compute kernels: the ADPCM candidate-search encoder
                    (vmap over filter×shift candidates, ``lax.scan`` over the
                    decoded-sample recurrence), the bit-exact integer FDCT,
                    and the BS quantize/zigzag/run-length/bit-budget sweep
                    that evaluates all 63 quantization scales in parallel.
- ``models/``     — stream/frame-level encoder models combining ops with
                    persistent codec state (scans over time, vmap over batch).
- ``parallel/``   — device-mesh sharding of the batch axis (pjit/shard_map).
- ``io/``         — media ingest (WAV/AVI/raw readers, loop-point detection,
                    CFR frame timing, sliding-window semantics).
- ``containers/`` — host muxers producing .xa/.vag/.str/.sbs bytes from
                    device-computed tensors.
- ``native/``     — C++ host runtime for byte-level bit-exact packing:
                    CD-ROM EDC checksums, sector framing, BS bit-packing.
- ``cli.py``      — argv-compatible command line front end.
"""

__version__ = "0.1.0"
