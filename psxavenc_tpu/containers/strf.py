""".str container muxers (str/strcd/strv): A/V sector interleave, frame
pacing, STR chunk headers. Byte-compatible with encode_file_str
(filefmt.c:391-520), encode_file_strspu (filefmt.c:522-631) and
encode_sector_str (mdec.c:757-836).

Structure: a first pass simulates the reference's muxing loop (windowing,
interleave pattern including the audio-runs-dry video_sectors_per_block
bump, the rational frame-pacing accumulator) to derive the full schedule;
audio sectors are then encoded in one batched device call and video frames
on demand; a persistent sector buffer reproduces the reference's
never-cleared stack buffer so untouched byte regions carry previous-sector
bytes exactly like the original (e.g. the unwritten ECC area of strcd video
sectors and the 2336-byte format's trailing bytes).
"""

import math
import sys

import numpy as np

from .. import cli_args as ca
from .. import native
from ..models.bs_video import BsFrameEncoder
from ..utils.progress import Progress
from . import xa as xamod

STR_MAGIC = 0x0160


def _video_banner(args, interleave, vspb, frame_size):
    if not (args.flags & ca.FLAG_QUIET):
        if interleave > 1:
            print(f"Interleave: {interleave - vspb}/{interleave} audio, "
                  f"{vspb}/{interleave} video", file=sys.stderr)
        print(f"Frame size: {frame_size:.2f} sectors", file=sys.stderr)


def _schedule(args, dec, asps, interleave, vspb0, base_overflow,
              overflow_den, frames_needed):
    """Dry-run of the muxing loop (filefmt.c:450-516 + mdec.c:768-780).

    Returns a list of sector descriptors and the frame budget sequence.
    """
    ch = args.audio_channels
    avail_a = dec.audio_sample_count
    avail_v = dec.video_frame_count
    eoi = False
    vspb = vspb0
    overflow_num = 0
    frame_max = 0
    offset = 0
    frame_count = 0

    sectors = []          # per sector: dict
    audio_lengths = []    # per audio sector (samples per channel)
    frame_budgets = []    # per frame

    sc = 0
    while (not eoi) or offset < frame_max:
        # ensure_av_data(asps*ch, frames_needed)
        na = asps * ch
        if not eoi:
            if (na and avail_a <= na) or \
                    (frames_needed and avail_v <= frames_needed):
                eoi = True
        if asps == 0:
            is_video = True
        elif args.flags & ca.FLAG_STR_TRAILING_AUDIO:
            is_video = (sc % interleave) < vspb
        else:
            is_video = (sc % interleave) > 0
        if is_video:
            frames_used = 0
            while offset >= frame_max:
                frame_count += 1
                overflow_num += base_overflow
                frame_max = overflow_num // overflow_den * 2016
                overflow_num %= overflow_den
                offset = 0
                frame_budgets.append(frame_max)
                frames_used += 1
            if frames_used > avail_v:
                raise RuntimeError("video underrun: encoder needs a frame "
                                   "the input no longer provides")
            sectors.append({"video": True, "frame": frame_count,
                            "chunk_index": offset // 2016,
                            "chunk_count": frame_max // 2016,
                            "offset": offset, "eoi": eoi, "lba": sc})
            offset += 2016
            avail_v -= frames_used
        else:
            ln = min(avail_a // ch, asps)
            if ln == 0:
                vspb += 1
            else:
                audio_lengths.append(ln)
            sectors.append({"video": False, "length": ln,
                            "audio_index": len(audio_lengths) - 1,
                            "eoi": eoi, "lba": sc})
            avail_a -= ln * ch
        sc += 1
    return sectors, audio_lengths, frame_budgets


def _write_video_sector(args, buffer, desc, frame_bufs, frame_infos,
                        enc):
    """init_sector_buffer_video (filefmt.c:73-91) + encode_sector_str
    header/payload placement (mdec.c:782-835)."""
    fmt = args.format
    if fmt == ca.FORMAT_STRCD:
        native.sector_init(buffer, desc["lba"], native.SECTOR_MODE2_FORM1)
        sub = 16
        payload = 0x18
    elif fmt == ca.FORMAT_STR:
        sub = 0
        payload = 0x008
    else:  # strv / strspu: no subheader, payload at 0
        sub = None
        payload = 0x000
    if sub is not None:
        buffer[sub + 0] = args.audio_xa_file
        buffer[sub + 1] = args.audio_xa_channel & 0x1F
        buffer[sub + 2] = 0x48  # DATA | RT
        buffer[sub + 3] = 0
        buffer[sub + 4:sub + 8] = buffer[sub:sub + 4]

    fb = frame_bufs[desc["frame"] - 1]
    info = frame_infos[desc["frame"] - 1]
    header = np.zeros(32, dtype=np.uint8)
    header[0x00] = STR_MAGIC & 0xFF
    header[0x01] = STR_MAGIC >> 8
    header[0x02] = args.str_video_id & 0xFF
    header[0x03] = (args.str_video_id >> 8) & 0xFF
    header[0x04] = desc["chunk_index"] & 0xFF
    header[0x05] = (desc["chunk_index"] >> 8) & 0xFF
    header[0x06] = desc["chunk_count"] & 0xFF
    header[0x07] = (desc["chunk_count"] >> 8) & 0xFF
    fi = desc["frame"]
    header[0x08:0x0C] = np.frombuffer(
        (fi & 0xFFFFFFFF).to_bytes(4, "little"), np.uint8)
    header[0x0C:0x10] = np.frombuffer(
        (info["bytes_used"] & 0xFFFFFFFF).to_bytes(4, "little"), np.uint8)
    header[0x10] = enc.width & 0xFF
    header[0x11] = (enc.width >> 8) & 0xFF
    header[0x12] = enc.height & 0xFF
    header[0x13] = (enc.height >> 8) & 0xFF
    header[0x14:0x1C] = fb[:8]

    buffer[payload:payload + 32] = header
    buffer[payload + 32:payload + 32 + 2016] = \
        fb[desc["offset"]:desc["offset"] + 2016]

    if fmt in (ca.FORMAT_STR, ca.FORMAT_STRCD):
        # The reference always computes Form1 checksums here, even for the
        # 2336-byte layout where the buffer is not actually framed as a
        # full sector (filefmt.c:474) — reproduce verbatim.
        native.calc_checksums(buffer[:2352], native.SECTOR_MODE2_FORM1)


def encode_file_str(args, dec, output):
    """str/strcd (filefmt.c:391-520)."""
    ch = args.audio_channels
    sector_size = xamod.xa_sector_size(args)
    if dec.has_audio:
        interleave = xamod.xa_sector_interleave(args) * args.str_cd_speed
        asps = xamod.xa_samples_per_sector(args)
        vspb = interleave - 1
    else:
        interleave = 1
        asps = 0
        vspb = 1

    base_overflow = (75 * args.str_cd_speed) * vspb * args.str_fps_den
    overflow_den = interleave * args.str_fps_num
    frame_size = base_overflow / overflow_den
    _video_banner(args, interleave, vspb, frame_size)
    frames_needed = max(2, math.ceil(vspb / frame_size))

    pcm = dec.audio_window() if dec.has_audio else np.zeros(0, np.int16)
    sectors, audio_lengths, frame_budgets = _schedule(
        args, dec, asps, interleave, vspb, base_overflow, overflow_den,
        frames_needed)

    audio = xamod.XaAudioSectors(args, pcm, audio_lengths)
    enc = BsFrameEncoder(args.video_codec, dec.video_width,
                         dec.video_height)
    frames = dec.video_window()

    # Frame k consumes source frame k (clamped at EOF); all budgets are
    # known from the pacing accumulator, so the whole file's frames encode
    # in batched device calls.
    sources = [frames[min(k, len(frames) - 1)]
               for k in range(len(frame_budgets))]
    results = enc.encode_frames(sources, frame_budgets)
    frame_bufs = [r[0] for r in results]
    frame_infos = [r[1] for r in results]

    buffer = np.zeros(2352, dtype=np.uint8)
    progress = Progress(args)
    frame_count = 0
    for desc in sectors:
        if desc["video"]:
            frame_count = desc["frame"]
            _write_video_sector(args, buffer, desc, frame_bufs,
                                frame_infos, enc)
        elif desc["length"] > 0:
            audio.write_sector(buffer, desc["audio_index"], desc["lba"],
                               desc["eoi"])
        # length == 0: the reference writes the untouched buffer
        # (filefmt.c:482-494 with an empty encode), i.e. previous bytes.
        output.write(buffer[:sector_size].tobytes())
        progress.print_str(frame_count, desc["lba"],
                           enc.quant_scale_sum, args.str_fps_num,
                           args.str_fps_den)


def encode_file_strspu(args, dec, output):
    """strv (and the strspu skeleton) — 2048-byte sectors, video only
    (filefmt.c:522-631; the reference's audio branch is unimplemented)."""
    if dec.has_audio:
        raise NotImplementedError(
            "strspu audio is unimplemented in the reference "
            "(filefmt.c:528)")
    interleave, asps, vspb = 1, 0, 1
    base_overflow = (75 * args.str_cd_speed) * vspb * args.str_fps_den
    overflow_den = interleave * args.str_fps_num
    frame_size = base_overflow / overflow_den
    _video_banner(args, interleave, vspb, frame_size)
    frames_needed = max(2, math.ceil(vspb / frame_size))

    sectors, _, frame_budgets = _schedule(
        args, dec, asps, interleave, vspb, base_overflow, overflow_den,
        frames_needed)

    enc = BsFrameEncoder(args.video_codec, dec.video_width,
                         dec.video_height)
    frames = dec.video_window()
    sources = [frames[min(k, len(frames) - 1)]
               for k in range(len(frame_budgets))]
    results = enc.encode_frames(sources, frame_budgets)
    frame_bufs = [r[0] for r in results]
    frame_infos = [r[1] for r in results]
    buffer = np.zeros(2048, dtype=np.uint8)
    progress = Progress(args)
    for desc in sectors:
        _write_video_sector(args, buffer, desc, frame_bufs, frame_infos,
                            enc)
        output.write(buffer[:2048].tobytes())
        progress.print_str(desc["frame"], desc["lba"],
                           enc.quant_scale_sum, args.str_fps_num,
                           args.str_fps_den)
