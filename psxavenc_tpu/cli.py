"""Command-line front end, argv-compatible with the reference encoder
(psxavenc/main.c:51-212): same formats, flags, defaults, and stderr
banners."""

import sys

from . import cli_args as ca
from .io import ingest

# main.c:37-49
_DECODER_FLAGS = {
    ca.FORMAT_XA: ingest.DECODER_USE_AUDIO | ingest.DECODER_AUDIO_REQUIRED,
    ca.FORMAT_XACD: ingest.DECODER_USE_AUDIO | ingest.DECODER_AUDIO_REQUIRED,
    ca.FORMAT_SPU: ingest.DECODER_USE_AUDIO | ingest.DECODER_AUDIO_REQUIRED,
    ca.FORMAT_VAG: ingest.DECODER_USE_AUDIO | ingest.DECODER_AUDIO_REQUIRED,
    ca.FORMAT_SPUI: ingest.DECODER_USE_AUDIO | ingest.DECODER_AUDIO_REQUIRED,
    ca.FORMAT_VAGI: ingest.DECODER_USE_AUDIO | ingest.DECODER_AUDIO_REQUIRED,
    ca.FORMAT_STR: ingest.DECODER_USE_AUDIO | ingest.DECODER_USE_VIDEO
    | ingest.DECODER_VIDEO_REQUIRED,
    ca.FORMAT_STRCD: ingest.DECODER_USE_AUDIO | ingest.DECODER_USE_VIDEO
    | ingest.DECODER_VIDEO_REQUIRED,
    ca.FORMAT_STRSPU: ingest.DECODER_USE_AUDIO | ingest.DECODER_USE_VIDEO
    | ingest.DECODER_VIDEO_REQUIRED,
    ca.FORMAT_STRV: ingest.DECODER_USE_VIDEO
    | ingest.DECODER_VIDEO_REQUIRED,
    ca.FORMAT_SBS: ingest.DECODER_USE_VIDEO | ingest.DECODER_VIDEO_REQUIRED,
}

_BS_CODEC_BANNER = ["BS v2", "BS v3", "BS v3 (with DC wrapping)"]


def _info(args, msg):
    if not (args.flags & ca.FLAG_QUIET):
        print(msg, file=sys.stderr)


def _audio_banner_xa(args):
    st = "stereo" if args.audio_channels == 2 else "mono"
    return (f"Audio format: XA-ADPCM, {args.audio_frequency} Hz "
            f"{args.audio_bit_depth}-bit {st}, F={args.audio_xa_file} "
            f"C={args.audio_xa_channel}")


def _video_banner(args):
    fps = args.str_fps_num / args.str_fps_den
    return (f"Video format: {_BS_CODEC_BANNER[args.video_codec]}, "
            f"{args.video_width}x{args.video_height}, {fps:.2f} fps")


def main(argv=None):
    import os

    # The deployment image pins jax_platforms to the TPU plugin; allow an
    # explicit override (e.g. PSXAVENC_PLATFORM=cpu for small host-side
    # jobs where the device round-trip dominates).
    plat = os.environ.get("PSXAVENC_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    if argv is None:
        argv = sys.argv[1:]
    args = ca.Args()
    try:
        if not ca.parse_args(args, list(argv)):
            return 1
    except ca.ArgError:
        return 1

    try:
        dec = ingest.open_av_data(args, _DECODER_FLAGS[args.format])
    except ingest.OpenError:
        # Detail already printed by the ingest layer (decoding.c prints
        # its own message before main.c:66-68 adds this line).
        print(f"Failed to open input file: {args.input_file}",
              file=sys.stderr)
        return 1
    except Exception as e:  # noqa: BLE001 — mirror the reference's exit path
        print(str(e), file=sys.stderr)
        print(f"Failed to open input file: {args.input_file}",
              file=sys.stderr)
        return 1

    try:
        output = open(args.output_file, "wb")
    except OSError:
        print(f"Failed to open output file: {args.output_file}",
              file=sys.stderr)
        return 1

    # Optional profiling (SURVEY §5: the reference has only wall-clock
    # progress lines; we add a real device profile behind an env switch).
    profile_dir = os.environ.get("PSXAVENC_PROFILE")
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
    try:
        return _dispatch(args, dec, output)
    except (RuntimeError, NotImplementedError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    finally:
        output.close()
        if profile_dir:
            import jax

            jax.profiler.stop_trace()
            if not (args.flags & ca.FLAG_QUIET):
                print(f"Profile written to {profile_dir}", file=sys.stderr)


def _dispatch(args, dec, output, unit_encoder=None, frame_results=None):
    """Route to the container muxer. ``unit_encoder``/``frame_results``
    are batch-runner injection points: a capture/replay ADPCM unit
    encoder and pre-encoded video frame results (psxavenc_tpu.batch
    groups many files' device work into shared calls)."""
    fmt = args.format
    if fmt in (ca.FORMAT_XA, ca.FORMAT_XACD):
        from .containers import xa as xamod
        _info(args, _audio_banner_xa(args))
        xamod.encode_file_xa(args, dec, output, unit_encoder=unit_encoder)
    elif fmt in (ca.FORMAT_SPU, ca.FORMAT_VAG):
        if not (args.flags & ca.FLAG_OVERRIDE_LOOP_POINT):
            args.audio_loop_point = ingest.get_av_loop_point(dec, args)
            if args.audio_loop_point >= 0:
                args.flags |= ca.FLAG_SPU_ENABLE_LOOP
        from .containers import vag as vagmod
        _info(args, f"Audio format: SPU-ADPCM, {args.audio_frequency} "
                    "Hz mono")
        vagmod.encode_file_spu(args, dec, output,
                               unit_encoder=unit_encoder)
    elif fmt in (ca.FORMAT_SPUI, ca.FORMAT_VAGI):
        if not (args.flags & ca.FLAG_OVERRIDE_LOOP_POINT):
            args.audio_loop_point = ingest.get_av_loop_point(dec, args)
        from .containers import vag as vagmod
        _info(args, f"Audio format: SPU-ADPCM, {args.audio_frequency} "
                    f"Hz {args.audio_channels} channels, "
                    f"interleave={args.audio_interleave}")
        vagmod.encode_file_spui(args, dec, output,
                                unit_encoder=unit_encoder)
    elif fmt in (ca.FORMAT_STR, ca.FORMAT_STRCD):
        from .containers import strf as strmod
        if dec.has_audio:
            _info(args, _audio_banner_xa(args))
        _info(args, _video_banner(args))
        strmod.encode_file_str(args, dec, output,
                               frame_results=frame_results)
    elif fmt == ca.FORMAT_STRSPU:
        # The reference prints this and still exits 0 (main.c:159-162).
        print("This format is not currently supported", file=sys.stderr)
    elif fmt == ca.FORMAT_STRV:
        from .containers import strf as strmod
        if dec.has_audio:
            _info(args, f"Audio format: SPU-ADPCM, "
                        f"{args.audio_frequency} Hz "
                        f"{args.audio_channels} channels, "
                        f"interleave={args.audio_interleave}")
        _info(args, _video_banner(args))
        strmod.encode_file_strspu(args, dec, output,
                                  frame_results=frame_results)
    elif fmt == ca.FORMAT_SBS:
        from .containers import sbs as sbsmod
        _info(args, _video_banner(args))
        sbsmod.encode_file_sbs(args, dec, output,
                               frame_results=frame_results)

    if not (args.flags & ca.FLAG_HIDE_PROGRESS):
        print("\nDone.", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
