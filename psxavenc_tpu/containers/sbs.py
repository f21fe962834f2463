""".sbs container: fixed-size BS frames back to back (filefmt.c:633-663)."""

from ..models.bs_video import BsFrameEncoder
from ..utils.progress import Progress


def encode_file_sbs(args, dec, output):
    enc = BsFrameEncoder(args.video_codec, dec.video_width,
                         dec.video_height)
    # Reference loop: one frame per iteration while frames remain
    # (ensure(0,1)); all budgets equal the -a alignment.
    frames = []
    while dec.ensure_av_data(0, 1):
        frames.append(dec.video_window()[0])
        dec.retire_av_data(0, 1)

    progress = Progress(args)
    results = enc.encode_frames(frames, [args.alignment] * len(frames))
    for j, (buffer, _) in enumerate(results):
        output.write(buffer.tobytes())
        progress.print_sbs(j + 1, enc.quant_scale_sum, args.str_fps_num,
                           args.str_fps_den)
