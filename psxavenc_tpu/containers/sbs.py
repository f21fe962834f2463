""".sbs container: fixed-size BS frames back to back (filefmt.c:633-663)."""

from .. import cli_args as ca
from ..models.bs_video import BsFrameEncoder
from ..utils.progress import Progress


def encode_file_sbs(args, dec, output):
    enc = BsFrameEncoder(args.video_codec, dec.video_width,
                         dec.video_height)
    progress = Progress(args)
    j = 0
    while dec.ensure_av_data(0, 1):
        frame = dec.video_window()[0]
        buffer, _ = enc.encode_frame(frame, args.alignment)
        dec.retire_av_data(0, 1)
        output.write(buffer.tobytes())
        j += 1
        progress.print_sbs(j, enc.quant_scale_sum, args.str_fps_num,
                           args.str_fps_den)
