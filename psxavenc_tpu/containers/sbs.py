""".sbs container: fixed-size BS frames back to back (filefmt.c:633-663).

Frames encode in look-ahead device batches and write out as they are
produced — O(batch) memory, shared with the .str muxer's frame feed, so
both the whole-file and streaming ingest tiers route through the same
code (the reference encodes one frame per ensure(0,1)/retire loop
iteration; every frame gets the -a alignment as its budget).
"""

from ..models.bs_video import BsFrameEncoder
from ..utils.progress import Progress
from . import strf


def encode_file_sbs(args, dec, output, frame_results=None):
    enc = BsFrameEncoder(args.video_codec, dec.video_width,
                         dec.video_height)
    source = strf._source_for(dec)
    total = dec.video_frame_count
    if frame_results is not None:
        feed = strf._PrecomputedFrameFeed(frame_results)
    else:
        feed = strf._FrameFeed(enc, source, [args.alignment] * total,
                               total)

    progress = Progress(args)
    for f in range(1, total + 1):
        buffer, _ = feed.frame(f)
        feed.evict_below(f + 1)
        output.write(buffer.tobytes())
        # The reference prints the 0-based loop index j but a quant sum
        # that already includes frame j — sum(j+1 frames)/j
        # (filefmt.c:642-658).
        progress.print_sbs(f - 1, feed.quant_scale_sum(f),
                           args.str_fps_num, args.str_fps_den)
    if hasattr(dec, "close"):
        dec.close()
