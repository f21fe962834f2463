/* Golden-oracle build shim: force FF_DCT_INT (the C islow FDCT) so the
 * locally built reference binary matches upstream CI builds, which compile
 * FFmpeg with --disable-mmx (see reference .github/scripts/build.sh:55).
 * Without this, libavcodec on x86 selects ff_fdct_sse2 which is not
 * bit-identical to the C path. */
#include <libavcodec/avdct.h>
#include <libavutil/opt.h>
#include <libavcodec/avcodec.h>
#undef avcodec_dct_alloc  /* the -include define must not rewrite this TU */
AVDCT *shim_dct_alloc(void) {
    AVDCT *d = avcodec_dct_alloc();
    if (d) av_opt_set_int(d, "dct", FF_DCT_INT, 0);
    return d;
}
