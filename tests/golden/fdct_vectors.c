/* Golden-vector generator: feeds random pixel-difference blocks through
 * libavcodec's AVDCT fdct with dct_algo=FF_DCT_INT (the C islow path the
 * reference relies on in its CI builds) and writes in/out pairs. */
#include <stdio.h>
#include <stdlib.h>
#include <libavcodec/avdct.h>
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>

int main(int argc, char **argv) {
    int n = argc > 1 ? atoi(argv[1]) : 256;
    unsigned seed = argc > 2 ? (unsigned)atoi(argv[2]) : 1234;
    AVDCT *d = avcodec_dct_alloc();
    av_opt_set_int(d, "dct", FF_DCT_INT, 0);
    avcodec_dct_init(d);
    srand(seed);
    FILE *f = fopen("fdct_vectors.bin", "wb");
    for (int i = 0; i < n; i++) {
        int16_t block[64];
        for (int j = 0; j < 64; j++) {
            int r = rand();
            /* mix of full-range, small, and constant blocks */
            if (i % 7 == 0) block[j] = (int16_t)(r % 256 - 128);
            else if (i % 7 == 1) block[j] = (int16_t)(i % 256 - 128);
            else block[j] = (int16_t)(r % 256 - 128);
        }
        fwrite(block, 2, 64, f);
        d->fdct(block);
        fwrite(block, 2, 64, f);
    }
    fclose(f);
    return 0;
}
