#include <libavcodec/avdct.h>
AVDCT *shim_dct_alloc(void);
#define avcodec_dct_alloc shim_dct_alloc
