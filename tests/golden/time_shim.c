/* LD_PRELOAD shim making time() deterministic for progress-line golden
 * tests: every call advances the clock by one second, so the reference's
 * get_elapsed_time (filefmt.c:39-54, called once per sector/block write)
 * prints a progress line for every write with t = 1, 2, 3, ...
 * The Python side monkeypatches time.time with the same counter. */
#include <time.h>

static time_t counter = 1000000000;

time_t time(time_t *tloc) {
    time_t v = counter++;
    if (tloc)
        *tloc = v;
    return v;
}
