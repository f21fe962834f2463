"""The AVX2 ladder-LB totals must equal the scalar form exactly.

The vectorized lower bound (psxav_native.cpp bs_lb_feasible) is
exactness-critical: a too-HIGH total would prove a fitting scale unfit
and change the selected scale (wrong output bytes). This test compiles
a small harness embedding the pre-vectorization scalar form and
compares totals over random + structured frames at every scale, via
feasibility at thr = ref_total and ref_total - 1.
"""

import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
SRC = REPO / "psxavenc_tpu" / "native" / "psxav_native.cpp"

HARNESS = r"""
#include <cstdio>
#include <random>
#include <vector>
#include "%SRC%"
static long lb_total_ref(const int16_t *czz, long nb, int s) {
    int16_t thrm1[64];
    int32_t t2[64], t3[64], t4[64], t5[64], t7[64];
    bs_fill_thrm1(thrm1, s);
    for (int i = 1; i < 64; i++) {
        int32_t d = bs_quant[bs_zagzig[i]] * s;
        int32_t half = d >> 1;
        t2[i] = 2*d-half; t3[i] = 3*d-half; t4[i] = 4*d-half;
        t5[i] = 5*d-half; t7[i] = 7*d-half;
    }
    long total = 0;
    for (long n = 0; n < nb; n++) {
        const int16_t *c = czz + n * 64;
        uint64_t mask = bs_nz_mask64(c, thrm1);
        int prev = 0;
        while (mask) {
            int i = __builtin_ctzll(mask); mask &= mask - 1;
            int run = i - prev - 1; prev = i;
            int32_t a = c[i]; a = a < 0 ? -a : a;
            int c2 = a >= t2[i], c3 = a >= t3[i];
            int lb = 3 + 2*c2 + c3 + 2*(a>=t4[i]) + (a>=t5[i])
                     + 2*(a>=t7[i]);
            int g = (run<3?run:3) + (run>=5) + (run>=8) + (run>=10)
                    + 2*(run>=14) + (run>=17);
            total += lb + (run >= 1 ? c2 + c3 : 0) + g;
        }
    }
    return total;
}
int main() {
    bs_luts_init();
    std::mt19937 rng(11);
    const int W = 320, H = 240;
    const long nb = (W/16)*(H/16)*6;
    std::vector<uint8_t> frame(W*H*3/2);
    std::vector<int16_t> czz(nb*64);
    for (int trial = 0; trial < 12; trial++) {
        for (auto &b : frame) b = (uint8_t)(rng() & 255);
        if (trial % 3 == 1)
            for (size_t i = 0; i < frame.size(); i++)
                frame[i] = (uint8_t)(i % 251);
        if (trial % 3 == 2)
            for (size_t i = 0; i < frame.size(); i++)
                frame[i] = (uint8_t)((i / 320) % 2 ? 255 : 0);
        bs_frame_coefs(frame.data(), W, H, czz.data());
        for (int s = 1; s <= 63; s += (trial % 4) + 1) {
            long ref = lb_total_ref(czz.data(), nb, s);
            bool f1 = bs_lb_feasible(czz.data(), nb, s, ref);
            bool f2 = bs_lb_feasible(czz.data(), nb, s, ref - 1);
            if (!f1 || f2) {
                printf("MISMATCH s=%d trial=%d ref=%ld f1=%d f2=%d\n",
                       s, trial, ref, f1, f2);
                return 1;
            }
        }
    }
    printf("OK\n");
    return 0;
}
"""


@pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")
def test_lb_vector_matches_scalar(tmp_path):
    cpp = tmp_path / "lbcheck.cpp"
    exe = tmp_path / "lbcheck"
    cpp.write_text(HARNESS.replace("%SRC%", str(SRC)))
    subprocess.run(["g++", "-O2", "-std=c++17", "-march=native",
                    "-pthread", str(cpp), "-o", str(exe)], check=True)
    r = subprocess.run([str(exe)], capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0 and "OK" in r.stdout, r.stdout


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
