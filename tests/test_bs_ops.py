"""BS op-level tests: closed-form bit lengths vs the LUT, clamp/rounding."""

import numpy as np
import pytest

import jax.numpy as jnp

from psxavenc_tpu.ops import bs


def test_ac_bits_closed_form_exhaustive():
    runs = np.arange(0, 63)
    mags = np.arange(1, 513)
    r, a = np.meshgrid(runs, mags, indexing="ij")
    got = np.asarray(bs.ac_bits_closed_form(jnp.asarray(r),
                                            jnp.asarray(a)))
    # LUT keyed by (run<<10)|(level & 0x3FF), covering both signs.
    for sign in (1, -1):
        key = (r << 10) | ((sign * a) & 0x3FF)
        want = bs.AC_BITS_LUT[key]
        assert np.array_equal(got, want), \
            np.argwhere(got != want)[:5]


def test_ac_code_closed_form_exhaustive():
    """Code values match AC_CODE_LUT for every possible (run, level) key,
    both signs, including escapes (clamped levels span [-512, 510])."""
    runs = np.arange(0, 63)
    mags = np.arange(1, 513)
    r, a = np.meshgrid(runs, mags, indexing="ij")
    for sign in (1, -1):
        ac = sign * a
        bits = bs.ac_bits_closed_form(jnp.asarray(r), jnp.asarray(a))
        got = np.asarray(bs.ac_code_closed_form(
            jnp.asarray(r), jnp.asarray(ac), bits))
        key = (r << 10) | (ac & 0x3FF)
        want = bs.AC_CODE_LUT[key]
        assert np.array_equal(got, want), \
            (sign, np.argwhere(got != want)[:5])


def test_ac_bits_code_closed_form_exhaustive():
    """The fused (bits, code) emitter chain matches BOTH LUTs for every
    possible (run, level) key, both signs, including escapes."""
    runs = np.arange(0, 63)
    mags = np.arange(1, 513)
    r, a = np.meshgrid(runs, mags, indexing="ij")
    for sign in (1, -1):
        ac = sign * a
        got_b, got_c = bs.ac_bits_code_closed_form(jnp.asarray(r),
                                                   jnp.asarray(ac))
        key = (r << 10) | (ac & 0x3FF)
        assert np.array_equal(np.asarray(got_b), bs.AC_BITS_LUT[key]), \
            (sign, np.argwhere(np.asarray(got_b) != bs.AC_BITS_LUT[key])[:5])
        assert np.array_equal(np.asarray(got_c), bs.AC_CODE_LUT[key]), \
            (sign, np.argwhere(np.asarray(got_c) != bs.AC_CODE_LUT[key])[:5])


def test_div_rounded_half_away():
    n = jnp.asarray(np.arange(-10000, 10000, 7))
    for d in (2, 3, 16, 83 * 63):
        got = np.asarray(bs._div_rounded(n, jnp.int32(d)))
        want = np.asarray([round(float(v) / d) for v in np.asarray(n)])
        # Python round() is half-even; emulate C round() half-away.
        want = np.sign(np.asarray(n)) * \
            ((np.abs(np.asarray(n)) + d // 2) // d)
        assert np.array_equal(got, want)


def test_clamp_coeff():
    x = jnp.asarray(np.arange(-40000, 40000, 13))
    got = np.asarray(bs._clamp_coeff(x))
    w = ((np.arange(-40000, 40000, 13) & 0xFFFF) ^ 0x8000) - 0x8000
    want = np.clip(w, -0x200, 0x1FE)
    assert np.array_equal(got, want)

def test_div_rounded_fast_exact():
    """The f32-reciprocal division must be exact over the full operating
    range: |n| <= 32767 (int16 coefficients), d in the quant divisor set."""
    rng = np.random.default_rng(0)
    n = np.concatenate([
        np.arange(-32768, 32768, 97),
        rng.integers(-32768, 32768, 5000),
    ])
    divisors = sorted({int(q) * s for q in bs.QUANT_PSX
                       for s in range(1, 64)} | {16})
    nj = jnp.asarray(n)
    for d in divisors[::7] + [divisors[0], divisors[-1]]:
        got = np.asarray(bs._div_rounded_fast(nj, jnp.int32(d)))
        want = np.asarray(bs._div_rounded(nj, jnp.int32(d)))
        assert np.array_equal(got, want), d


def _dc_chain_model(dc, v3dc):
    """Sequential reference semantics (mdec.c:455-480)."""
    last = [0, 0, 0]
    out = []
    for k, d in enumerate(dc):
        t = min(k % 6, 2)
        n, dd = int(d) - last[t], 4
        q = (abs(n) + 2) // 4
        delta = q if n >= 0 else -q
        last[t] += delta * 4
        if v3dc:
            if delta < -0x80:
                delta += 0x100
            elif delta > 0x80:
                delta -= 0x100
        out.append(delta & 0x1FF)
    return out


@pytest.mark.parametrize("v3dc", [False, True])
def test_dc_chain_matches_sequential(v3dc):
    rng = np.random.default_rng(4)
    for trial in range(4):
        nb = 6 * int(rng.integers(1, 80))
        dc = rng.integers(-512, 511, nb).astype(np.int32)
        codec = bs.BS_V3DC if v3dc else bs.BS_V3
        keys, types = bs.dc_chain(jnp.asarray(dc), codec)
        want = _dc_chain_model(dc, v3dc)
        assert np.asarray(keys).tolist() == want, trial
        assert np.array_equal(np.asarray(types),
                              np.minimum(np.arange(nb) % 6, 2))


def test_dc_closed_form_matches_lut_exhaustive():
    """dc_bits_code_closed_form == the (3, 512) DC LUTs for EVERY
    (type, key), including the unmapped delta -256 (deterministically
    -255's widest negative code)."""
    keys = np.tile(np.arange(512, dtype=np.int32), 3)
    types = np.repeat(np.arange(3, dtype=np.int32), 512)
    b, c = bs.dc_bits_code_closed_form(jnp.asarray(types),
                                       jnp.asarray(keys))
    assert np.array_equal(np.asarray(b), bs.DC_BITS_LUT[types, keys])
    assert np.array_equal(np.asarray(c), bs.DC_CODE_LUT[types, keys])
