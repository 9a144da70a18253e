"""DWT 5/3 and 9/7: perfect reconstruction, parity, shapes."""

import numpy as np
import pytest

from grok_tpu.core.geometry import BAND_HH, BAND_HL, BAND_LH, BAND_LL, Rect, band_rect
from grok_tpu.transform import dwt_np
from grok_tpu.transform.mct_np import (dc_shift_fwd, dc_shift_inv, ict_fwd,
                                       ict_inv, rct_fwd, rct_inv)


@pytest.mark.parametrize("n,off", [(1, 0), (1, 1), (2, 0), (2, 1), (3, 0),
                                   (3, 1), (7, 2), (8, 3), (64, 0), (65, 5)])
def test_53_1d_roundtrip(n, off, rng):
    x = rng.integers(-1000, 1000, size=(4, n)).astype(np.int64)
    lo, hi = dwt_np.fwd53_1d(x, off)
    n_even = -(-(off + n) // 2) - -(-off // 2)
    assert lo.shape[-1] == n_even
    assert lo.shape[-1] + hi.shape[-1] == n
    y = dwt_np.inv53_1d(lo, hi, off, n)
    np.testing.assert_array_equal(y, x)


@pytest.mark.parametrize("n,off", [(1, 0), (1, 1), (2, 1), (5, 0), (64, 0),
                                   (65, 3)])
def test_97_1d_roundtrip(n, off, rng):
    x = rng.standard_normal((3, n)) * 100
    lo, hi = dwt_np.fwd97_1d(x, off)
    y = dwt_np.inv97_1d(lo, hi, off, n)
    np.testing.assert_allclose(y, x, atol=1e-9)


def test_97_gains():
    """DC lands in low band with unit gain; Nyquist in high with unit gain."""
    n = 64
    dc = np.full((1, n), 7.0)
    lo, hi = dwt_np.fwd97_1d(dc, 0)
    np.testing.assert_allclose(lo, 7.0, atol=1e-6)
    np.testing.assert_allclose(hi, 0.0, atol=1e-6)
    nyq = 5.0 * (-1.0) ** np.arange(n)[None, :]
    lo, hi = dwt_np.fwd97_1d(nyq, 0)
    # interior high samples carry the alternation at unit gain
    np.testing.assert_allclose(np.abs(hi[0, 2:-2]), 5.0, rtol=1e-6)
    np.testing.assert_allclose(lo[0, 2:-2], 0.0, atol=1e-5)


@pytest.mark.parametrize("rect", [
    Rect(0, 0, 64, 64), Rect(0, 0, 65, 63), Rect(3, 5, 101, 77),
    Rect(1, 1, 2, 2), Rect(17, 9, 18, 80),
])
@pytest.mark.parametrize("irreversible", [False, True])
def test_multilevel_roundtrip(rect, irreversible, rng):
    nres = 4
    x = rng.integers(-128, 128, size=(rect.h, rect.w)).astype(np.int64)
    xin = x.astype(np.float64) if irreversible else x
    bands = dwt_np.fwd_multilevel(xin, rect, nres, irreversible)
    # band shapes must match geometry.band_rect
    nl = nres - 1
    ll_r = band_rect(rect, nl, 0, BAND_LL)
    assert bands[0].shape == (ll_r.h, ll_r.w)
    for r in range(1, nres):
        for arr, orient in zip(bands[r], (BAND_HL, BAND_LH, BAND_HH)):
            br = band_rect(rect, nl, r, orient)
            assert arr.shape == (br.h, br.w), (r, orient)
    y = dwt_np.inv_multilevel(bands, rect, nres, irreversible)
    if irreversible:
        np.testing.assert_allclose(y, xin, atol=1e-8)
    else:
        np.testing.assert_array_equal(y, x)


def test_53_energy_compaction(rng):
    """Smooth input: detail bands must be near-zero."""
    x = np.arange(64, dtype=np.int64)[None, :].repeat(64, axis=0)
    bands = dwt_np.fwd_multilevel(x, Rect(0, 0, 64, 64), 3, False)
    for r in (1, 2):
        hl, lh, hh = bands[r]
        assert np.abs(lh).max() <= 1
        assert np.abs(hh).max() <= 1


def test_rct_roundtrip(rng):
    r, g, b = (rng.integers(-128, 128, size=(32, 32)).astype(np.int64)
               for _ in range(3))
    y, cb, cr = rct_fwd(r, g, b)
    r2, g2, b2 = rct_inv(y, cb, cr)
    np.testing.assert_array_equal(r2, r)
    np.testing.assert_array_equal(g2, g)
    np.testing.assert_array_equal(b2, b)


def test_ict_roundtrip(rng):
    r, g, b = (rng.standard_normal((16, 16)) * 100 for _ in range(3))
    y, cb, cr = ict_fwd(r, g, b)
    r2, g2, b2 = ict_inv(y, cb, cr)
    # the standard's ICT constants are rounded; fwd/inv are not exact inverses
    np.testing.assert_allclose(r2, r, atol=0.01)
    np.testing.assert_allclose(g2, g, atol=0.01)
    np.testing.assert_allclose(b2, b, atol=0.01)


def test_dc_shift(rng):
    x = rng.integers(0, 256, size=(8, 8))
    s = dc_shift_fwd(x, 8, False)
    assert s.min() >= -128 and s.max() <= 127
    np.testing.assert_array_equal(dc_shift_inv(s, 8, False), x)
    # clamp on overflow
    np.testing.assert_array_equal(dc_shift_inv(np.array([200]), 8, False), [255])
