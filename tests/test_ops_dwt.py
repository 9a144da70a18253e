"""Device (JAX) DWT/MCT vs the NumPy oracle — CPU backend (conftest pins
JAX_PLATFORMS=cpu)."""

import numpy as np
import pytest

from grok_tpu.core.geometry import Rect
from grok_tpu.ops import dwt as jdwt
from grok_tpu.ops import mct as jmct
from grok_tpu.transform import dwt_np, mct_np

SHAPES = [(64, 64), (37, 53), (5, 7), (1, 16), (16, 1), (33, 64), (2, 3)]


@pytest.mark.parametrize("h,w", SHAPES)
@pytest.mark.parametrize("off", [(0, 0), (3, 5)])
def test_53_multilevel_exact(h, w, off):
    rng = np.random.default_rng(h * 100 + w)
    x = rng.integers(-1 << 11, 1 << 11, (h, w)).astype(np.int64)
    rect = Rect(off[0], off[1], off[0] + w, off[1] + h)
    nres = 3
    ref = dwt_np.fwd_multilevel(x, rect, nres, False)
    got = jdwt.fwd_multilevel(x, rect, nres, False)
    assert np.array_equal(np.asarray(got[0]), ref[0])
    for r in range(1, nres):
        for i in range(3):
            assert np.array_equal(np.asarray(got[r][i]), ref[r][i]), (r, i)
    back = jdwt.inv_multilevel(got, rect, nres, False)
    assert np.array_equal(np.asarray(back), x)


@pytest.mark.parametrize("h,w", SHAPES)
def test_97_multilevel_close(h, w):
    rng = np.random.default_rng(h * 7 + w)
    x = rng.normal(0, 100, (h, w))
    rect = Rect(0, 0, w, h)
    nres = 3
    ref = dwt_np.fwd_multilevel(x, rect, nres, True)
    got = jdwt.fwd_multilevel(x.astype(np.float32), rect, nres, True)
    assert np.allclose(np.asarray(got[0]), ref[0], rtol=1e-4, atol=1e-2)
    back = jdwt.inv_multilevel(got, rect, nres, True)
    assert np.allclose(np.asarray(back), x, rtol=1e-4, atol=5e-2)


def test_53_batched():
    rng = np.random.default_rng(0)
    x = rng.integers(-1000, 1000, (4, 32, 48)).astype(np.int32)
    rect = Rect(0, 0, 48, 32)
    got = jdwt.fwd_multilevel(x, rect, 3, False)
    for b in range(4):
        ref = dwt_np.fwd_multilevel(x[b].astype(np.int64), rect, 3, False)
        assert np.array_equal(np.asarray(got[0][b]), ref[0])
    back = jdwt.inv_multilevel(got, rect, 3, False)
    assert np.array_equal(np.asarray(back), x)


def test_rct_exact():
    rng = np.random.default_rng(1)
    r, g, b = (rng.integers(-128, 128, (17, 23)).astype(np.int32)
               for _ in range(3))
    y, cb, cr = jmct.rct_fwd(r, g, b)
    ry, rcb, rcr = mct_np.rct_fwd(r, g, b)
    assert np.array_equal(np.asarray(y), ry)
    assert np.array_equal(np.asarray(cb), rcb)
    assert np.array_equal(np.asarray(cr), rcr)
    r2, g2, b2 = jmct.rct_inv(y, cb, cr)
    assert np.array_equal(np.asarray(r2), r)
    assert np.array_equal(np.asarray(g2), g)
    assert np.array_equal(np.asarray(b2), b)


def test_ict_close():
    rng = np.random.default_rng(2)
    r, g, b = (rng.normal(0, 100, (9, 11)).astype(np.float32)
               for _ in range(3))
    y, cb, cr = jmct.ict_fwd(r, g, b)
    r2, g2, b2 = jmct.ict_inv(y, cb, cr)
    assert np.allclose(np.asarray(r2), r, atol=1e-3)
    assert np.allclose(np.asarray(g2), g, atol=1e-3)
    assert np.allclose(np.asarray(b2), b, atol=1e-3)
