"""DWT lifting: 5/3 reversible (exact int) and 9/7 irreversible (float).

NumPy reference model (ISO/IEC 15444-1 Annex F).  This is the host oracle
for the device kernels in grok_tpu/ops/dwt.py, which must match it exactly
(5/3) / to f32 rounding (9/7).

Conventions pinned for oracle interop (OpenJPEG/Grok):
  - forward 2D per level: vertical 1D first, then horizontal;
    inverse: horizontal first, then vertical
    [grok: src/lib/core/transform/WaveletFwd/WaveletReverse]
  - absolute canvas parity: even canvas coordinates are low-pass samples;
    a tile-component starting at an odd coordinate swaps phases (B-15/F-8)
  - whole-sample symmetric extension at interval boundaries (F.3.7)

9/7 scaling (derived from the lifting DC/Nyquist gains; ISO Table F.4):
forward low *= 1/K, high *= K/2 with K = 1.230174104914001, so the decoder's
low *= K, high *= 2/K followed by inverse lifting reconstructs exactly.
"""

from __future__ import annotations

import numpy as np

ALPHA = -1.586134342059924
BETA = -0.052980118572961
GAMMA = 0.882911075530934
DELTA = 0.443506852043971
K = 1.230174104914001


def _extend2(x: np.ndarray, pad: int) -> np.ndarray:
    """Whole-sample symmetric extension along the last axis (period 2(N-1))."""
    n = x.shape[-1]
    if n == 1:
        reps = [1] * (x.ndim - 1) + [2 * pad + 1]
        return np.tile(x, reps)
    idx = np.arange(-pad, n + pad)
    m = np.mod(idx, 2 * n - 2)
    m = np.where(m >= n, 2 * n - 2 - m, m)
    return x[..., m]


def _c_div2(v: np.ndarray) -> np.ndarray:
    """C-style truncating division by 2 (matches the reference's lone-sample
    path; only reachable on truncated lossy 5/3 streams)."""
    return np.sign(v) * (np.abs(v) >> 1)


def fwd53_1d(x: np.ndarray, off: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward 5/3 along the last axis of an interval starting at canvas
    coordinate `off`.  Returns (low, high) = (even-position, odd-position)
    subband samples."""
    n = x.shape[-1]
    if n == 0:
        return x[..., :0], x[..., :0]
    if n == 1:
        if off % 2 == 0:
            return x.copy(), x[..., :0]
        return x[..., :0], x * 2
    xe = _extend2(x, 2)  # indices j correspond to abs position off + j - 2
    # high at odd abs positions, low at even abs positions
    h = np.empty_like(xe)
    h[..., 1:-1] = xe[..., 1:-1] - ((xe[..., :-2] + xe[..., 2:]) >> 1)
    l = xe[..., 2:-2] + ((h[..., 1:-3] + h[..., 3:-1] + 2) >> 2)
    hmid = h[..., 2:-2]
    if off % 2 == 0:
        return l[..., 0::2], hmid[..., 1::2]
    return l[..., 1::2], hmid[..., 0::2]


def inv53_1d(low: np.ndarray, high: np.ndarray, off: int, n: int) -> np.ndarray:
    """Inverse 5/3: interleave (low, high) back to n samples at offset off."""
    if n == 0:
        return low[..., :0]
    if n == 1:
        if off % 2 == 0:
            return low.copy()
        return _c_div2(high)
    # int32 is ample for any Part-1 coefficient range and halves bandwidth
    y = np.empty(low.shape[:-1] + (n,), dtype=np.int32)
    if off % 2 == 0:
        y[..., 0::2] = low
        y[..., 1::2] = high
    else:
        y[..., 0::2] = high
        y[..., 1::2] = low
    ye = _extend2(y, 2)
    e = np.empty_like(ye)
    e[..., 1:-1] = ye[..., 1:-1] - ((ye[..., :-2] + ye[..., 2:] + 2) >> 2)
    o = ye[..., 2:-2] + ((e[..., 1:-3] + e[..., 3:-1]) >> 1)
    x = np.empty_like(y)
    if off % 2 == 0:
        x[..., 0::2] = e[..., 2:-2][..., 0::2]
        x[..., 1::2] = o[..., 1::2]
    else:
        x[..., 0::2] = o[..., 0::2]
        x[..., 1::2] = e[..., 2:-2][..., 1::2]
    return x


def fwd97_1d(x: np.ndarray, off: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward 9/7 along the last axis (float64 model; kernels use f32)."""
    n = x.shape[-1]
    if n == 0:
        return x[..., :0], x[..., :0]
    if n == 1:
        if off % 2 == 0:
            return x.copy(), x[..., :0]
        return x[..., :0], x * 2.0
    xe = _extend2(np.asarray(x, dtype=np.float64), 4)
    # lifting on the extended signal; j abs parity = (off + j - 4) % 2
    a = xe.copy()
    parity = (off % 2 + 4) % 2  # parity of index 0 in `a` == parity of off-4 == off
    # step 1: odd += alpha * (even neighbors)
    s_odd = slice(1, -1)

    def lift(arr, coef, target_parity):
        # arr[j] += coef * (arr[j-1] + arr[j+1]) for j of target_parity (abs)
        upd = arr[..., 1:-1] + coef * (arr[..., :-2] + arr[..., 2:])
        jpar = (np.arange(1, arr.shape[-1] - 1) + parity) % 2
        mask = jpar == target_parity
        out = arr.copy()
        out[..., 1:-1] = np.where(mask, upd, arr[..., 1:-1])
        return out

    a = lift(a, ALPHA, 1)
    a = lift(a, BETA, 0)
    a = lift(a, GAMMA, 1)
    a = lift(a, DELTA, 0)
    core = a[..., 4:-4]
    cpar = (np.arange(core.shape[-1]) + off) % 2
    low = core[..., cpar == 0] * (1.0 / K)
    high = core[..., cpar == 1] * (K / 2.0)
    return low, high


def inv97_1d(low: np.ndarray, high: np.ndarray, off: int, n: int) -> np.ndarray:
    if n == 0:
        return low[..., :0]
    if n == 1:
        if off % 2 == 0:
            return low.copy()
        return high / 2.0
    y = np.empty(low.shape[:-1] + (n,), dtype=np.float64)
    if off % 2 == 0:
        y[..., 0::2] = low * K
        y[..., 1::2] = high * (2.0 / K)
    else:
        y[..., 0::2] = high * (2.0 / K)
        y[..., 1::2] = low * K
    a = _extend2(y, 4)
    parity = off % 2

    def lift(arr, coef, target_parity):
        upd = arr[..., 1:-1] + coef * (arr[..., :-2] + arr[..., 2:])
        jpar = (np.arange(1, arr.shape[-1] - 1) + parity) % 2
        mask = jpar == target_parity
        out = arr.copy()
        out[..., 1:-1] = np.where(mask, upd, arr[..., 1:-1])
        return out

    a = lift(a, -DELTA, 0)
    a = lift(a, -GAMMA, 1)
    a = lift(a, -BETA, 0)
    a = lift(a, -ALPHA, 1)
    return a[..., 4:-4]


# ---------------------------------------------------------------------------
# 2D multi-level over a tile-component rect
# ---------------------------------------------------------------------------

from grok_tpu.core.geometry import Rect, ceil_div  # noqa: E402


def _res_rect(tc_rect: Rect, nl: int, r: int) -> Rect:
    s = 1 << (nl - r)
    return tc_rect.ceil_scale(s, s)


def fwd_2d_level(cur: np.ndarray, rect: Rect, irreversible: bool):
    """One forward level: vertical then horizontal split.

    cur covers `rect` (resolution-r coords).  Returns (ll, hl, lh, hh).
    """
    f1 = fwd97_1d if irreversible else fwd53_1d
    # vertical: operate along columns -> transpose to use last-axis 1D
    lo_v, hi_v = f1(np.swapaxes(cur, -1, -2), rect.y0)
    lo_v = np.swapaxes(lo_v, -1, -2)  # rows at even abs y
    hi_v = np.swapaxes(hi_v, -1, -2)
    ll, hl = f1(lo_v, rect.x0)
    lh, hh = f1(hi_v, rect.x0)
    return ll, hl, lh, hh


def inv_2d_level(ll, hl, lh, hh, rect: Rect, irreversible: bool):
    """One inverse level: horizontal first, then vertical (oracle order)."""
    i1 = inv97_1d if irreversible else inv53_1d
    lo_v = i1(ll, hl, rect.x0, rect.w)
    hi_v = i1(lh, hh, rect.x0, rect.w)
    full_t = i1(np.swapaxes(lo_v, -1, -2), np.swapaxes(hi_v, -1, -2),
                rect.y0, rect.h)
    return np.swapaxes(full_t, -1, -2)


def fwd_multilevel(samples: np.ndarray, tc_rect: Rect, num_resolutions: int,
                   irreversible: bool) -> list:
    """Full forward DWT.  Returns bands[r]: bands[0] = LL array; for r>=1
    bands[r] = (HL, LH, HH) arrays, matching geometry.band_rect shapes."""
    nl = num_resolutions - 1
    cur = samples if irreversible else np.asarray(samples, dtype=np.int64)
    out: list = [None] * num_resolutions
    for r in range(nl, 0, -1):
        rect = _res_rect(tc_rect, nl, r)
        ll, hl, lh, hh = fwd_2d_level(cur, rect, irreversible)
        out[r] = (hl, lh, hh)
        cur = ll
    out[0] = cur
    return out


def inv_multilevel(bands: list, tc_rect: Rect, num_resolutions: int,
                   irreversible: bool) -> np.ndarray:
    nl = num_resolutions - 1
    cur = bands[0]
    for r in range(1, num_resolutions):
        rect = _res_rect(tc_rect, nl, r)
        hl, lh, hh = bands[r]
        cur = inv_2d_level(cur, hl, lh, hh, rect, irreversible)
    return cur
