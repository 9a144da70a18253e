"""Device DWT: 5/3 reversible (int32) and 9/7 irreversible (float32) lifting
in JAX, vectorized over leading batch axes.

Bit-exact (5/3) / f32-rounding (9/7) match to the NumPy oracle in
grok_tpu/transform/dwt_np.py; tested in tests/test_ops_dwt.py on the CPU
backend.  The lifting passes are expressed as whole-array shifted adds so XLA
fuses them into a handful of elementwise kernels on the VPU; no Python-level
per-sample work.

Reference parity: [grok: src/lib/core/transform/WaveletFwd, WaveletReverse]
— behavior normative per ISO 15444-1 Annex F.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from grok_tpu.core.geometry import Rect

ALPHA = -1.586134342059924
BETA = -0.052980118572961
GAMMA = 0.882911075530934
DELTA = 0.443506852043971
K = 1.230174104914001


def _extend2(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Whole-sample symmetric extension along the last axis."""
    n = x.shape[-1]
    if n == 1:
        return jnp.tile(x, x.ndim * (1,))[..., :1].repeat(2 * pad + 1, axis=-1)
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg, mode="reflect")


def _interleave(low: jnp.ndarray, high: jnp.ndarray, off: int,
                n: int) -> jnp.ndarray:
    y = jnp.zeros(low.shape[:-1] + (n,), dtype=low.dtype)
    if off % 2 == 0:
        y = y.at[..., 0::2].set(low)
        y = y.at[..., 1::2].set(high)
    else:
        y = y.at[..., 0::2].set(high)
        y = y.at[..., 1::2].set(low)
    return y


def fwd53_1d(x: jnp.ndarray, off: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward 5/3 along the last axis; x int32, interval starts at `off`."""
    n = x.shape[-1]
    if n == 0:
        return x[..., :0], x[..., :0]
    if n == 1:
        if off % 2 == 0:
            return x, x[..., :0]
        return x[..., :0], x * 2
    xe = _extend2(x, 2)
    h = xe[..., 1:-1] - ((xe[..., :-2] + xe[..., 2:]) >> 1)      # odd abs pos
    l = xe[..., 2:-2] + ((h[..., :-2] + h[..., 2:] + 2) >> 2)     # even abs
    hmid = h[..., 1:-1]
    if off % 2 == 0:
        return l[..., 0::2], hmid[..., 1::2]
    return l[..., 1::2], hmid[..., 0::2]


def inv53_1d(low: jnp.ndarray, high: jnp.ndarray, off: int,
             n: int) -> jnp.ndarray:
    if n == 0:
        return low[..., :0]
    if n == 1:
        if off % 2 == 0:
            return low
        return jnp.sign(high) * (jnp.abs(high) >> 1)
    y = _interleave(low, high, off, n)
    ye = _extend2(y, 2)
    e = ye[..., 1:-1] - ((ye[..., :-2] + ye[..., 2:] + 2) >> 2)
    o = ye[..., 2:-2] + ((e[..., :-2] + e[..., 2:]) >> 1)
    emid = e[..., 1:-1]
    x = jnp.zeros_like(y)
    if off % 2 == 0:
        x = x.at[..., 0::2].set(emid[..., 0::2])
        x = x.at[..., 1::2].set(o[..., 1::2])
    else:
        x = x.at[..., 0::2].set(o[..., 0::2])
        x = x.at[..., 1::2].set(emid[..., 1::2])
    return x


def _lift97(a: jnp.ndarray, coef: float, target_parity: int,
            parity: int) -> jnp.ndarray:
    upd = a[..., 1:-1] + jnp.asarray(coef, a.dtype) * (a[..., :-2] + a[..., 2:])
    jpar = (jnp.arange(1, a.shape[-1] - 1) + parity) % 2
    mid = jnp.where(jpar == target_parity, upd, a[..., 1:-1])
    return jnp.concatenate([a[..., :1], mid, a[..., -1:]], axis=-1)


def fwd97_1d(x: jnp.ndarray, off: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    n = x.shape[-1]
    if n == 0:
        return x[..., :0], x[..., :0]
    if n == 1:
        if off % 2 == 0:
            return x, x[..., :0]
        return x[..., :0], x * 2.0
    a = _extend2(x, 4)
    parity = off % 2
    a = _lift97(a, ALPHA, 1, parity)
    a = _lift97(a, BETA, 0, parity)
    a = _lift97(a, GAMMA, 1, parity)
    a = _lift97(a, DELTA, 0, parity)
    core = a[..., 4:-4]
    if off % 2 == 0:
        low = core[..., 0::2] * jnp.asarray(1.0 / K, x.dtype)
        high = core[..., 1::2] * jnp.asarray(K / 2.0, x.dtype)
    else:
        low = core[..., 1::2] * jnp.asarray(1.0 / K, x.dtype)
        high = core[..., 0::2] * jnp.asarray(K / 2.0, x.dtype)
    return low, high


def inv97_1d(low: jnp.ndarray, high: jnp.ndarray, off: int,
             n: int) -> jnp.ndarray:
    if n == 0:
        return low[..., :0]
    if n == 1:
        if off % 2 == 0:
            return low
        return high * 0.5
    y = _interleave(low * jnp.asarray(K, low.dtype),
                    high * jnp.asarray(2.0 / K, high.dtype), off, n)
    a = _extend2(y, 4)
    parity = off % 2
    a = _lift97(a, -DELTA, 0, parity)
    a = _lift97(a, -GAMMA, 1, parity)
    a = _lift97(a, -BETA, 0, parity)
    a = _lift97(a, -ALPHA, 1, parity)
    return a[..., 4:-4]


# ---------------------------------------------------------------------------
# 2D multilevel (static geometry; batched over leading axes)
# ---------------------------------------------------------------------------

def _res_rect(tc_rect: Rect, nl: int, r: int) -> Rect:
    s = 1 << (nl - r)
    return tc_rect.ceil_scale(s, s)


def _swap(x):
    return jnp.swapaxes(x, -1, -2)


def fwd_2d_level(cur, rect: Rect, irreversible: bool):
    f1 = fwd97_1d if irreversible else fwd53_1d
    lo_v, hi_v = f1(_swap(cur), rect.y0)
    ll, hl = f1(_swap(lo_v), rect.x0)
    lh, hh = f1(_swap(hi_v), rect.x0)
    return ll, hl, lh, hh


def inv_2d_level(ll, hl, lh, hh, rect: Rect, irreversible: bool):
    i1 = inv97_1d if irreversible else inv53_1d
    lo_v = i1(ll, hl, rect.x0, rect.w)
    hi_v = i1(lh, hh, rect.x0, rect.w)
    return _swap(i1(_swap(lo_v), _swap(hi_v), rect.y0, rect.h))


def fwd_multilevel(samples, tc_rect: Rect, num_resolutions: int,
                   irreversible: bool) -> list:
    """bands[0] = LL array; bands[r] = (HL, LH, HH) for r >= 1."""
    nl = num_resolutions - 1
    dtype = jnp.float32 if irreversible else jnp.int32
    cur = jnp.asarray(samples, dtype=dtype)
    out: list = [None] * num_resolutions
    for r in range(nl, 0, -1):
        rect = _res_rect(tc_rect, nl, r)
        ll, hl, lh, hh = fwd_2d_level(cur, rect, irreversible)
        out[r] = (hl, lh, hh)
        cur = ll
    out[0] = cur
    return out


def inv_multilevel(bands: list, tc_rect: Rect, num_resolutions: int,
                   irreversible: bool, max_res: int | None = None):
    nl = num_resolutions - 1
    cur = bands[0]
    stop = num_resolutions if max_res is None else max_res
    for r in range(1, stop):
        rect = _res_rect(tc_rect, nl, r)
        hl, lh, hh = bands[r]
        cur = inv_2d_level(cur, hl, lh, hh, rect, irreversible)
    return cur


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def inv_multilevel_flat(flat_bands: tuple, tc_rect_tuple: tuple,
                        num_resolutions: int, irreversible: bool,
                        max_res: int | None = None):
    """jit-friendly wrapper: flat (LL, HL1, LH1, HH1, HL2, ...) band tuple.

    max_res < num_resolutions performs reduced-resolution synthesis (the
    per-level rects still scale by the full decomposition count).
    """
    rect = Rect(*tc_rect_tuple)
    stop = num_resolutions if max_res is None else max_res
    bands: list = [flat_bands[0]]
    for r in range(1, stop):
        i = 1 + 3 * (r - 1)
        bands.append((flat_bands[i], flat_bands[i + 1], flat_bands[i + 2]))
    return inv_multilevel(bands, rect, num_resolutions, irreversible,
                          max_res=stop)
