"""Device MCT + DC level shift (JAX), batched over leading axes.

RCT is exact int32 arithmetic; ICT is f32.  Matches
grok_tpu/transform/mct_np.py (tests/test_ops_dwt.py).

Reference parity: [grok: src/lib/core/transform/mct.cpp] — ISO 15444-1 G.2/G.3.
"""

from __future__ import annotations

import jax.numpy as jnp

ICT_FWD = ((0.299, 0.587, 0.114),
           (-0.168736, -0.331264, 0.5),
           (0.5, -0.418688, -0.081312))
ICT_INV = ((1.0, 0.0, 1.402),
           (1.0, -0.344136, -0.714136),
           (1.0, 1.772, 0.0))


def rct_fwd(r, g, b):
    y = (r + 2 * g + b) >> 2
    return y, b - g, r - g


def rct_inv(y, cb, cr):
    g = y - ((cb + cr) >> 2)
    return cr + g, g, cb + g


def _mat3(m, a, b, c):
    return tuple(
        jnp.asarray(m[i][0], a.dtype) * a + jnp.asarray(m[i][1], a.dtype) * b
        + jnp.asarray(m[i][2], a.dtype) * c for i in range(3))


def ict_fwd(r, g, b):
    return _mat3(ICT_FWD, r, g, b)


def ict_inv(y, cb, cr):
    return _mat3(ICT_INV, y, cb, cr)


def dc_shift_fwd(x, prec: int, sgnd: bool):
    return x if sgnd else x - (1 << (prec - 1))


def dc_shift_inv(x, prec: int, sgnd: bool):
    if not sgnd:
        x = x + (1 << (prec - 1))
        return jnp.clip(x, 0, (1 << prec) - 1)
    return jnp.clip(x, -(1 << (prec - 1)), (1 << (prec - 1)) - 1)
