"""Multiple-component transforms: RCT (reversible), ICT (irreversible),
custom matrix MCT, and DC level shift.

NumPy reference model (ISO/IEC 15444-1 G.2/G.3).  Device versions live in
grok_tpu/ops/mct.py.

Reference parity: [grok: src/lib/core/transform/mct.cpp :: compress_rev/
compress_irrev and inverses; opj_set_MCT analog for the custom path].
"""

from __future__ import annotations

import numpy as np

# ICT forward (BT.601) and inverse coefficient matrices (G-3, G-4).
ICT_FWD = np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312],
])
ICT_INV = np.array([
    [1.0, 0.0, 1.402],
    [1.0, -0.344136, -0.714136],
    [1.0, 1.772, 0.0],
])


def rct_fwd(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    r = np.asarray(r, dtype=np.int64)
    g = np.asarray(g, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    y = (r + 2 * g + b) >> 2
    cb = b - g
    cr = r - g
    return y, cb, cr


def rct_inv(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    g = y - ((cb + cr) >> 2)
    r = cr + g
    b = cb + g
    return r, g, b


def ict_fwd(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    rgb = np.stack([r, g, b], axis=0).astype(np.float64)
    out = np.tensordot(ICT_FWD, rgb, axes=(1, 0))
    return out[0], out[1], out[2]


def ict_inv(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    ycc = np.stack([y, cb, cr], axis=0).astype(np.float64)
    out = np.tensordot(ICT_INV, ycc, axes=(1, 0))
    return out[0], out[1], out[2]


def custom_mct_fwd(comps: list[np.ndarray], matrix: np.ndarray):
    stacked = np.stack(comps, axis=0).astype(np.float64)
    out = np.tensordot(np.asarray(matrix, dtype=np.float64), stacked, axes=(1, 0))
    return [out[i] for i in range(out.shape[0])]


def custom_mct_inv(comps: list[np.ndarray], matrix: np.ndarray):
    inv = np.linalg.inv(np.asarray(matrix, dtype=np.float64))
    return custom_mct_fwd(comps, inv)


def dc_shift_fwd(x: np.ndarray, prec: int, sgnd: bool) -> np.ndarray:
    if sgnd:
        return np.asarray(x, dtype=np.int64)
    return np.asarray(x, dtype=np.int64) - (1 << (prec - 1))


def dc_shift_inv(x: np.ndarray, prec: int, sgnd: bool) -> np.ndarray:
    if not sgnd:
        x = x + (1 << (prec - 1))
    lo, hi = (-(1 << (prec - 1)), (1 << (prec - 1)) - 1) if sgnd \
        else (0, (1 << prec) - 1)
    return np.clip(x, lo, hi)


def mct_component_norms(irreversible: bool, n: int = 3,
                        custom_inv: np.ndarray | None = None) -> np.ndarray:
    """L2 norm of each inverse-transform column: the per-component distortion
    weight used by PCRD (error in transformed comp c scales pixel MSE by
    norm[c]^2)."""
    if custom_inv is not None:
        inv = np.asarray(custom_inv, dtype=np.float64)
    elif irreversible:
        inv = ICT_INV
    else:
        # RCT inverse linearized: G = Y - (Cb+Cr)/4; R = Cr + G; B = Cb + G
        inv = np.array([
            [1.0, -0.25, 0.75],
            [1.0, -0.25, -0.25],
            [1.0, 0.75, -0.25],
        ])
    return np.sqrt((inv ** 2).sum(axis=0))
