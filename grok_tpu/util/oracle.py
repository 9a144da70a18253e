"""Oracle wrapper: OpenJPEG 2.5.0 via Pillow.

The reference mount is empty (SURVEY.md §0), so the stand-in conformance and
performance oracle is the locally installed libopenjp2 2.5.0 (Grok's direct
upstream) driven through Pillow.  Used only by tests and benchmarks — never
by the codec itself.
"""

from __future__ import annotations

import io

import numpy as np

try:
    from PIL import Image as PILImage

    HAVE_ORACLE = True
except Exception:  # pragma: no cover
    HAVE_ORACLE = False


def _to_pil(arr: np.ndarray):
    arr = np.asarray(arr)
    if arr.ndim == 2:
        return PILImage.fromarray(arr.astype(np.uint8), mode="L")
    if arr.ndim == 3 and arr.shape[2] == 3:
        return PILImage.fromarray(arr.astype(np.uint8), mode="RGB")
    raise ValueError(f"unsupported oracle array shape {arr.shape}")


def oracle_encode(arr: np.ndarray, *, irreversible: bool = False,
                  rate: float | None = None, num_resolutions: int = 6,
                  tile_size: tuple[int, int] | None = None,
                  progression: str = "LRCP",
                  codeblock_size: tuple[int, int] | None = None,
                  precinct_size: tuple[int, int] | None = None,
                  layer_rates: list[float] | None = None,
                  jp2: bool = False) -> bytes:
    """Encode uint8 gray/RGB array with OpenJPEG; returns codestream bytes.

    rate: compression ratio (e.g. 8 -> ~1 bpp on 8-bit gray); None = lossless.
    """
    img = _to_pil(arr)
    buf = io.BytesIO()
    kwargs: dict = {
        "irreversible": irreversible,
        "num_resolutions": num_resolutions,
        "progression": progression,
    }
    if rate is not None:
        kwargs["quality_mode"] = "rates"
        kwargs["quality_layers"] = [rate]
    elif layer_rates is not None:
        kwargs["quality_mode"] = "rates"
        kwargs["quality_layers"] = layer_rates
    if tile_size is not None:
        kwargs["tile_size"] = tile_size
    if codeblock_size is not None:
        kwargs["codeblock_size"] = codeblock_size
    if precinct_size is not None:
        kwargs["precinct_size"] = precinct_size
    img.save(buf, format="JPEG2000", codec="jp2" if jp2 else "j2k", **kwargs)
    return buf.getvalue()


def oracle_decode(data: bytes) -> np.ndarray:
    img = PILImage.open(io.BytesIO(data))
    return np.array(img)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def synthetic_image(h: int, w: int, channels: int = 1, seed: int = 0) -> np.ndarray:
    """Natural-ish test content: gradients + sinusoid texture + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (
        96 + 80 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
        + 40 * (xx / max(w - 1, 1))
        + 24 * (yy / max(h - 1, 1))
    )
    out = np.empty((h, w, channels), dtype=np.uint8)
    for c in range(channels):
        chan = base + 12 * rng.standard_normal((h, w)) + 20 * c
        out[:, :, c] = np.clip(chan, 0, 255).astype(np.uint8)
    return out[:, :, 0] if channels == 1 else out
