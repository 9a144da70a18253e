"""BASELINE configs[3]: memory-bounded gigapixel tiled decode on one host.

Stream-encodes a >= 1 gigapixel synthetic image tile by tile (the
Compressor never holds more than one tile), then decodes it tile by
tile through the mmap-backed Decompressor (TLM-seeded tile seeking) —
the full image is NEVER materialized in either direction.  Reports
MP/s + peak RSS for docs/PERF.md; a scaled-down version runs in CI
(tests/test_gigapixel.py).

Usage: python tools/gigapixel_demo.py [side] [tile] [backend]
       (defaults 32768 1024 native -> 1.07 GP; fits in ~a few hundred
        MB of RSS regardless of image size)
"""

from __future__ import annotations

import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def tile_content(x0: int, y0: int, h: int, w: int) -> np.ndarray:
    """Deterministic synthetic content as a pure function of absolute
    pixel position — any tile can be (re)generated independently."""
    yy, xx = np.mgrid[y0:y0 + h, x0:x0 + w]
    v = (128.0 + 60.0 * np.sin(xx / 97.0) * np.cos(yy / 61.0)
         + 40.0 * np.sin((xx + 2 * yy) / 251.0)
         + ((xx * 1103515245 + yy * 12345) % 64) / 4.0)
    return np.clip(v, 0, 255).astype(np.uint8)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def run(side: int, tile: int, backend: str, verify_every: int = 97):
    from grok_tpu.codec import Compressor, Decompressor
    from grok_tpu.core.params import CompressParams, DecompressParams

    ntx = -(-side // tile)
    path = os.path.join(tempfile.gettempdir(), "gigapixel_demo.j2k")
    params = CompressParams(tile_w=tile, tile_h=tile, num_resolutions=5,
                            backend=backend, write_tlm=True)
    print(f"image {side}x{side} = {side * side / 1e6:.0f} MP, "
          f"{ntx * ntx} tiles of {tile}x{tile}, backend={backend}")

    t0 = time.time()
    enc = Compressor(path, width=side, height=side, numcomps=1,
                     params=params)
    for t in range(enc.num_tiles):
        ty, tx = divmod(t, ntx)
        x0, y0 = tx * tile, ty * tile
        h = min(tile, side - y0)
        w = min(tile, side - x0)
        enc.write_tile(t, tile_content(x0, y0, h, w))
    enc.finish()
    t_enc = time.time() - t0
    size = os.path.getsize(path)
    print(f"encode: {side * side / 1e6 / t_enc:.2f} MP/s, "
          f"{size / 2 ** 20:.1f} MB ({8.0 * size / side / side:.2f} bpp), "
          f"peak RSS {rss_mb():.0f} MB")

    t0 = time.time()
    checked = 0
    with Decompressor(path, DecompressParams(backend=backend)) as dec:
        rss_first = None
        for t in range(dec.num_tiles):
            arrs = dec.decompress_tile(t)
            if t % verify_every == 0:
                ty, tx = divmod(t, ntx)
                x0, y0 = tx * tile, ty * tile
                ref = tile_content(x0, y0, arrs[0].shape[0],
                                   arrs[0].shape[1])
                assert np.array_equal(arrs[0], ref), f"tile {t} mismatch"
                checked += 1
            if t == min(4, dec.num_tiles - 1):
                rss_first = rss_mb()
    t_dec = time.time() - t0
    print(f"decode: {side * side / 1e6 / t_dec:.2f} MP/s, "
          f"{checked} tiles verified bit-exact, "
          f"RSS after 5 tiles {rss_first:.0f} MB -> end {rss_mb():.0f} MB")
    naive = side * side * 4 / 2 ** 20
    print(f"(naive full-image int32 buffer would be {naive:.0f} MB)")
    os.unlink(path)
    try:  # finish() normally removes the crash-resume manifest itself
        os.unlink(path + ".manifest.json")
    except FileNotFoundError:
        pass


if __name__ == "__main__":
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    backend = sys.argv[3] if len(sys.argv) > 3 else "native"
    run(side, tile, backend)
