"""Scaled-down BASELINE configs[3]: memory-bounded tiled streaming.

The full-scale demo (tools/gigapixel_demo.py, >= 1 GP) streams tiles
through codec.Compressor / Decompressor without ever materializing the
image; here a small multi-tile image exercises the same path and the
round-4 decoded-tile LRU bound that makes the decode side
memory-bounded (SURVEY §6 configs[3]).
"""

import os

import numpy as np
import pytest

from grok_tpu.codec import Compressor, Decompressor
from grok_tpu.core.params import CompressParams, DecompressParams

from tools.gigapixel_demo import tile_content

SIDE, TILE = 1280, 512          # 3x3 tiles, ragged right/bottom edges


@pytest.fixture(scope="module")
def streamed_j2k(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gp") / "gp.j2k")
    params = CompressParams(tile_w=TILE, tile_h=TILE, num_resolutions=4,
                            backend="native", write_tlm=True)
    enc = Compressor(path, width=SIDE, height=SIDE, numcomps=1,
                     params=params)
    ntx = -(-SIDE // TILE)
    for t in range(enc.num_tiles):
        ty, tx = divmod(t, ntx)
        x0, y0 = tx * TILE, ty * TILE
        enc.write_tile(t, tile_content(x0, y0, min(TILE, SIDE - y0),
                                       min(TILE, SIDE - x0)))
    enc.finish()
    return path


def _check_tile(dec, t, ntx):
    arrs = dec.decompress_tile(t)
    ty, tx = divmod(t, ntx)
    ref = tile_content(tx * TILE, ty * TILE, arrs[0].shape[0],
                       arrs[0].shape[1])
    assert np.array_equal(arrs[0], ref), f"tile {t} mismatch"


def test_streaming_roundtrip_all_tiles(streamed_j2k):
    ntx = -(-SIDE // TILE)
    with Decompressor(streamed_j2k, DecompressParams(backend="native")) \
            as dec:
        assert dec.num_tiles == ntx * ntx
        for t in range(dec.num_tiles):
            _check_tile(dec, t, ntx)


def test_tile_cache_lru_bound(streamed_j2k):
    ntx = -(-SIDE // TILE)
    with Decompressor(streamed_j2k, DecompressParams(backend="native"),
                      cache_tiles=2) as dec:
        for t in range(dec.num_tiles):
            _check_tile(dec, t, ntx)
            assert len(dec._cache) <= 2
        # LRU recency: touching the older entry keeps it resident
        keys = list(dec._cache)
        dec.decompress_tile(dec.num_tiles - 2)     # refresh older
        _check_tile(dec, 0, ntx)                   # evicts the other one
        assert any(k[0] == dec.num_tiles - 2 for k in dec._cache), \
            "recently-used tile was evicted"


def test_tile_cache_disabled(streamed_j2k):
    ntx = -(-SIDE // TILE)
    with Decompressor(streamed_j2k, DecompressParams(backend="native"),
                      cache_tiles=0) as dec:
        _check_tile(dec, 4, ntx)
        assert len(dec._cache) == 0


def test_jp2_mmap_zero_copy(streamed_j2k, tmp_path):
    """Round-4 backlog: a mapped JP2's jp2c box must stay a zero-copy
    view over the mapping (not a bytes copy of the whole codestream),
    so gigapixel JP2 inputs page like raw .j2k ones; madvise offsets
    shift by the box offset."""
    from grok_tpu.codestream import jp2 as jp2box

    raw = open(streamed_j2k, "rb").read()
    path = str(tmp_path / "gp.jp2")
    with open(path, "wb") as f:
        f.write(jp2box.wrap_jp2(raw, numcomps=1, prec=8,
                                width=SIDE, height=SIDE))
    ntx = -(-SIDE // TILE)
    with Decompressor(path, DecompressParams(backend="native")) as dec:
        assert isinstance(dec._cs, memoryview)      # no codestream copy
        assert dec._cs_off > 0
        for t in (0, dec.num_tiles - 1):
            _check_tile(dec, t, ntx)                # madvise path runs
        img = dec.decompress()                      # whole-image path
        assert img.components[0].data.shape == (SIDE, SIDE)
    # close() released the view and the mapping without BufferError


def test_tlm_random_access_does_not_scan(streamed_j2k):
    """TLM-seeded seeking: decoding only the last tile must not decode
    (or even T1-parse) the others — the practical gigapixel property."""
    with Decompressor(streamed_j2k, DecompressParams(backend="native")) \
            as dec:
        last = dec.num_tiles - 1
        _check_tile(dec, last, -(-SIDE // TILE))
        assert set(k[0] for k in dec._cache) == {last}
    # file size sanity: the stream is real multi-tile content
    assert os.path.getsize(streamed_j2k) > 10_000
