"""Object-lifecycle API (Decompressor) + jax-backend pipeline coverage."""

import numpy as np

from grok_tpu import CompressParams, DecompressParams, compress, decompress
from grok_tpu.codec import Decompressor
from grok_tpu.util.oracle import psnr, synthetic_image


def test_decompressor_lifecycle_and_tile_cache():
    img = synthetic_image(96, 96, 1, seed=70)
    data = compress(img, CompressParams(num_resolutions=3, tile_w=32,
                                        tile_h=32))
    dec = Decompressor(data)
    assert dec.num_tiles == 9
    assert (dec.header.width, dec.header.height) == (96, 96)
    t4 = dec.decompress_tile(4)[0]
    assert np.array_equal(t4, img[32:64, 32:64])
    assert dec.cache_info()["tiles_cached"] == 1
    t4b = dec.decompress_tile(4)[0]       # cached path
    assert t4b is t4
    full = dec.decompress().to_array()
    assert np.array_equal(full, img)


def test_jax_backend_full_pipeline():
    img = synthetic_image(64, 64, 1, seed=5)
    data = compress(img, CompressParams(num_resolutions=3))
    out = decompress(data, DecompressParams(backend="jax")).to_array()
    assert np.array_equal(out, img)


def test_jax_backend_lossy_matches_scalar():
    img = synthetic_image(64, 64, 1, seed=6)
    data = compress(img, CompressParams(num_resolutions=3,
                                        irreversible=True, rates=[8.0]))
    a = decompress(data).to_array()
    b = decompress(data, DecompressParams(backend="jax")).to_array()
    assert np.array_equal(a, b)
