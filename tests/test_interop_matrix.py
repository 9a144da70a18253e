"""Broad OpenJPEG interop matrix: code-block sizes, levels, precincts,
progressions — lossless bit-exactness in both directions."""

import numpy as np
import pytest

from grok_tpu import CompressParams, DecompressParams, compress, decompress
from grok_tpu.util.oracle import (HAVE_ORACLE, oracle_decode, oracle_encode,
                                  synthetic_image)

pytestmark = pytest.mark.skipif(not HAVE_ORACLE, reason="no oracle")


@pytest.mark.parametrize("cblk,levels", [((16, 16), 2), ((32, 32), 4),
                                         ((64, 64), 6), ((16, 64), 3),
                                         ((64, 16), 5)])
def test_oracle_decodes_ours_cblk_levels(cblk, levels):
    img = synthetic_image(70, 90, 1, seed=cblk[0] + levels)
    p = CompressParams(num_resolutions=levels,
                       cblk_w_exp=cblk[0].bit_length() - 1,
                       cblk_h_exp=cblk[1].bit_length() - 1)
    data = compress(img, p)
    assert np.array_equal(oracle_decode(data), img)
    assert np.array_equal(decompress(data).to_array(), img)


@pytest.mark.parametrize("cblk,prec", [((16, 16), (64, 64)),
                                       ((32, 32), (128, 128)),
                                       ((16, 16), (32, 32))])
def test_we_decode_openjpeg_cblk_precincts(cblk, prec):
    img = synthetic_image(90, 70, 1, seed=cblk[0] + prec[0])
    data = oracle_encode(img, num_resolutions=4, codeblock_size=cblk,
                         precinct_size=prec)
    assert np.array_equal(
        decompress(data, DecompressParams(backend="native")).to_array(),
        img)


def test_metrics_blob():
    from grok_tpu.util import trace
    trace.enable()
    try:
        img = synthetic_image(48, 48, 1, seed=3)
        decompress(compress(img, CompressParams(num_resolutions=3)))
        blob = trace.collect()
        assert "t1_encode" in blob["stages"]
        assert "t2_parse" in blob["stages"]
        assert blob["counters"].get("blocks", 0) > 0
    finally:
        trace.enable(False)


def test_we_decode_openjpeg_layered_small_cblks():
    """Oracle-encoded quality-layer streams with many small blocks per
    precinct exercise deferred first-inclusion on OUR decoder side."""
    img = synthetic_image(128, 128, 1, seed=7)
    data = oracle_encode(img, num_resolutions=3, codeblock_size=(16, 16),
                         layer_rates=[40, 1])
    assert np.array_equal(decompress(data).to_array(), img)
    # layer-limited decode degrades, doesn't crash
    part = decompress(data, DecompressParams(max_layers=1)).to_array()
    assert part.shape == img.shape


def test_oracle_decodes_our_layered_small_cblks():
    img = synthetic_image(128, 128, 1, seed=8)
    d = compress(img, CompressParams(num_resolutions=3, cblk_w_exp=4,
                                     cblk_h_exp=4, num_layers=2,
                                     rates=[8, 0]))
    assert np.array_equal(oracle_decode(d), img)


def test_we_decode_openjpeg_multitile_layers():
    img = synthetic_image(160, 160, 3, seed=9)
    data = oracle_encode(img, num_resolutions=3, tile_size=(80, 80),
                         layer_rates=[20, 1])
    assert np.array_equal(decompress(data).to_array(), img)
