"""Feature-interaction conformance: options that must compose cleanly.

The reference's test corpus leans hard on combinations; each case here
pins a pair/triple of features that share state in the pipeline.
"""

import numpy as np
import pytest

from grok_tpu import (CompressParams, DecompressParams, compress,
                      decompress)
from grok_tpu.core.image import Component, Image
from grok_tpu.util.oracle import oracle_decode, psnr, synthetic_image


def test_tiles_layers_window_reduce_plt():
    img = synthetic_image(256, 256, 3, seed=1)
    d = compress(img, CompressParams(
        num_resolutions=4, tile_w=128, tile_h=128, num_layers=3,
        rates=[16, 4, 0], write_plt=True, write_tlm=True))
    assert np.array_equal(decompress(d).to_array(), img)
    out = decompress(d, DecompressParams(window=(100, 100, 200, 200),
                                         reduce=1, max_layers=2))
    full = decompress(d, DecompressParams(reduce=1, max_layers=2))
    fa = full.to_array()
    assert np.array_equal(out.to_array(), fa[50:100, 50:100])


def test_sop_eph_bypass_multi_tile_oracle():
    img = synthetic_image(160, 160, 1, seed=2)
    d = compress(img, CompressParams(num_resolutions=3, tile_w=80,
                                     tile_h=80, sop=True, eph=True,
                                     cblk_style=0x01))
    assert np.array_equal(decompress(d).to_array(), img)
    assert np.array_equal(oracle_decode(d), img)


def test_subsampled_window_decode():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (64, 64)).astype(np.int32)
    cb = rng.integers(0, 256, (32, 32)).astype(np.int32)
    img = Image(components=[Component(data=y, dx=1, dy=1, prec=8),
                            Component(data=cb, dx=2, dy=2, prec=8),
                            Component(data=cb.copy(), dx=2, dy=2, prec=8)])
    d = compress(img, CompressParams(num_resolutions=3))
    out = decompress(d, DecompressParams(window=(16, 16, 48, 48)))
    assert np.array_equal(out.components[0].data, y[16:48, 16:48])
    assert np.array_equal(out.components[1].data, cb[8:24, 8:24])


def test_16bit_signed_irreversible_oracle():
    rng = np.random.default_rng(4)
    px = rng.integers(-2048, 2048, (96, 96)).astype(np.int32)
    img = Image(components=[Component(data=px, prec=12, sgnd=True)])
    d = compress(img, CompressParams(num_resolutions=4))
    out = decompress(d)
    assert out.components[0].sgnd
    assert np.array_equal(out.components[0].data, px)
    # lossy 12-bit
    d2 = compress(img, CompressParams(num_resolutions=4,
                                      irreversible=True))
    out2 = decompress(d2).components[0].data
    assert psnr(out2.astype(np.int64) + 2048,
                px.astype(np.int64) + 2048, peak=4095) > 40


def test_poc_with_reduce_and_layers():
    from grok_tpu.core.params import Poc, ProgOrder
    img = synthetic_image(128, 128, 1, seed=5)
    pocs = [Poc(rs=0, re=2, cs=0, ce=1, layer_end=2, order=ProgOrder.RLCP),
            Poc(rs=2, re=5, cs=0, ce=1, layer_end=2, order=ProgOrder.LRCP)]
    d = compress(img, CompressParams(num_resolutions=5, num_layers=2,
                                     rates=[8, 0], pocs=pocs))
    assert np.array_equal(decompress(d).to_array(), img)
    r = decompress(d, DecompressParams(reduce=2)).to_array()
    assert r.shape == (32, 32)
    l1 = decompress(d, DecompressParams(max_layers=1)).to_array()
    assert l1.shape == img.shape


def test_roi_with_layers_and_oracle_self():
    # Maxshift: shift must exceed the background bitplane count (hence
    # the name); 12 >= Mb for 8-bit content
    img = synthetic_image(128, 128, 1, seed=6)
    d = compress(img, CompressParams(num_resolutions=4, num_layers=2,
                                     rates=[20, 0], roi_comp=0,
                                     roi_shift=12,
                                     roi_rect=(32, 32, 96, 96)))
    out = decompress(d).to_array()
    assert np.array_equal(out, img)          # lossless last layer
    part = decompress(d, DecompressParams(max_layers=1)).to_array()
    roi_err = np.abs(part[36:92, 36:92].astype(float)
                     - img[36:92, 36:92]).mean()
    bg_err = np.abs(part[:28, :28].astype(float) - img[:28, :28]).mean()
    assert roi_err <= bg_err + 1e-9          # ROI at least as good as bg


def test_roi_small_shift_warns():
    from grok_tpu.util.msg import set_msg_handlers
    img = synthetic_image(64, 64, 1, seed=6)
    msgs = []
    set_msg_handlers(warning=msgs.append)
    try:
        compress(img, CompressParams(num_resolutions=3, roi_comp=0,
                                     roi_shift=3,
                                     roi_rect=(16, 16, 48, 48)))
    finally:
        set_msg_handlers()
    assert any("ambiguous" in m for m in msgs)


def test_precincts_rpcl_eph_oracle_both_ways():
    img = synthetic_image(128, 128, 1, seed=7)
    from grok_tpu.core.params import ProgOrder
    d = compress(img, CompressParams(
        num_resolutions=4, prog_order=ProgOrder.RPCL,
        prec_w_exps=[6] * 4, prec_h_exps=[6] * 4, eph=True))
    assert np.array_equal(decompress(d).to_array(), img)
    assert np.array_equal(oracle_decode(d), img)


def test_deferred_inclusion_small_blocks_multilayer():
    """Regression: multi-block precincts where early blocks defer to a
    later layer — the inclusion tag tree must be fully populated before
    the first packet's bits are emitted (shared interior nodes)."""
    for cblk, layers, rates in ((4, 2, [8, 0]), (4, 3, [16, 4, 0]),
                                (5, 2, [8, 0])):
        img = synthetic_image(64, 64, 1, seed=12)
        d = compress(img, CompressParams(
            num_resolutions=3, cblk_w_exp=cblk, cblk_h_exp=cblk,
            num_layers=layers, rates=rates))
        assert np.array_equal(decompress(d).to_array(), img), (cblk, rates)
        assert np.array_equal(oracle_decode(d), img), (cblk, rates)
