"""Native (C) T1 coder + fused native tile path vs the Python oracle."""

import numpy as np
import pytest

from grok_tpu import (CompressParams, DecompressParams, compress, decompress,
                      native)
from grok_tpu.core.geometry import Rect
from grok_tpu.t1.t1_scalar import decode_block, encode_block
from grok_tpu.transform import dwt_np
from grok_tpu.util.oracle import psnr, synthetic_image

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C toolchain")


def test_block_decode_exact_all_styles():
    ok = tot = 0
    for seed in range(12):
        r = np.random.default_rng(seed)
        h, w = int(r.integers(1, 40)), int(r.integers(1, 40))
        mag = np.abs(r.normal(0, [2, 40, 400][seed % 3],
                              (h, w))).astype(np.int64)
        mag[r.random((h, w)) < 0.4] = 0
        neg = r.random((h, w)) < 0.5
        for style in (0, 1, 2, 4, 8, 0x20, 1 | 4, 1 | 8):
            enc = encode_block(mag, neg, seed % 4, style)
            if enc.numpasses == 0:
                continue
            tot += 1
            m2r, nr = decode_block(enc.data, enc.seg_lens, enc.numpasses,
                                   enc.numbps, seed % 4, w, h, style, True)
            m2n, nn = native.decode_block(enc.data, enc.seg_lens,
                                          enc.numpasses, enc.numbps,
                                          seed % 4, w, h, style)
            assert np.array_equal(m2r, m2n)
            assert np.array_equal(nr[m2r > 0], nn[m2r > 0])
            ok += 1
    assert ok == tot and tot > 50


def test_inv53_level_exact():
    for seed in range(10):
        r = np.random.default_rng(seed)
        h, w = int(r.integers(2, 70)), int(r.integers(2, 70))
        x0, y0 = int(r.integers(0, 4)), int(r.integers(0, 4))
        x = r.integers(-1000, 1000, (h, w)).astype(np.int64)
        rect = Rect(x0, y0, x0 + w, y0 + h)
        ll, hl, lh, hh = dwt_np.fwd_2d_level(x, rect, False)
        ref = dwt_np.inv_2d_level(ll, hl, lh, hh, rect, False)
        got = native.inv53_level(ll, hl, lh, hh, w, h, x0, y0)
        assert np.array_equal(got, ref)


def test_fused_native_pipeline_lossless():
    img = synthetic_image(96, 80, 3, seed=9)
    data = compress(img, CompressParams(num_resolutions=4))
    out = decompress(data, DecompressParams(backend="native")).to_array()
    assert np.array_equal(out, img)


def test_fused_native_pipeline_lossy_matches_scalar():
    img = synthetic_image(96, 96, 1, seed=10)
    data = compress(img, CompressParams(num_resolutions=3,
                                        irreversible=True, rates=[8.0]))
    a = decompress(data).to_array()
    b = decompress(data, DecompressParams(backend="native")).to_array()
    assert np.array_equal(a, b)


def test_fused_native_roi_and_reduce():
    img = synthetic_image(96, 96, 1, seed=11)
    p = CompressParams(num_resolutions=3, roi_comp=0, roi_shift=12,
                       roi_rect=(20, 20, 70, 70))
    data = compress(img, p)
    out = decompress(data, DecompressParams(backend="native")).to_array()
    assert np.array_equal(out, img)
    half = decompress(data, DecompressParams(backend="native",
                                             reduce=1)).to_array()
    assert half.shape == (48, 48)


def test_encode_block_exact_all_styles():
    ok = tot = 0
    for seed in range(10):
        r = np.random.default_rng(seed)
        h, w = int(r.integers(1, 40)), int(r.integers(1, 40))
        mag = np.abs(r.normal(0, [2, 40, 400][seed % 3],
                              (h, w))).astype(np.int64)
        mag[r.random((h, w)) < 0.4] = 0
        neg = r.random((h, w)) < 0.5
        for style in (0, 1, 2, 4, 8, 0x10, 0x20, 1 | 4, 1 | 8,
                      0x10 | 1 | 4, 1 | 4 | 8 | 0x20, 0x3F):
            ref = encode_block(mag, neg, seed % 4, style)
            got = native.encode_block(mag, neg, seed % 4, style)
            assert ref.data == got.data
            assert ref.numbps == got.numbps
            assert ref.seg_lens == got.seg_lens
            assert all(a.rate == b.rate and abs(a.dist - b.dist) < 1e-6
                       and a.term == b.term
                       for a, b in zip(ref.passes, got.passes))
            tot += 1
    assert tot > 60


def test_native_encode_stream_identical():
    img = synthetic_image(96, 96, 1, seed=3)
    a = compress(img, CompressParams(num_resolutions=3))
    b = compress(img, CompressParams(num_resolutions=3, backend="native"))
    assert a == b


def test_threaded_batch_deterministic(monkeypatch):
    """The pthread pool must not change any byte: 1-thread vs 4-thread
    batched encode/decode produce identical streams and pixels."""
    from grok_tpu.api import decompress
    from grok_tpu.core.params import DecompressParams
    img = synthetic_image(160, 160, 3, seed=6)
    p = CompressParams(num_resolutions=4, num_layers=2, rates=[4.0, 1.0],
                       backend="native")
    monkeypatch.setenv("GROK_NUM_THREADS", "1")
    s1 = compress(img, p)
    o1 = decompress(s1, DecompressParams(backend="native")).to_array()
    monkeypatch.setenv("GROK_NUM_THREADS", "4")
    s4 = compress(img, p)
    o4 = decompress(s4, DecompressParams(backend="native")).to_array()
    assert s1 == s4
    assert np.array_equal(o1, o4)


def test_batched_encode_matches_scalar_blocks():
    from grok_tpu import native as nat
    rng = np.random.default_rng(12)
    jobs, refs = [], []
    for i in range(9):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        mag = np.abs(rng.normal(0, 60, (h, w))).astype(np.int64)
        mag[rng.random((h, w)) < 0.3] = 0
        neg = rng.random((h, w)) < 0.5
        style = (0, 1, 0x0D, 0x2F)[i % 4]
        jobs.append(dict(mag=mag, neg=neg, orient=i % 4, style=style))
        refs.append(encode_block(mag, neg, i % 4, style))
    got = nat.encode_tile_blocks(jobs)
    for ref, g in zip(refs, got):
        assert ref.data == g.data
        assert ref.numbps == g.numbps
        assert ref.seg_lens == g.seg_lens
        assert ref.seg_passes == g.seg_passes
        assert all(a.rate == b.rate and abs(a.dist - b.dist) < 1e-6
                   and a.term == b.term
                   for a, b in zip(ref.passes, g.passes))
