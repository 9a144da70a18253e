"""Serving fast path (pipeline/serve.py): cached plan + C staging +
device-side sub-stream gathers, vs the scalar oracle.  Runs the Pallas HT
kernel in interpret mode on the CPU backend (GROK_PALLAS_INTERPRET)."""

from dataclasses import replace

import numpy as np
import pytest

from grok_tpu import (CompressParams, DecompressParams, compress, decompress,
                      native)
from grok_tpu.util.oracle import synthetic_image

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C toolchain")


@pytest.fixture(autouse=True)
def _ht_interpret_env(monkeypatch):
    monkeypatch.setenv("GROK_HT_PALLAS", "1")
    monkeypatch.setenv("GROK_PALLAS_INTERPRET", "1")


def _serve_decode(data):
    from grok_tpu.api import decompress_device
    return decompress_device(data)


def test_serving_encode_ht_planes_byte_identical():
    """ht_planes > 0 stays on the fused serving ENCODE path (REFINE
    kernel variant + device per-pass distortion stats), byte-identical
    to the scalar host coder, plain and rate-targeted multi-layer."""
    from grok_tpu.pipeline import serve_enc
    taken = []
    orig = serve_enc.try_encode_serving_batch

    def probe(images, hdr, t, params, pocs):
        r = orig(images, hdr, t, params, pocs)
        taken.append(r is not None)
        return r

    serve_enc.try_encode_serving_batch, saved = probe, orig
    try:
        img = synthetic_image(128, 96, 1, seed=3)
        kw = dict(ht=True, num_resolutions=3, ht_planes=2,
                  cblk_w_exp=5, cblk_h_exp=5)
        dev = compress(img, CompressParams(backend="jax", **kw))
        host = compress(img, CompressParams(backend="scalar", **kw))
        assert taken == [True] and dev == host
        taken.clear()
        rt = compress(img, CompressParams(backend="jax",
                                          rates=[8.0, 2.0],
                                          num_layers=2, **kw))
        rth = compress(img, CompressParams(backend="scalar",
                                           rates=[8.0, 2.0],
                                           num_layers=2, **kw))
        assert taken == [True] and rt == rth
        out = decompress(dev).components[0].data
        err = np.abs(out.astype(np.int64) - img.astype(np.int64))
        # plane-1 truncation: coefficient error <= 3, spread a little
        # by the inverse DWT (measured max 5 on this image)
        assert int(err.max()) <= 8 and float(err.mean()) < 2.0
    finally:
        serve_enc.try_encode_serving_batch = saved


def test_serving_lossless_bit_exact_and_plan_cached():
    from grok_tpu.pipeline import serve
    serve._PLANS.clear()
    img = synthetic_image(96, 80, 1, seed=3)
    data = compress(img, CompressParams(ht=True, num_resolutions=3,
                                        cblk_w_exp=5, cblk_h_exp=5))
    out = np.asarray(_serve_decode(data)[0])
    assert np.array_equal(out, img)
    assert sum(v is not None for v in serve._PLANS.values()) == 1
    # second stream, same geometry: plan reused, still exact
    img2 = synthetic_image(96, 80, 1, seed=4)
    data2 = compress(img2, CompressParams(ht=True, num_resolutions=3,
                                          cblk_w_exp=5, cblk_h_exp=5))
    out2 = np.asarray(_serve_decode(data2)[0])
    assert np.array_equal(out2, img2)
    assert len([v for v in serve._PLANS.values() if v is not None]) == 1


def test_serving_rgb_ict_matches_general_jax_path():
    img = synthetic_image(64, 96, 3, seed=5)
    data = compress(img, CompressParams(ht=True, irreversible=True,
                                        num_resolutions=3, cblk_w_exp=5,
                                        cblk_h_exp=5, rates=[6.0]))
    got = np.stack([np.asarray(a) for a in _serve_decode(data)], axis=-1)
    ref = decompress(data, DecompressParams(backend="jax")).to_array()
    # irreversible path: the serving program and the general program are
    # differently-fused f32 pipelines (translation-normalized vs absolute
    # band rects), so isolated +-1 rounding-boundary pixels are within
    # the scoped invariant (CLAUDE.md); reversible serving tests stay
    # bit-exact
    diff = np.abs(got.astype(np.int64) - ref.astype(np.int64))
    assert int(diff.max()) <= 1 and int((diff > 0).sum()) <= 4


def test_serving_mq_part1_route():
    """Part-1 (MQ) streams take the serving path too (mq3 buckets:
    raw-body gathers feeding the XLA batch decoder), bit-exact."""
    from grok_tpu.pipeline import serve
    img = synthetic_image(64, 64, 1, seed=6)
    part1 = compress(img, CompressParams(num_resolutions=3))
    from grok_tpu.api import decompress_device
    out = np.asarray(decompress_device(part1)[0])
    assert np.array_equal(out, img)
    assert any(v is not None and v.coder == "mq"
               for v in serve._PLANS.values())


def test_serving_encode_mq_part1_byte_identical(monkeypatch):
    """Round 4: Part-1 default-style encodes stay on the fused serving
    ENCODE path (Pallas MQ encode kernel + device compaction),
    byte-identical to the host encoder.  Tiny config (8x8 blocks, 2-bit
    samples, 1 guard bit -> the same (8,8,MB4=4) kernel variant as the
    tiny kernel test) keeps the interpret-mode run in CI budget; the
    full-size configs are exercised on hardware
    (tools/hw_validate.py serve_mq_enc)."""
    from grok_tpu.core.image import Component, Image
    from grok_tpu.pipeline import serve_enc

    monkeypatch.setenv("GROK_T1_PALLAS", "1")
    taken = []
    orig = serve_enc.try_encode_serving_batch

    def probe(images, hdr, t, params, pocs):
        r = orig(images, hdr, t, params, pocs)
        taken.append(r is not None)
        return r

    monkeypatch.setattr(serve_enc, "try_encode_serving_batch", probe)
    a = (synthetic_image(16, 16, 1, seed=6).astype(np.int32) >> 6)
    kw = dict(num_resolutions=2, cblk_w_exp=3, cblk_h_exp=3,
              num_guard_bits=1)
    dev = compress(Image(components=[Component(data=a, prec=2)]),
                   CompressParams(backend="jax", **kw))
    assert taken == [True], "serving encode declined a Part-1 config"
    host = compress(Image(components=[Component(data=a, prec=2)]),
                    CompressParams(backend="scalar", **kw))
    assert dev == host, "device Part-1 stream differs from host"
    assert np.array_equal(decompress(dev).components[0].data, a)
    # with the Pallas kernel disabled the route declines cleanly (host
    # fallback, identical streams)
    monkeypatch.setenv("GROK_T1_PALLAS", "0")
    taken.clear()
    rt = compress(Image(components=[Component(data=a, prec=2)]),
                  CompressParams(backend="jax", rates=[4.0], **kw))
    assert taken == [False]
    rth = compress(Image(components=[Component(data=a, prec=2)]),
                   CompressParams(backend="scalar", rates=[4.0], **kw))
    assert rt == rth


def test_serving_encode_mq_rate_targeted_byte_identical(monkeypatch):
    """Round 4 (late): rate-targeted and multi-layer Part-1 encodes STAY
    on the fused serving path — the device program adds exact per-pass
    distortion stats (serve_enc._mq_dstat over the kernel's sigtype
    map) and the host runs the same PCRD + minimal-flush truncation
    refinement as the general encoder.  Reversible streams are
    byte-identical to the host coder (CLAUDE.md invariant scope)."""
    from grok_tpu.core.image import Component, Image
    from grok_tpu.pipeline import serve_enc

    monkeypatch.setenv("GROK_T1_PALLAS", "1")
    taken = []
    orig = serve_enc.try_encode_serving_batch

    def probe(images, hdr, t, params, pocs):
        r = orig(images, hdr, t, params, pocs)
        taken.append(r is not None)
        return r

    monkeypatch.setattr(serve_enc, "try_encode_serving_batch", probe)
    a = (synthetic_image(16, 16, 1, seed=6).astype(np.int32) >> 6)
    kw = dict(num_resolutions=2, cblk_w_exp=3, cblk_h_exp=3,
              num_guard_bits=1)
    for extra in (dict(rates=[4.0]),
                  dict(num_layers=2, rates=[8.0, 2.0])):
        taken.clear()
        dev = compress(Image(components=[Component(data=a, prec=2)]),
                       CompressParams(backend="jax", **kw, **extra))
        assert taken == [True], f"serving encode declined {extra}"
        host = compress(Image(components=[Component(data=a, prec=2)]),
                        CompressParams(backend="scalar", **kw, **extra))
        assert dev == host, f"targeted device stream differs: {extra}"
        out = decompress(dev).components[0].data
        assert out.shape == a.shape


def test_serving_encode_mixed_declines_outside_scope(monkeypatch):
    """Device HT MIXED scope guards: rate-targeted configs and non-pow2
    block groupings decline to the host mixed encoder (identical
    output), without touching either kernel."""
    import os

    from grok_tpu.core.image import Component, Image
    from grok_tpu.pipeline import serve_enc

    monkeypatch.setenv("GROK_T1_PALLAS", "1")
    taken = []
    orig = serve_enc.try_encode_serving_batch

    def probe(images, hdr, t, params, pocs):
        r = orig(images, hdr, t, params, pocs)
        taken.append(r is not None)
        return r

    monkeypatch.setattr(serve_enc, "try_encode_serving_batch", probe)
    a = (synthetic_image(16, 16, 1, seed=6).astype(np.int32) >> 6)
    kw = dict(num_resolutions=2, cblk_w_exp=3, cblk_h_exp=3,
              num_guard_bits=1)
    # rate-targeted mixed: declined (the MQ side has no distortions)
    dev = compress(Image(components=[Component(data=a, prec=2)]),
                   CompressParams(backend="jax", ht_mixed=True,
                                  rates=[4.0], **kw))
    host = compress(Image(components=[Component(data=a, prec=2)]),
                    CompressParams(backend="scalar", ht_mixed=True,
                                   rates=[4.0], **kw))
    assert taken == [False] and dev == host
    # non-pow2 blocks (20x20 image -> ragged shapes): plan has no MQ
    # grouping -> mixed declines even untargeted
    taken.clear()
    b = (synthetic_image(20, 20, 1, seed=6).astype(np.int32) >> 6)
    dev = compress(Image(components=[Component(data=b, prec=2)]),
                   CompressParams(backend="jax", ht_mixed=True, **kw))
    host = compress(Image(components=[Component(data=b, prec=2)]),
                    CompressParams(backend="scalar", ht_mixed=True, **kw))
    assert taken == [False] and dev == host


@pytest.mark.skipif(not __import__("os").environ.get(
    "GROK_RUN_PALLAS_TESTS"),
    reason="mixed serving encode runs BOTH interpret kernels (~6 min "
           "cold); set GROK_RUN_PALLAS_TESTS=1 (hardware: "
           "tools/hw_validate.py serve_mixed_enc)")
def test_serving_encode_mixed_byte_identical(monkeypatch):
    """Device HT MIXED: both serving coders on device, per-block min,
    byte-identical to the host mixed encoder (same bitmap, same COM)."""
    from grok_tpu.core.image import Component, Image
    from grok_tpu.pipeline import serve_enc

    monkeypatch.setenv("GROK_T1_PALLAS", "1")
    taken = []
    orig = serve_enc.try_encode_serving_batch

    def probe(images, hdr, t, params, pocs):
        r = orig(images, hdr, t, params, pocs)
        taken.append(r is not None)
        return r

    monkeypatch.setattr(serve_enc, "try_encode_serving_batch", probe)
    a = (synthetic_image(16, 16, 1, seed=6).astype(np.int32) >> 6)
    kw = dict(num_resolutions=2, cblk_w_exp=3, cblk_h_exp=3,
              num_guard_bits=1)
    dev = compress(Image(components=[Component(data=a, prec=2)]),
                   CompressParams(backend="jax", ht_mixed=True, **kw))
    assert taken == [True], "serving declined a mixed config"
    host = compress(Image(components=[Component(data=a, prec=2)]),
                    CompressParams(backend="scalar", ht_mixed=True, **kw))
    assert dev == host
    assert np.array_equal(decompress(dev).components[0].data, a)


def test_serving_declines_to_general_path(monkeypatch):
    """Styled (mode-switch) streams must fall back, not fail."""
    from grok_tpu.pipeline import serve
    calls = {}
    orig = serve.try_decode_serving

    def counting(*a, **k):
        r = orig(*a, **k)
        calls["last"] = r
        return r

    monkeypatch.setattr(serve, "try_decode_serving", counting)
    img = synthetic_image(64, 64, 1, seed=6)
    styled = compress(img, CompressParams(num_resolutions=3,
                                          cblk_style=0x3F))
    from grok_tpu.api import decompress_device
    out = np.asarray(decompress_device(styled)[0])
    assert np.array_equal(out, img)
    assert calls["last"] is None      # declined (styled), then fell back


def test_serving_encode_byte_identical_to_host():
    """Fused device encode (serve_enc): byte-identical streams on the
    reversible path, gray + RGB/RCT, odd sizes."""
    import dataclasses
    for shape, seed in (((96, 80, 1), 3), ((67, 83, 3), 9)):
        img = synthetic_image(*shape, seed=seed)
        ph = CompressParams(ht=True, num_resolutions=3,
                            cblk_w_exp=5, cblk_h_exp=5)
        pd = dataclasses.replace(ph, backend="jax")
        a = compress(img, ph)
        b = compress(img, pd)
        assert a == b
        from grok_tpu.pipeline import serve_enc
        assert any(v is not None for v in serve_enc._EPLANS.values())
        out = decompress(b, DecompressParams(backend="scalar")).to_array()
        assert np.array_equal(out, img)


def test_serving_encode_irreversible_self_consistent():
    import dataclasses

    from grok_tpu.util.oracle import psnr
    img = synthetic_image(64, 64, 3, seed=10)
    pd = CompressParams(ht=True, irreversible=True, num_resolutions=3,
                        cblk_w_exp=5, cblk_h_exp=5, backend="jax")
    out = decompress(compress(img, pd)).to_array()
    assert psnr(img, out) > 38


def test_serving_encode_rate_targeted_byte_identical():
    """Rate-targeted and multi-layer encodes STAY on the device path:
    the kernel's exact distortion stats feed the same PCRD finish the
    host runs, so streams are byte-identical to the host encoder."""
    import dataclasses

    from grok_tpu.pipeline import serve_enc, tile as tile_pipe
    img = synthetic_image(128, 96, 1, seed=17)
    for rates, layers in (([4.0], 1), ([8.0, 2.0], 2), ([6.0, 1.0], 2)):
        ph = CompressParams(ht=True, num_resolutions=3, cblk_w_exp=5,
                            cblk_h_exp=5, num_layers=layers, rates=rates)
        a = compress(img, ph)
        calls = []
        orig = tile_pipe.encode_tile

        def spy(*args, **kw):
            calls.append(1)
            return orig(*args, **kw)
        tile_pipe.encode_tile = spy
        try:
            b = compress(img, dataclasses.replace(ph, backend="jax"))
        finally:
            tile_pipe.encode_tile = orig
        assert not calls, "device encode fell back to encode_tile"
        assert a == b, (rates, layers)
        out = decompress(b, DecompressParams(strict=False)).to_array()
        assert out.shape == img.shape
        # rate target respected (roughly: header overhead included)
        raw = img.size
        assert len(b) <= raw / rates[-1] * 1.4 + 600, (len(b), rates)


def test_serving_encode_declines_non_ht():
    img = synthetic_image(64, 64, 1, seed=11)
    p = CompressParams(num_resolutions=3, backend="jax")  # Part-1 MQ
    data = compress(img, p)
    out = decompress(data).to_array()
    assert np.array_equal(out, img)


def test_serving_batch_decode():
    """decompress_device_batch: N same-geometry streams in one program,
    each bit-exact; mixed geometry falls back per stream."""
    from grok_tpu.api import decompress_device_batch
    p = CompressParams(ht=True, num_resolutions=3, cblk_w_exp=5,
                       cblk_h_exp=5)
    imgs = [synthetic_image(80, 96, 1, seed=s) for s in range(3)]
    streams = [compress(im, p) for im in imgs]
    outs = decompress_device_batch(streams)
    for im, o in zip(imgs, outs):
        assert np.array_equal(np.asarray(o[0]), im)
    other = compress(synthetic_image(64, 64, 1, seed=9),
                     CompressParams(ht=True, num_resolutions=2,
                                    cblk_w_exp=5, cblk_h_exp=5))
    mixed = decompress_device_batch(streams[:1] + [other])
    assert np.array_equal(np.asarray(mixed[0][0]), imgs[0])


def test_serving_batch_encode():
    """compress_device_batch: N same-geometry frames share one fused
    program; every codestream is byte-identical to the host encoder
    (and mixed shapes fall back per frame)."""
    from grok_tpu.api import compress_device_batch
    p = CompressParams(ht=True, num_resolutions=3, cblk_w_exp=5,
                       cblk_h_exp=5)
    imgs = [synthetic_image(96, 80, 1, seed=s) for s in (11, 12, 13)]
    streams = compress_device_batch(imgs, p)
    for im, s in zip(imgs, streams):
        assert s == compress(im, p)
        assert np.array_equal(decompress(s).to_array(), im)
    # RGB + MCT batch through the same surface
    rgbs = [synthetic_image(48, 64, 3, seed=s) for s in (14, 15)]
    pr = CompressParams(ht=True, num_resolutions=2, mct=True,
                        cblk_w_exp=5, cblk_h_exp=5)
    for f, s in zip(rgbs, compress_device_batch(rgbs, pr)):
        assert s == compress(f, pr)


def test_serving_reduced_resolution():
    """reduce= decodes stay on the serving path (thumbnail serving) and
    match the general path exactly, both coders."""
    img = synthetic_image(128, 96, 1, seed=3)
    from grok_tpu.api import decompress_device
    for kw in (dict(ht=True, cblk_w_exp=5, cblk_h_exp=5), dict()):
        data = compress(img, CompressParams(num_resolutions=4, **kw))
        for red in (1, 2):
            dp = DecompressParams(reduce=red)
            ref = decompress(data, dp).to_array()
            got = np.asarray(decompress_device(data, dp)[0])
            assert got.shape == ref.shape
            assert np.array_equal(got, ref)


def test_serving_window_and_layer_cap(monkeypatch):
    """Region decode and layer-capped decode ride the serving path (the
    plan cache + block mask), matching the general path inside the
    window; the general decode_tile is patched to a bomb to prove no
    fallback happens."""
    from grok_tpu.api import decompress_device
    from grok_tpu.pipeline import tile as tile_pipe
    img = synthetic_image(128, 96, 1, seed=21)
    data = compress(img, CompressParams(ht=True, num_resolutions=3,
                                        cblk_w_exp=5, cblk_h_exp=5))
    win = (40, 24, 104, 80)
    ref = decompress(data, DecompressParams(window=win,
                                            strict=False)).to_array()

    def bomb(*a, **k):
        raise AssertionError("serving path fell back to decode_tile")
    monkeypatch.setattr(tile_pipe, "decode_tile", bomb)
    # window: full-resolution arrays, valid inside the window
    got = np.asarray(decompress_device(
        data, DecompressParams(window=win))[0])
    assert got.shape == img.shape
    assert np.array_equal(got[win[1]:win[3], win[0]:win[2]], ref)
    # layer cap on a single-layer stream: full image
    got1 = np.asarray(decompress_device(
        data, DecompressParams(max_layers=1))[0])
    assert np.array_equal(got1, img)


def test_serving_layer_cap_multilayer():
    """max_layers=1 on a 2-layer HT stream decodes the first layer only,
    matching the general path (HT cleanup passes land in one layer per
    block, so the serving single-segment shape still holds)."""
    from grok_tpu.api import decompress_device
    img = synthetic_image(96, 96, 1, seed=22)
    data = compress(img, CompressParams(ht=True, num_resolutions=3,
                                        cblk_w_exp=5, cblk_h_exp=5,
                                        num_layers=2, rates=[8, 1]))
    for cap in (1, 2):
        dp = DecompressParams(max_layers=cap, strict=False)
        ref = decompress(data, dp).to_array()
        got = np.asarray(decompress_device(
            data, DecompressParams(max_layers=cap))[0])
        assert np.array_equal(got, ref), cap


def test_serving_corrupt_streams_never_crash():
    """Corrupted bodies must decode to something or fall back — never
    raise through decompress_device (permissive serving)."""
    from grok_tpu.api import decompress_device
    img = synthetic_image(64, 64, 1, seed=13)
    rng = np.random.default_rng(0)
    data = bytearray(compress(img, CompressParams(
        ht=True, num_resolutions=2, cblk_w_exp=5, cblk_h_exp=5)))
    hdr_end = 120                      # keep the main header intact
    for _ in range(3):
        buf = bytearray(data)
        for _ in range(8):
            pos = int(rng.integers(hdr_end, len(buf)))
            buf[pos] = int(rng.integers(0, 256))
        try:
            out = decompress_device(bytes(buf),
                                    DecompressParams(strict=False))
            np.asarray(out[0])
        except (ValueError, EOFError):
            pass                        # clean parse error is acceptable


def test_serving_multi_tile():
    """Tiled streams: per-tile plans, assembled full canvas."""
    from grok_tpu.api import decompress_device
    img = synthetic_image(100, 120, 1, seed=14)
    data = compress(img, CompressParams(ht=True, num_resolutions=3,
                                        cblk_w_exp=5, cblk_h_exp=5,
                                        tile_w=64, tile_h=64))
    out = np.asarray(decompress_device(data)[0])
    assert np.array_equal(out, img)


def test_device_resident_loop_byte_identical():
    """decompress_device -> compress_device without the pixels ever
    leaving the device: the re-encoded stream is byte-identical."""
    import jax

    from grok_tpu.api import compress_device, decompress_device
    img = synthetic_image(96, 80, 1, seed=3)
    p = CompressParams(ht=True, num_resolutions=3, cblk_w_exp=5,
                       cblk_h_exp=5)
    stream = compress(img, p)
    dev = decompress_device(stream)
    assert all(isinstance(a, jax.Array) for a in dev)
    restream = compress_device(dev, p)
    assert restream == stream


def test_streaming_compressor_device_encode():
    """Compressor.write_tile(backend='jax') rides the fused device
    encoder per tile, byte-identical to the host streaming encode."""
    import dataclasses
    import os
    import tempfile

    from grok_tpu import Compressor
    from grok_tpu.codestream.j2k import SizGrid
    img = synthetic_image(100, 120, 1, seed=14)

    def run(p):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "out.j2k")
            c = Compressor(path, width=120, height=100, numcomps=1,
                           params=p)
            siz = SizGrid(xsiz=120, ysiz=100, xtsiz=p.tile_w,
                          ytsiz=p.tile_h)
            for t in range(c.num_tiles):
                r = siz.tile_rect(t)
                c.write_tile(t, img[r.y0:r.y1, r.x0:r.x1])
            c.finish()
            return open(path, "rb").read()

    p = CompressParams(ht=True, num_resolutions=3, cblk_w_exp=5,
                       cblk_h_exp=5, tile_w=64, tile_h=64, backend="jax")
    data = run(p)
    assert data == run(dataclasses.replace(p, backend="scalar"))
    assert np.array_equal(decompress(data).to_array(), img)


def test_large_code_blocks_fall_back_correctly():
    """Legal streams with >64-px code blocks exceed the device bucket
    cap and must decode exactly via the fallback (regression: they used
    to decode silently wrong through the device paths)."""
    from grok_tpu.api import decompress_device
    img = synthetic_image(160, 160, 1, seed=15)
    data = compress(img, CompressParams(num_resolutions=2, cblk_w_exp=7,
                                        cblk_h_exp=5))
    out = np.asarray(decompress_device(data)[0])
    assert np.array_equal(out, img)
    jx = decompress(data, DecompressParams(backend="jax")).to_array()
    assert np.array_equal(jx, img)


def test_serving_mq_multilayer_and_poc(monkeypatch):
    """Round 5 scope widening (VERDICT r04 missing #5): multi-LAYER
    Part-1 streams (per-block chunk concatenation into a compact body)
    and main-header POC streams take the serving path, bit-exact vs
    the general decoder; probe-asserted so a silent decline fails."""
    from grok_tpu.api import decompress_device
    from grok_tpu.core.params import Poc, ProgOrder
    from grok_tpu.pipeline import serve

    taken = []
    orig = serve.try_decode_serving_batch

    def probe(*a, **kw):
        r = orig(*a, **kw)
        taken.append(r is not None)
        return r

    monkeypatch.setattr(serve, "try_decode_serving_batch", probe)
    img = synthetic_image(64, 64, 1, seed=8)

    # 2-layer Part-1: every block contributes chunks in both layers
    ml = compress(img, CompressParams(num_resolutions=3, num_layers=2,
                                      rates=[6.0, 0.0]))
    taken.clear()
    got = np.asarray(decompress_device(ml)[0])
    assert taken and all(taken), "multi-layer MQ declined serving"
    assert np.array_equal(got, decompress(ml).to_array())
    # the layer cap composes with the chunk concatenation
    for cap in (1, 2):
        dpc = DecompressParams(max_layers=cap)
        ref = decompress(ml, replace(dpc, strict=False)).to_array()
        got = np.asarray(decompress_device(ml, dpc)[0])
        assert np.array_equal(got, ref), cap

    # POC-ordered stream (RLCP segment then the COD order)
    pc = compress(img, CompressParams(
        num_resolutions=3, num_layers=2, rates=[8.0, 0.0],
        pocs=[Poc(rs=0, cs=0, layer_end=2, re=2, ce=1,
                  order=ProgOrder.RLCP),
              Poc(rs=0, cs=0, layer_end=2, re=3, ce=1,
                  order=ProgOrder.LRCP)]))
    taken.clear()
    got = np.asarray(decompress_device(pc)[0])
    assert taken and all(taken), "POC stream declined serving"
    assert np.array_equal(got, decompress(pc).to_array())


def test_serving_per_tile_cod_override(monkeypatch):
    """Round 5: per-tile COD overrides are SERVED (they join the plan
    cache key).  A crafted stream whose main-header COD disagrees with
    the tile-part COD must decode bit-exactly on the serving path, and
    a same-main-header stream WITHOUT the override must get its own
    plan (no cache cross-talk)."""
    import struct

    from grok_tpu.api import decompress_device
    from grok_tpu.codestream import j2k
    from grok_tpu.pipeline import serve

    img = synthetic_image(48, 48, 1, seed=31)
    pa = CompressParams(ht=True, num_resolutions=3, cblk_w_exp=5,
                        cblk_h_exp=5)
    pb = CompressParams(ht=True, num_resolutions=3, cblk_w_exp=4,
                        cblk_h_exp=4)
    sa = compress(img, pa)
    sb = compress(img, pb)
    hdr_a = j2k.read_main_header(sa)
    hdr_b = j2k.read_main_header(sb)
    parts_b = j2k.read_tile_parts(sb, hdr_b)
    body = sb[parts_b[0].data_start:parts_b[0].data_end]

    # main header of A + tile-part COD override carrying B's true style
    cod_seg = j2k.write_cod(hdr_b.cod)
    psot = 12 + len(cod_seg) + 2 + len(body)
    crafted = bytes(sa[:hdr_a.main_header_end]) \
        + j2k.write_sot(0, psot, 0, 1) + cod_seg \
        + struct.pack(">H", j2k.SOD) + body \
        + struct.pack(">H", j2k.EOC)

    # general path sanity
    assert np.array_equal(
        decompress(crafted, DecompressParams(strict=False)).to_array(),
        img)

    taken = []
    orig = serve.try_decode_serving_batch

    def probe(*a, **kw):
        r = orig(*a, **kw)
        taken.append(r is not None)
        return r

    monkeypatch.setattr(serve, "try_decode_serving_batch", probe)
    serve._PLANS.clear()
    out = decompress_device(crafted)
    assert taken == [True], "override stream declined serving"
    assert np.array_equal(np.asarray(out[0]), img)
    # the un-overridden stream under the SAME main header gets its own
    # plan (override key) and still decodes bit-exactly
    taken.clear()
    out2 = decompress_device(sa)
    assert taken == [True]
    assert np.array_equal(np.asarray(out2[0]), img)
    serve._PLANS.clear()
