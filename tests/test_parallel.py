"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from grok_tpu.core.geometry import Rect
from grok_tpu.parallel.sharding import (make_codec_roundtrip_step,
                                        make_inv53_vertical_sharded,
                                        reference_inv53_vertical,
                                        shard_tile_batch, tile_mesh)


@pytest.fixture(scope="module")
def mesh():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return tile_mesh(8)


def test_tile_batch_codec_step_lossless(mesh):
    rng = np.random.default_rng(0)
    H = W = 16
    T = 16
    tiles = rng.integers(0, 256, (T, 3, H, W)).astype(np.int32)
    step = make_codec_roundtrip_step(Rect(0, 0, W, H), 3)
    sharded = shard_tile_batch(tiles, mesh)
    out, dist = step(sharded)
    assert np.array_equal(np.asarray(out), tiles)
    assert np.isfinite(float(dist))
    # output keeps the tile sharding
    assert len(out.sharding.device_set) == 8


def test_huge_tile_halo_exchange_bit_exact(mesh):
    rng = np.random.default_rng(1)
    n = 8
    rows_per_shard = 8
    W = 32
    R = n * rows_per_shard
    y = rng.integers(-500, 500, (R, W)).astype(np.int32)
    fn = make_inv53_vertical_sharded(mesh, rows_per_shard)
    sharded = shard_tile_batch(y, mesh)
    out = np.asarray(fn(sharded))
    ref = reference_inv53_vertical(y)
    assert np.array_equal(out, ref)


def test_sharded_t1_block_decode_bit_exact(mesh):
    from grok_tpu.parallel.sharding import decode_blocks_sharded
    from grok_tpu.t1.t1_scalar import encode_block
    rng = np.random.default_rng(3)
    blocks, refs = [], []
    for i in range(12):      # pads to 16 lanes over 8 devices
        mag = np.abs(rng.normal(0, 40, (16, 16))).astype(np.int64)
        mag[rng.random((16, 16)) < 0.4] = 0
        neg = rng.random((16, 16)) < 0.5
        enc = encode_block(mag, neg, i % 4, 0)
        blocks.append(dict(data=enc.data, numpasses=enc.numpasses,
                           numbps=enc.numbps, orient=i % 4, w=16, h=16))
        refs.append((mag, neg))
    res = decode_blocks_sharded(blocks, mesh, 16, 16)
    for (mag, neg), (m2, dn) in zip(refs, res):
        assert np.array_equal(m2 >> 1, mag)
        assert np.array_equal(dn[mag > 0], neg[mag > 0])


def test_full_2d_level_sharded_bit_exact(mesh):
    from grok_tpu.parallel.sharding import (make_inv53_2d_sharded,
                                            shard_tile_batch)
    from grok_tpu.transform import dwt_np
    rng = np.random.default_rng(5)
    R, W = 64, 48
    ll = rng.integers(-500, 500, (R // 2, W // 2)).astype(np.int64)
    hl = rng.integers(-500, 500, (R // 2, W // 2)).astype(np.int64)
    lh = rng.integers(-500, 500, (R // 2, W // 2)).astype(np.int64)
    hh = rng.integers(-500, 500, (R // 2, W // 2)).astype(np.int64)
    ref = dwt_np.inv_2d_level(ll, hl, lh, hh, Rect(0, 0, W, R), False)
    inter = np.empty((R, W), np.int64)
    inter[0::2, 0::2] = ll
    inter[0::2, 1::2] = hl
    inter[1::2, 0::2] = lh
    inter[1::2, 1::2] = hh
    fn = make_inv53_2d_sharded(mesh, R // 8, W)
    out = np.asarray(fn(shard_tile_batch(inter.astype(np.int32), mesh)))
    assert np.array_equal(out, ref)


def test_decode_tile_sharded_end_to_end(mesh):
    """Giant-tile decode composition: sharded T1 + sharded DWT levels
    equals the host multilevel synthesis, bit-exact."""
    from grok_tpu.core.geometry import Rect as R_
    from grok_tpu.parallel.sharding import decode_tile_sharded
    from grok_tpu.t1.t1_scalar import encode_block
    from grok_tpu.transform import dwt_np
    rng = np.random.default_rng(9)
    N = 64
    numres = 3
    nl = numres - 1
    tc = R_(0, 0, N, N)
    # synth bands, encode each band's blocks (16x16 cblks)
    band_meta = {}
    bands_ref = {}
    blocks = []
    for r in range(numres):
        size = N >> (nl if r == 0 else nl - r + 1)
        orients = (0,) if r == 0 else (1, 2, 3)
        for o in orients:
            br = R_(0, 0, size, size)
            band_meta[(r, o)] = br
            vals = rng.integers(-400, 400, (br.h, br.w)).astype(np.int64)
            bands_ref[(r, o)] = vals
            cb = 16
            for by in range(0, br.h, cb):
                for bx in range(0, br.w, cb):
                    sub = vals[by:by + cb, bx:bx + cb]
                    mag = np.abs(sub)
                    neg = sub < 0
                    enc = encode_block(mag, neg, o, 0)
                    blocks.append(dict(
                        data=enc.data, numpasses=len(enc.passes),
                        numbps=enc.numbps, orient=o,
                        w=sub.shape[1], h=sub.shape[0],
                        res=r, bx=bx, by=by))
    out = decode_tile_sharded(blocks, band_meta, mesh, tc, numres)
    # host reference
    bands = [bands_ref[(0, 0)]]
    for r in range(1, numres):
        bands.append((bands_ref[(r, 1)], bands_ref[(r, 2)],
                      bands_ref[(r, 3)]))
    ref = dwt_np.inv_multilevel(bands, tc, numres, False)
    assert np.array_equal(out, ref)


def test_inv_2d_level_sharded_generalized(mesh):
    """Lifted round-1 limits: odd parities, ragged rows, 9/7 (4-tap halo)."""
    from grok_tpu.parallel.sharding import inv_2d_level_sharded
    from grok_tpu.transform import dwt_np
    rng = np.random.default_rng(11)
    for (R, W, x0, y0, irrev) in [(80, 33, 1, 1, False),
                                  (100, 37, 1, 0, False),
                                  (64, 48, 0, 0, True),
                                  (88, 41, 1, 1, True)]:
        rect = Rect(x0, y0, x0 + W, y0 + R)
        img = rng.integers(-300, 300, (R, W)).astype(np.int64)
        src = img.astype(np.float64) if irrev else img
        ll, hl, lh, hh = dwt_np.fwd_2d_level(src, rect, irrev)
        ref = dwt_np.inv_2d_level(ll, hl, lh, hh, rect, irrev)
        got = inv_2d_level_sharded(ll, hl, lh, hh, rect, irrev, mesh)
        if irrev:
            assert np.allclose(got, ref, atol=2e-2, rtol=1e-4)
        else:
            assert np.array_equal(got.astype(np.int64), ref)


def test_public_api_mesh_decode(mesh):
    """DecompressParams(mesh=...) routes the public decode through the
    sharded T1 batch + sharded DWT levels, bit-exact vs the scalar path
    (VERDICT round-1 item #4: multi-chip reachable from the API)."""
    from grok_tpu.api import compress, decompress
    from grok_tpu.core.params import CompressParams, DecompressParams
    from grok_tpu.util.oracle import synthetic_image
    for img, cp in [
            (synthetic_image(160, 140, 1, seed=1),
             CompressParams(num_resolutions=3)),
            (synthetic_image(126, 155, 3, seed=2),
             CompressParams(num_resolutions=3)),
            (synthetic_image(128, 128, 1, seed=3),
             CompressParams(irreversible=True, quant_step=0.002))]:
        cs = compress(img, cp)
        ref = decompress(cs, DecompressParams(backend="scalar")).to_array()
        got = decompress(cs, DecompressParams(backend="jax",
                                              mesh=mesh)).to_array()
        assert np.array_equal(got, ref)


def test_sharded_encode_byte_identical(mesh):
    """CompressParams(mesh=...): forward DWT rows, T1 encode lanes, and
    the PCRD slope bracket all sharded — codestream byte-identical to the
    host encoder (VERDICT round-1 item #5)."""
    from grok_tpu.api import compress, decompress
    from grok_tpu.core.params import CompressParams, DecompressParams
    from grok_tpu.util.oracle import synthetic_image
    img = synthetic_image(160, 140, 1, seed=21)
    for kw in (dict(num_resolutions=3),
               dict(num_resolutions=3, num_layers=2, rates=[8, 0])):
        host = compress(img, CompressParams(backend="jax", **kw))
        shard = compress(img, CompressParams(backend="jax", mesh=mesh,
                                             **kw))
        assert host == shard
    out = decompress(shard, DecompressParams(backend="scalar")).to_array()
    assert out.shape == (160, 140)


def test_pcrd_slope_bounds_collective(mesh):
    """The sharded slope reduction equals the host bracket exactly."""
    from grok_tpu.parallel.sharding import pcrd_slope_bounds_sharded
    from grok_tpu.t2.rate import Hull
    rng = np.random.default_rng(3)
    hulls = []
    for _ in range(23):
        s = np.sort(rng.uniform(0.1, 900, rng.integers(1, 6)))[::-1]
        hulls.append(Hull(pass_idx=np.arange(len(s)), slopes=s))
    smin, smax = pcrd_slope_bounds_sharded(hulls, mesh)
    all_s = np.concatenate([h.slopes for h in hulls])
    assert smin == float(all_s.min()) * 0.5
    assert smax == float(all_s.max()) * 2.0 + 1.0


def test_sharded_dwt_ragged_pads_all_depths(mesh):
    """Regression: mirror pads shallower than the lifting cone used to
    make the kernel's edge extension reflect about the wrong row
    (silent bottom-row corruption for pad depths 1..3)."""
    import numpy as np

    from grok_tpu.core.geometry import Rect
    from grok_tpu.parallel.sharding import (fwd_2d_level_sharded,
                                            inv_2d_level_sharded)
    from grok_tpu.transform import dwt_np
    rng = np.random.default_rng(3)
    for R in (71, 70, 69, 68, 66, 65):       # pads 1..7 over 8 devices
        rect = Rect(0, 0, 16, R)
        x = rng.integers(-500, 500, (R, 16)).astype(np.int64)
        ref = dwt_np.fwd_2d_level(x, rect, False)
        got = fwd_2d_level_sharded(x, rect, False, mesh)
        for a, b in zip(ref, got):
            assert np.array_equal(a, b), R
        ll, hl, lh, hh = ref
        iref = dwt_np.inv_2d_level(ll, hl, lh, hh, rect, False)
        igot = inv_2d_level_sharded(ll, hl, lh, hh, rect, False, mesh)
        assert np.array_equal(iref, igot), R
