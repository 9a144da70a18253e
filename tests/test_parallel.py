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
    fn = make_inv53_vertical_sharded(mesh, rows_per_shard, W)
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
