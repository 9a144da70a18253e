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
