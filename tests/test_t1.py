"""EBCOT Tier-1: encode/decode roundtrip across sizes, orients, mode switches."""

import numpy as np
import pytest

from grok_tpu.core.params import (CBLK_BYPASS, CBLK_PTERM, CBLK_RESET, CBLK_SEGSYM,
                                  CBLK_TERMALL, CBLK_VSC)
from grok_tpu.t1.t1_scalar import (decode_block, encode_block, pass_schedule,
                                   segment_pass_counts)


def _roundtrip(mag, neg, orient=0, style=0):
    enc = encode_block(mag, neg, orient, style)
    mag2, neg2 = decode_block(enc.data, enc.seg_lens, enc.numpasses,
                              enc.numbps, orient, mag.shape[1], mag.shape[0],
                              style)
    dec_mag = mag2 >> 1
    np.testing.assert_array_equal(dec_mag, mag)
    np.testing.assert_array_equal(neg2[mag > 0], neg[mag > 0])
    return enc


def test_pass_schedule():
    assert pass_schedule(1) == [(2, 0)]
    assert pass_schedule(3) == [(2, 2), (0, 1), (1, 1), (2, 1),
                                (0, 0), (1, 0), (2, 0)]
    assert len(pass_schedule(10)) == 28


def test_segment_pass_counts():
    assert segment_pass_counts(7, 0) == [7]
    assert segment_pass_counts(7, CBLK_TERMALL) == [1] * 7
    assert segment_pass_counts(16, CBLK_BYPASS) == [10, 2, 1, 2, 1]
    assert segment_pass_counts(11, CBLK_BYPASS) == [10, 1]
    assert segment_pass_counts(5, CBLK_BYPASS) == [5]


@pytest.mark.parametrize("shape", [(4, 4), (16, 16), (13, 9), (3, 64), (64, 3)])
@pytest.mark.parametrize("orient", [0, 1, 2, 3])
def test_roundtrip_shapes_orients(shape, orient, rng):
    mag = rng.integers(0, 512, size=shape).astype(np.int64)
    mag[rng.random(shape) < 0.5] = 0   # sparse, exercises RL mode
    neg = rng.random(shape) < 0.5
    _roundtrip(mag, neg, orient)


def test_roundtrip_zero_block():
    mag = np.zeros((8, 8), dtype=np.int64)
    enc = encode_block(mag, np.zeros((8, 8), bool), 0)
    assert enc.numpasses == 0 and enc.data == b""


def test_roundtrip_single_coefficient():
    mag = np.zeros((7, 5), dtype=np.int64)
    mag[3, 2] = 1
    neg = np.zeros((7, 5), bool)
    neg[3, 2] = True
    enc = _roundtrip(mag, neg)
    assert enc.numbps == 1 and enc.numpasses == 1


def test_roundtrip_dense_large(rng):
    mag = rng.integers(0, 4096, size=(64, 64)).astype(np.int64)
    neg = rng.random((64, 64)) < 0.5
    enc = _roundtrip(mag, neg)
    assert enc.numbps == 12
    # rates are monotone and end at the total length
    rates = [p.rate for p in enc.passes]
    assert rates == sorted(rates)
    assert rates[-1] == len(enc.data)
    # distortion reduction is monotone non-decreasing
    dists = [p.dist for p in enc.passes]
    assert all(b >= a - 1e-9 for a, b in zip(dists, dists[1:]))


@pytest.mark.parametrize("style", [
    CBLK_VSC, CBLK_SEGSYM, CBLK_RESET, CBLK_TERMALL, CBLK_BYPASS,
    CBLK_BYPASS | CBLK_TERMALL, CBLK_VSC | CBLK_SEGSYM | CBLK_RESET,
    CBLK_BYPASS | CBLK_RESET | CBLK_VSC,
    CBLK_PTERM, CBLK_PTERM | CBLK_TERMALL, CBLK_PTERM | CBLK_BYPASS,
    CBLK_PTERM | CBLK_BYPASS | CBLK_TERMALL,
    CBLK_PTERM | CBLK_BYPASS | CBLK_RESET | CBLK_TERMALL | CBLK_VSC
    | CBLK_SEGSYM,
])
def test_roundtrip_mode_switches(style, rng):
    mag = rng.integers(0, 2048, size=(32, 24)).astype(np.int64)
    mag[rng.random((32, 24)) < 0.4] = 0
    neg = rng.random((32, 24)) < 0.5
    enc = _roundtrip(mag, neg, orient=2, style=style)
    assert sum(enc.seg_passes) == enc.numpasses
    assert sum(enc.seg_lens) == len(enc.data)


def test_truncated_decode_error_bounded(rng):
    """Decoding a pass/byte prefix must bound error by the uncertainty at
    that bitplane — the layer-truncation contract."""
    mag = rng.integers(0, 1024, size=(16, 16)).astype(np.int64)
    neg = rng.random((16, 16)) < 0.5
    enc = encode_block(mag, neg, 0)
    sched = pass_schedule(enc.numbps)
    for np_used in (1, 4, 7, enc.numpasses - 2):
        rate = enc.passes[np_used - 1].rate
        mag2, neg2 = decode_block(enc.data[:rate], [rate], np_used,
                                  enc.numbps, 0, 16, 16)
        bp = sched[np_used - 1][1]
        err = np.abs(mag2 / 2.0 - mag)
        assert err.max() <= (1 << bp), (np_used, err.max(), 1 << bp)


def test_truncated_decode_no_crash_tiny_prefix(rng):
    mag = rng.integers(0, 255, size=(12, 12)).astype(np.int64)
    neg = rng.random((12, 12)) < 0.5
    enc = encode_block(mag, neg, 0)
    for nbytes in (0, 1, 2, 5):
        decode_block(enc.data[:nbytes], [nbytes], enc.numpasses, enc.numbps,
                     0, 12, 12)


def test_all_negative_all_positive(rng):
    mag = rng.integers(1, 64, size=(8, 8)).astype(np.int64)
    _roundtrip(mag, np.ones((8, 8), bool))
    _roundtrip(mag, np.zeros((8, 8), bool))
