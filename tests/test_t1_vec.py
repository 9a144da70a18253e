"""Batched device T1 decoder vs the scalar oracle — bit-exact."""

import numpy as np
import pytest

from grok_tpu.ops.t1_dec import decode_blocks
from grok_tpu.t1.t1_scalar import decode_block, encode_block


def _random_block(rng, h, w, density=0.5, scale=40):
    mag = np.abs(rng.normal(0, scale, (h, w))).astype(np.int64)
    mag[rng.random((h, w)) >= density] = 0
    neg = rng.random((h, w)) < 0.5
    return mag, neg


def _check(blocks, refs, res):
    for i, ((mag, neg), (m2, dn)) in enumerate(zip(refs, res)):
        dm = m2 >> 1
        assert np.array_equal(dm, mag), f"block {i} magnitude mismatch"
        assert np.array_equal(dn[mag > 0], neg[mag > 0]), f"block {i} signs"


def test_batch_mixed_orients_16x16():
    rng = np.random.default_rng(0)
    blocks, refs = [], []
    for i in range(8):
        mag, neg = _random_block(rng, 16, 16)
        enc = encode_block(mag, neg, i % 4, 0)
        blocks.append(dict(data=enc.data, numpasses=enc.numpasses,
                           numbps=enc.numbps, orient=i % 4, w=16, h=16))
        refs.append((mag, neg))
    _check(blocks, refs, decode_blocks(blocks))


def test_odd_sizes_and_mixed_buckets():
    rng = np.random.default_rng(1)
    blocks, refs = [], []
    for (h, w) in [(5, 7), (13, 3), (1, 9), (16, 16), (11, 16), (4, 4),
                   (3, 1), (7, 32)]:
        mag, neg = _random_block(rng, h, w, density=0.7)
        enc = encode_block(mag, neg, 2, 0)
        blocks.append(dict(data=enc.data, numpasses=enc.numpasses,
                           numbps=enc.numbps, orient=2, w=w, h=h))
        refs.append((mag, neg))
    _check(blocks, refs, decode_blocks(blocks))


def test_sparse_blocks_exercise_runlength():
    rng = np.random.default_rng(2)
    blocks, refs = [], []
    for i in range(6):
        mag, neg = _random_block(rng, 16, 16, density=0.05, scale=100)
        enc = encode_block(mag, neg, 0, 0)
        blocks.append(dict(data=enc.data, numpasses=enc.numpasses,
                           numbps=enc.numbps, orient=0, w=16, h=16))
        refs.append((mag, neg))
    _check(blocks, refs, decode_blocks(blocks))


def test_empty_and_zero_blocks():
    rng = np.random.default_rng(3)
    mag, neg = _random_block(rng, 8, 8)
    enc = encode_block(mag, neg, 1, 0)
    blocks = [
        dict(data=b"", numpasses=0, numbps=0, orient=0, w=8, h=8),
        dict(data=enc.data, numpasses=enc.numpasses, numbps=enc.numbps,
             orient=1, w=8, h=8),
    ]
    res = decode_blocks(blocks)
    assert (res[0][0] == 0).all()
    _check(blocks[1:], [(mag, neg)], res[1:])


def test_truncated_passes_match_scalar():
    rng = np.random.default_rng(4)
    mag, neg = _random_block(rng, 16, 16)
    enc = encode_block(mag, neg, 0, 0)
    for npass in (1, 3, enc.numpasses // 2, enc.numpasses - 1):
        if npass < 1:
            continue
        rate = enc.passes[npass - 1].rate
        data = enc.data[:rate]
        ref_m2, ref_neg = decode_block(data, [len(data)], npass, enc.numbps,
                                       0, 16, 16, 0, False)
        res = decode_blocks([dict(data=data, numpasses=npass,
                                  numbps=enc.numbps, orient=0, w=16, h=16)])
        m2, dn = res[0]
        assert np.array_equal(m2, ref_m2), f"npass={npass}"
        sig = ref_m2 > 0
        assert np.array_equal(dn[sig], ref_neg[sig])


def test_mixed_numbps_in_one_batch():
    rng = np.random.default_rng(5)
    blocks, refs = [], []
    for scale in (2, 10, 300, 2000):
        mag, neg = _random_block(rng, 8, 8, scale=scale)
        enc = encode_block(mag, neg, 3, 0)
        blocks.append(dict(data=enc.data, numpasses=enc.numpasses,
                           numbps=enc.numbps, orient=3, w=8, h=8))
        refs.append((mag, neg))
    _check(blocks, refs, decode_blocks(blocks))
