"""Pallas HT kernel: bit-exactness vs the scalar HT coder.

Unlike the MQ kernel tests (minutes of interpret-mode tracing, gated
behind GROK_RUN_PALLAS_TESTS), the HT kernel decodes a quad per step so
small blocks trace in seconds — these run in the default suite, keeping
the flagship HT device path exercised by plain `pytest tests/ -q`.
"""

import numpy as np
import pytest

from grok_tpu.ops.pallas_ht import (decode_ht_blocks, ht_block_eligible,
                                    parse_ht_header)
from grok_tpu.t1ht import ht_decode_block, ht_encode_block


def _make(rng, w, h, sigma, orient):
    mag = np.abs(rng.normal(0, sigma, (h, w))).astype(np.int64)
    mag[rng.random((h, w)) < 0.4] = 0
    neg = rng.random((h, w)) < 0.5
    mag[0, 0] = max(int(mag[0, 0]), 3)      # never an empty block
    enc = ht_encode_block(mag, neg, orient)
    job = dict(data=enc.data, seg_lens=enc.seg_lens, numpasses=1,
               numbps=enc.numbps, orient=orient, w=w, h=h)
    ref = ht_decode_block(enc.data, enc.seg_lens, 1, enc.numbps,
                          orient, w, h)
    return job, ref


def test_interpret_bit_exact_mixed_shapes():
    rng = np.random.default_rng(0)
    shapes = [(8, 8), (7, 5), (8, 6), (3, 8), (8, 8), (4, 4)]
    sigmas = [15, 300, 4, 80, 1000, 20]
    jobs, refs = [], []
    for i, ((w, h), s) in enumerate(zip(shapes, sigmas)):
        j, r = _make(rng, w, h, s, i % 4)
        jobs.append(j)
        refs.append(r)
    assert all(ht_block_eligible(j) for j in jobs)
    res = decode_ht_blocks(jobs, interpret=True)
    for i, ((m2, ng), (rm2, rng_)) in enumerate(zip(res, refs)):
        assert np.array_equal(m2, rm2), f"block {i} magnitude"
        assert np.array_equal(ng, rng_), f"block {i} sign"


def test_eligibility_rules():
    rng = np.random.default_rng(1)
    job, _ = _make(rng, 8, 8, 50, 0)
    assert ht_block_eligible(job)
    def variant(**kw):
        d = dict(job, **kw)
        d.pop("_ht_hdr", None)   # eligibility caches the parsed header
        return d

    # multi-pass (SigProp/MagRef) blocks route to the scalar path
    assert not ht_block_eligible(variant(numpasses=3,
                                         seg_lens=job["seg_lens"] + [4, 4]))
    # truncated cleanup segment: invalid framing
    assert not ht_block_eligible(variant(data=job["data"][:4],
                                         seg_lens=[4]))
    # MagSgn reads wider than the staged window route to the scalar path
    assert not ht_block_eligible(variant(numbps=40))


def test_header_parse_roundtrip():
    rng = np.random.default_rng(2)
    job, _ = _make(rng, 8, 8, 50, 1)
    data, L = job["data"], job["seg_lens"][0]
    ms, mel, vlc = parse_ht_header(data, job["seg_lens"])
    # clean (un-stuffed) streams never exceed their wire regions; the
    # MEL/VLC boundary is implicit, so both unstuff the whole suffix
    scup = (data[L - 1] << 4) | (data[L - 2] & 0xF)
    assert len(ms) <= L - scup + 1
    assert len(mel) <= scup - 2 + 1 and len(vlc) <= scup - 1


def test_encoder_refine_interpret_byte_identical():
    """REFINE encode variant (ht_planes > 0): cleanup + HT SigProp +
    HT MagRef on device, byte-identical to the scalar coder incl. the
    per-pass distortion metadata PCRD consumes."""
    from grok_tpu.ops.pallas_ht_enc import encode_ht_blocks
    rng = np.random.default_rng(17)
    blocks, refs = [], []
    for i, (w, h) in enumerate([(8, 8), (7, 5), (16, 12), (3, 9)]):
        mag = np.abs(rng.normal(0, [40, 300, 7, 80][i],
                                (h, w))).astype(np.int64)
        mag[rng.random((h, w)) < 0.4] = 0
        neg = (rng.random((h, w)) < 0.5) & (mag > 0)
        mag[0, 0] = max(int(mag[0, 0]), 5)
        blocks.append(dict(mag=mag, neg=neg, orient=i % 4, w=w, h=h))
        refs.append(ht_encode_block(mag, neg, i % 4, p=2))
    res = encode_ht_blocks(blocks, interpret=True, ht_planes=2)
    for i, (got, ref) in enumerate(zip(res, refs)):
        assert got.data == ref.data, f"block {i} bytes"
        assert got.seg_lens == ref.seg_lens, f"block {i} seg_lens"
        assert len(got.passes) == len(ref.passes)
        for gp, rp in zip(got.passes, ref.passes):
            assert gp.rate == rp.rate
            assert abs(gp.dist - rp.dist) < 1e-6


def test_encoder_interpret_byte_identical():
    from grok_tpu.ops.pallas_ht_enc import encode_ht_blocks
    rng = np.random.default_rng(3)
    blocks, refs = [], []
    for i, (w, h) in enumerate([(8, 8), (7, 5), (8, 6), (4, 4)]):
        mag = np.abs(rng.normal(0, [15, 300, 4, 80][i],
                                (h, w))).astype(np.int64)
        mag[rng.random((h, w)) < 0.4] = 0
        neg = (rng.random((h, w)) < 0.5) & (mag > 0)
        mag[0, 0] = max(int(mag[0, 0]), 3)
        blocks.append(dict(mag=mag, neg=neg, orient=i % 4, w=w, h=h))
        refs.append(ht_encode_block(mag, neg, i % 4))
    res = encode_ht_blocks(blocks, interpret=True)
    for i, (got, ref) in enumerate(zip(res, refs)):
        assert got.data == ref.data, f"block {i} bytes"
        assert got.numbps == ref.numbps
        assert abs(got.passes[0].dist - ref.passes[0].dist) < 1e-6


def test_decoder_interpret_refine_passes():
    """The REFINE kernel variant: HT SigProp + MagRef (ht_planes
    streams, p in 1..3) decode bit-exact vs the scalar coder, mixed
    with cleanup-only lanes in the same batch via bucketing."""
    from grok_tpu.ops.pallas_ht import decode_ht_blocks
    rng = np.random.default_rng(23)
    jobs, refs = [], []
    # heights 1-2 exercise the H >= 4 refine-bucket pad (the stripe
    # loops index full 4-row stripes)
    for i, (w, h, pp) in enumerate([(8, 8, 1), (7, 5, 2), (8, 6, 3),
                                    (12, 9, 2), (8, 8, 0), (8, 2, 1),
                                    (6, 1, 2)]):
        mag = np.abs(rng.normal(0, [60, 300, 1000, 90, 40, 70, 80][i],
                                (h, w))).astype(np.int64)
        mag[rng.random((h, w)) < 0.4] = 0
        mag[0, 0] = max(int(mag[0, 0]), 7)
        neg = (rng.random((h, w)) < 0.5) & (mag > 0)
        enc = ht_encode_block(mag, neg, i % 4, p=pp)
        job = dict(data=enc.data, seg_lens=enc.seg_lens,
                   numpasses=len(enc.seg_lens), numbps=enc.numbps,
                   orient=i % 4, w=w, h=h)
        assert ht_block_eligible(job), (i, pp)
        jobs.append(job)
        refs.append(ht_decode_block(enc.data, enc.seg_lens,
                                    len(enc.seg_lens), enc.numbps,
                                    i % 4, w, h))
    res = decode_ht_blocks(jobs, interpret=True)
    for i, ((m, n), (rm, rn)) in enumerate(zip(res, refs)):
        assert np.array_equal(m, rm), f"block {i} mag"
        assert np.array_equal(n, rn), f"block {i} neg"


def test_decoder_interpret_multi_outer_blocks():
    """NQ=32 quads -> two outer staging blocks on the DECODE side:
    exercises the MagSgn mid refresh from the full stream buffer, the
    per-quad window reload from mid, and the MEL/VLC outer-boundary
    window refresh (round-2 hierarchical staging), with one dense block
    near the 24-bit magnitude ceiling (worst-case window advance)."""
    rng = np.random.default_rng(7)
    jobs, refs = [], []
    for i, (w, h, sig, dens) in enumerate([(16, 8, 3000000, 0.95),
                                           (13, 8, 80, 0.5),
                                           (9, 13, 900, 0.7)]):
        mag = np.abs(rng.normal(0, sig, (h, w))).astype(np.int64)
        mag[rng.random((h, w)) >= dens] = 0
        mag = np.minimum(mag, (1 << 24) - 1)
        neg = (rng.random((h, w)) < 0.5) & (mag > 0)
        mag[0, 0] = max(int(mag[0, 0]), 3)
        enc = ht_encode_block(mag, neg, i % 4)
        job = dict(data=enc.data, seg_lens=enc.seg_lens, numpasses=1,
                   numbps=enc.numbps, orient=i % 4, w=w, h=h)
        assert ht_block_eligible(job)
        jobs.append(job)
        refs.append(ht_decode_block(enc.data, enc.seg_lens, 1,
                                    enc.numbps, i % 4, w, h))
    res = decode_ht_blocks(jobs, interpret=True)
    for i, ((m, n), (rm, rn)) in enumerate(zip(res, refs)):
        assert np.array_equal(m, rm), f"block {i} mag"
        assert np.array_equal(n, rn), f"block {i} neg"


def test_decoder_interpret_intermediate_sublanes():
    """S=2 sublane batching (count-limited: 160 blocks -> ceil/128 = 2,
    clamped to a power of two).  Round-2 widened S from {1, 8} to
    {1, 2, 4, 8}: long-stream buckets batch 256/512 lanes per launch
    instead of collapsing to 128."""
    from grok_tpu.ops.pallas_ht import floor_pow2, sublanes_for_ht
    assert [floor_pow2(n) for n in (1, 2, 3, 4, 5, 7, 8, 9)] == \
        [1, 2, 2, 4, 4, 4, 8, 8]
    # VMEM model steps down by powers of two as streams lengthen (the
    # old {1, 8} model collapsed straight to 128-lane launches)
    assert sublanes_for_ht(32, 32, 64) == 8
    assert sublanes_for_ht(32, 32, 1024) == 4      # bench shape: was 1
    assert sublanes_for_ht(64, 64, 4000) == 2
    rng = np.random.default_rng(11)
    jobs, refs = [], []
    for i in range(160):
        j, r = _make(rng, 4, 4, 40, i % 4)
        jobs.append(j)
        refs.append(r)
    assert all(ht_block_eligible(j) for j in jobs)
    res = decode_ht_blocks(jobs, interpret=True)
    for i, ((m, n), (rm, rn)) in enumerate(zip(res, refs)):
        assert np.array_equal(m, rm), f"block {i} mag"
        assert np.array_equal(n, rn), f"block {i} neg"


def test_encoder_interpret_multi_outer_blocks():
    """NQ=32 quads -> two outer staging blocks: exercises the MagSgn
    mid flush into the full buffer, the mid self-shift, and window
    re-entry (the round-2 hierarchical staging), with one dense block
    near the 24-bit magnitude ceiling (worst-case window advance)."""
    from grok_tpu.ops.pallas_ht_enc import encode_ht_blocks
    rng = np.random.default_rng(5)
    blocks, refs = [], []
    for i, (w, h, sig, dens) in enumerate([(16, 8, 3000000, 0.95),
                                           (13, 8, 80, 0.5),
                                           (9, 13, 900, 0.7)]):
        mag = np.abs(rng.normal(0, sig, (h, w))).astype(np.int64)
        mag[rng.random((h, w)) >= dens] = 0
        mag = np.minimum(mag, (1 << 24) - 1)
        neg = (rng.random((h, w)) < 0.5) & (mag > 0)
        mag[0, 0] = max(int(mag[0, 0]), 3)
        blocks.append(dict(mag=mag, neg=neg, orient=i % 4, w=w, h=h))
        refs.append(ht_encode_block(mag, neg, i % 4))
    res = encode_ht_blocks(blocks, interpret=True)
    for i, (got, ref) in enumerate(zip(res, refs)):
        assert got.data == ref.data, f"block {i} bytes"
        assert got.numbps == ref.numbps


def test_mq_pallas_kernels_trace():
    """The MQ Pallas kernels' full interpret runs take minutes (still
    gated behind GROK_RUN_PALLAS_TESTS); this traces both through
    jax.eval_shape in the default suite so tracing/shape rot is caught
    on every run."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from grok_tpu.ops.pallas_t1 import pallas_t1_decode
    from grok_tpu.ops.pallas_t1_enc import pallas_t1_encode

    G, S = 3, 1
    out = jax.eval_shape(
        partial(pallas_t1_decode, W=8, H=8, maxbp=4, S=S),
        jax.ShapeDtypeStruct((G, 32, 128), jnp.int32),
        jax.ShapeDtypeStruct((1, 128), jnp.int32),
        jax.ShapeDtypeStruct((1, 128), jnp.int32),
        jax.ShapeDtypeStruct((1, 128), jnp.int32),
        jax.ShapeDtypeStruct((2, 128), jnp.int32),
        jax.ShapeDtypeStruct((3, 16, 128), jnp.int32),   # ptbl
        jax.ShapeDtypeStruct((1, 128), jnp.int32))       # stylev
    assert out.shape == (8, 8, 128)

    outs = jax.eval_shape(
        partial(pallas_t1_encode, W=8, H=8, maxbp=4, L=256),
        jax.ShapeDtypeStruct((8, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((1, 128), jnp.int32),
        jax.ShapeDtypeStruct((1, 128), jnp.int32))
    assert outs[0].shape[-1] == 128
