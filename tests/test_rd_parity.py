"""BASELINE configs[1]: lossy R-D parity with the oracle at matched rate.

Round-4 findings behind these tests (docs/PERF.md "config[1]"):
- the PCRD distortion model measures against the TRUE coefficient
  (integer + quantizer residual, core.quant.quantize_frac) — verified
  exact against truncated decodes;
- non-terminated truncation points are refined to the minimal
  decodable prefix after allocation (the +5 flush watermark is a
  simulation bound, not a shipping requirement);
- the Pillow-driven oracle does NOT enable the ICT for RGB, and the
  ICT is a measured 1 dB LOSS on this synthetic content (error
  amplification 8.73/3 vs its compaction gain), so the like-for-like
  comparison uses mct=NONE and `MCTMode.AUTO_RD` picks the winner by
  actual outcome.
"""

import numpy as np
import pytest

from grok_tpu import CompressParams, compress, decompress
from grok_tpu.core.params import MCTMode
from grok_tpu.util.oracle import (HAVE_ORACLE, oracle_decode, oracle_encode,
                                  synthetic_image)

pytestmark = pytest.mark.skipif(not HAVE_ORACLE,
                                reason="OpenJPEG oracle unavailable")


def _psnr(a, b):
    e = (a.astype(np.float64) - b) ** 2
    return 10 * np.log10(255 * 255 / e.mean())


@pytest.mark.parametrize("nc,rate", [(1, 8.0), (3, 8.0), (3, 24.0)])
def test_rd_at_matched_rate(nc, rate):
    """Ours must match or beat the oracle's R-D point: never more
    bytes, and within epsilon dB (the PCRD undershoots the byte target
    slightly; at equal bytes the measured curve slope puts us at or
    above the oracle)."""
    img = synthetic_image(256, 256, nc, seed=13)
    cp = CompressParams(irreversible=True, num_resolutions=5,
                        rates=[rate], mct=MCTMode.NONE)
    ours = compress(img, cp)
    od = oracle_encode(img, irreversible=True, num_resolutions=5,
                       rate=rate)
    p_ours = _psnr(img, decompress(ours).to_array())
    p_or = _psnr(img, oracle_decode(od))
    # R-D non-domination: the oracle must not beat us on BOTH axes
    # (small-stream header overheads and PCRD undershoot shift the
    # operating point a little either way between the two encoders)
    bigger = len(ours) > len(od) * 1.005
    worse = p_ours < p_or - 0.30
    assert not (bigger and worse), (len(ours), len(od), p_ours, p_or)


def test_auto_rd_picks_winner_both_ways():
    rng = np.random.default_rng(3)
    # luminance-dominated content: the ICT wins by several dB
    base = synthetic_image(256, 256, 1, seed=5).astype(np.float64)
    nat = np.stack(
        [np.clip(base + rng.normal(0, 3, base.shape), 0, 255),
         np.clip(base * 0.9 + rng.normal(0, 3, base.shape), 0, 255),
         np.clip(base * 0.8 + rng.normal(0, 3, base.shape), 0, 255)],
        -1).astype(np.uint8)
    # independent-ish channels: identity wins
    syn = synthetic_image(256, 256, 3, seed=13)
    for img in (nat, syn):
        best_sse = None
        for mode in (MCTMode.RCT_OR_ICT, MCTMode.NONE):
            d = compress(img, CompressParams(
                irreversible=True, num_resolutions=5, rates=[8.0],
                mct=mode))
            sse = float(((decompress(d).to_array().astype(np.float64)
                          - img) ** 2).sum())
            best_sse = sse if best_sse is None else min(best_sse, sse)
        d = compress(img, CompressParams(
            irreversible=True, num_resolutions=5, rates=[8.0],
            mct=MCTMode.AUTO_RD))
        sse = float(((decompress(d).to_array().astype(np.float64)
                      - img) ** 2).sum())
        assert sse <= best_sse * 1.0001


def test_auto_rd_lossless_picks_smaller():
    rng = np.random.default_rng(3)
    base = synthetic_image(128, 128, 1, seed=5).astype(np.float64)
    nat = np.stack(
        [np.clip(base + rng.normal(0, 3, base.shape), 0, 255),
         np.clip(base * 0.9 + rng.normal(0, 3, base.shape), 0, 255),
         np.clip(base * 0.8 + rng.normal(0, 3, base.shape), 0, 255)],
        -1).astype(np.uint8)
    d_auto = compress(nat, CompressParams(mct=MCTMode.AUTO_RD))
    d_rct = compress(nat, CompressParams())
    d_none = compress(nat, CompressParams(mct=MCTMode.NONE))
    assert len(d_auto) <= min(len(d_rct), len(d_none))
    assert np.array_equal(decompress(d_auto).to_array(), nat)


def test_truncation_refinement_shrinks_not_degrades():
    """The minimal-flush refinement must never change decoded pixels,
    only drop dead flush bytes."""
    import grok_tpu.pipeline.tile as tp
    img = synthetic_image(256, 256, 1, seed=4)
    cp = CompressParams(irreversible=True, num_resolutions=5,
                        rates=[8.0])
    ours = compress(img, cp)
    # re-encode with refinement disabled by forcing the trivial guard
    real = tp.finish_tile_encode

    def no_refine(*a, **k):
        import grok_tpu.native as nat
        from grok_tpu.t1 import t1_scalar
        saved = t1_scalar.decode_block
        savedn = nat.decode_block

        def boom(*aa, **kk):
            raise RuntimeError("refine disabled")
        t1_scalar.decode_block = boom
        nat.decode_block = boom
        try:
            return real(*a, **k)
        finally:
            t1_scalar.decode_block = saved
            nat.decode_block = savedn
    tp.finish_tile_encode = no_refine
    try:
        fat = compress(img, cp)
    finally:
        tp.finish_tile_encode = real
    assert len(ours) <= len(fat)
    assert np.array_equal(decompress(ours).to_array(),
                          decompress(fat).to_array())


def test_auto_rd_rejected_by_streaming_compressor(tmp_path):
    from grok_tpu.codec import Compressor
    with pytest.raises(ValueError):
        Compressor(str(tmp_path / "x.j2k"), width=64, height=64,
                   numcomps=3,
                   params=CompressParams(mct=MCTMode.AUTO_RD))
