"""HT MIXED sets (round 4): per-code-block HT/MQ coder selection.

The encoder codes every block with both coders and keeps the smaller;
the choice rides a binary COM bitmap in the tile-part header
(j2k.TileHeader.ht_mixed_bitmap, canonical block order from
tile.canon_block_indices).  On natural content the MQ coder wins every
block (docs/PERF.md entropy decomposition: HT's MagSgn U_q padding is
structural), so mixed streams are <= pure-MQ size; the HT routing is
exercised here by forcing the comparison.

Reference parity: mixed HT sets [grok: HTJ2K mixed code-block styles]
(SURVEY §2 row 8).
"""

import numpy as np
import pytest

from grok_tpu import CompressParams, DecompressParams, compress, decompress
from grok_tpu.codestream import j2k
from grok_tpu.util.oracle import synthetic_image

CP = dict(num_resolutions=4, cblk_w_exp=5, cblk_h_exp=5)


@pytest.fixture(scope="module")
def img():
    return synthetic_image(128, 128, 1, seed=7)


@pytest.fixture(scope="module")
def mixed_stream(img):
    return compress(img, CompressParams(ht_mixed=True, backend="scalar",
                                        **CP))


def test_roundtrip_all_backends(img, mixed_stream):
    for be in ("scalar", "native", "jax"):
        out = decompress(mixed_stream,
                         DecompressParams(backend=be)).to_array()
        assert np.array_equal(out, img), be


def test_backend_identity(img, mixed_stream):
    nat = compress(img, CompressParams(ht_mixed=True, backend="native",
                                       **CP))
    assert nat == mixed_stream


def test_size_le_pure_coders(img, mixed_stream):
    mq = compress(img, CompressParams(**CP))
    ht = compress(img, CompressParams(ht=True, **CP))
    overhead = 80          # COM bitmap + CAP delta
    assert len(mixed_stream) <= len(mq) + overhead
    assert len(mixed_stream) <= len(ht) + overhead


def test_bitmap_present_and_mq_wins_naturally(mixed_stream):
    hdr = j2k.read_main_header(mixed_stream)
    parts = j2k.read_tile_parts(mixed_stream, hdr)
    th = j2k.TileHeader()
    j2k.read_tile_part_header(mixed_stream, parts[0], hdr, th)
    bm = th.ht_mixed_bitmap()
    assert bm is not None and len(bm) >= 1
    # natural content: MQ wins every block (PERF.md decomposition)
    assert all(b == 0 for b in bm)
    # Ccap15 bit 5 signals MIXED
    assert hdr.cap is not None and hdr.cap[1][0] & 0x20


def test_forced_ht_blocks_roundtrip(img, monkeypatch):
    """Force the HT coder to win alternating blocks: the wire then
    really mixes coders and the bitmap routes T1 per block."""
    import grok_tpu.pipeline.tile as tile_pipe
    real = tile_pipe.encode_block
    calls = {"n": 0}

    def fat_every_other(mag, neg, orient, style):
        e = real(mag, neg, orient, style)
        calls["n"] += 1
        if calls["n"] % 2 and e.data:
            e.data = e.data + b"\x00" * 4096     # loses the comparison
            e.seg_lens = [len(e.data)]
        return e

    monkeypatch.setattr(tile_pipe, "encode_block", fat_every_other)
    mixed = compress(img, CompressParams(ht_mixed=True, backend="scalar",
                                         **CP))
    monkeypatch.undo()

    hdr = j2k.read_main_header(mixed)
    parts = j2k.read_tile_parts(mixed, hdr)
    th = j2k.TileHeader()
    j2k.read_tile_part_header(mixed, parts[0], hdr, th)
    bm = th.ht_mixed_bitmap()
    assert any(b for b in bm), "no HT blocks were forced"
    for be in ("scalar", "native", "jax"):
        out = decompress(mixed, DecompressParams(backend=be)).to_array()
        assert np.array_equal(out, img), be


def test_window_and_reduce(img, mixed_stream):
    """Canonical bitmap indexing is independent of reduce/window."""
    red = decompress(mixed_stream, DecompressParams(reduce=1))
    assert red.components[0].data.shape == (64, 64)
    win = decompress(mixed_stream,
                     DecompressParams(window=(32, 16, 96, 80)))
    got = win.components[0].data
    assert np.array_equal(got, img[16:80, 32:96])


def test_multitile(img):
    cp = CompressParams(ht_mixed=True, tile_w=64, tile_h=64,
                        write_tlm=True, **CP)
    data = compress(img, cp)
    out = decompress(data).to_array()
    assert np.array_equal(out, img)
    # every tile-part carries its own bitmap
    hdr = j2k.read_main_header(data)
    parts = j2k.read_tile_parts(data, hdr)
    assert len(parts) == 4
    for p in parts:
        th = j2k.TileHeader()
        j2k.read_tile_part_header(data, p, hdr, th)
        assert th.ht_mixed_bitmap() is not None


def test_serving_plan_builds_mixed(mixed_stream):
    """Round 4 (late): mixed streams get a serving plan too — coder
    "mixed", T2 prep under the default single-segment rule, and the
    canonical bitmap index per block (the bitmap itself stays out of
    the plan: it varies per stream)."""
    from grok_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    from grok_tpu.pipeline.serve import _build_plan
    hdr = j2k.read_main_header(mixed_stream)
    parts = j2k.read_tile_parts(mixed_stream, hdr)
    th = j2k.TileHeader()
    j2k.read_tile_part_header(mixed_stream, parts[0], hdr, th)
    plan = _build_plan(hdr, 0, th, 0)
    assert plan is not None and plan.coder == "mixed"
    assert plan.canon_idx is not None \
        and plan.canon_idx.size == plan.n_blks


def test_serving_device_decode_mixed(img, monkeypatch):
    """Device serving decode of MIXED streams: each stream's COM bitmap
    routes its blocks between the HT (ht3) and MQ (mq3) kernel buckets
    of ONE fused program; raw body + digest upload together.  Forced
    truly-mixed bitmaps (the natural winner is MQ everywhere), batch of
    two streams with DIFFERENT bitmaps, tiny blocks in interpret mode."""
    from grok_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    import grok_tpu.pipeline.tile as tile_pipe
    from grok_tpu.api import decompress_device_batch
    from grok_tpu.pipeline import serve

    monkeypatch.setenv("GROK_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("GROK_HT_PALLAS", "1")
    a = (img[:24, :24].astype(np.int32) >> 5)
    b = (img[40:64, 40:64].astype(np.int32) >> 5)
    kw = dict(num_resolutions=2, cblk_w_exp=3, cblk_h_exp=3,
              num_guard_bits=2, ht_mixed=True, backend="scalar")
    from grok_tpu.core.image import Component, Image

    real = tile_pipe.encode_block
    calls = {"n": 0, "mod": 2}

    def fat_every_other(mag, neg, orient, style):
        e = real(mag, neg, orient, style)
        calls["n"] += 1
        if calls["n"] % calls["mod"] and e.data:
            e.data = e.data + b"\x00" * 4096
            e.seg_lens = [len(e.data)]
        return e

    monkeypatch.setattr(tile_pipe, "encode_block", fat_every_other)
    sa = compress(Image(components=[Component(data=a, prec=3)]),
                  CompressParams(**kw))
    calls["mod"] = 3     # a different bitmap for the second stream
    sb = compress(Image(components=[Component(data=b, prec=3)]),
                  CompressParams(**kw))
    monkeypatch.setattr(tile_pipe, "encode_block", real)
    # (not monkeypatch.undo(): that would also drop the env gates)

    for s in (sa, sb):
        hdr = j2k.read_main_header(s)
        parts = j2k.read_tile_parts(s, hdr)
        th = j2k.TileHeader()
        j2k.read_tile_part_header(s, parts[0], hdr, th)
        bm = th.ht_mixed_bitmap()
        assert any(v for v in bm), "no HT blocks were forced"
        assert any((v ^ 0xFF) & 0xFF for v in bm[:-1]) or len(bm) == 1

    taken = []
    orig = serve.try_decode_serving_batch

    def probe(cs, hdr, t, th, bodies, dp, ths=None):
        r = orig(cs, hdr, t, th, bodies, dp, ths=ths)
        taken.append(r is not None)
        return r

    monkeypatch.setattr(serve, "try_decode_serving_batch", probe)
    outs = decompress_device_batch([sa, sb])
    assert taken and taken[0], "mixed batch declined the serving path"
    assert np.array_equal(np.asarray(outs[0][0]), a)
    assert np.array_equal(np.asarray(outs[1][0]), b)


def test_mixed_rejects_ht_planes():
    with pytest.raises(ValueError):
        CompressParams(ht_mixed=True, ht_planes=1).validate()


def test_corrupt_bitmap_no_crash(img, mixed_stream):
    """Flipping coder bits routes blocks to the WRONG coder: decode
    must degrade, never crash (permissive mode) — the serving promise
    for corrupt streams extends to the mixed extension."""
    pos = mixed_stream.find(b"GRKTPU_HTMIX=") + len(b"GRKTPU_HTMIX=")
    bad = bytearray(mixed_stream)
    for i in range(pos, min(pos + 4, len(bad))):
        bad[i] ^= 0xA5
    out = decompress(bytes(bad), DecompressParams(strict=False))
    assert out.components[0].data.shape == img.shape


def test_truncated_bitmap_treated_as_mq(img, mixed_stream):
    """Blocks past a short bitmap decode as MQ (the natural winner) —
    a shorter COM must not crash and, on this all-MQ stream, still
    decodes losslessly."""
    pos = mixed_stream.find(b"\xff\x64")        # COM marker
    ln = int.from_bytes(mixed_stream[pos + 2:pos + 4], "big")
    # rebuild the COM with a 1-byte bitmap; fix Lcom and Psot
    prefix = b"\x00\x00" + b"GRKTPU_HTMIX="     # binary reg + tag
    new_payload = prefix + mixed_stream[pos + 4 + len(prefix):
                                        pos + 4 + len(prefix) + 1]
    new_com = b"\xff\x64" + (len(new_payload) + 2).to_bytes(2, "big") \
        + new_payload
    delta = (ln + 2) - len(new_com)
    sot = mixed_stream.rfind(b"\xff\x90", 0, pos)
    psot = int.from_bytes(mixed_stream[sot + 6:sot + 10], "big")
    out = bytearray(mixed_stream[:pos] + new_com
                    + mixed_stream[pos + 2 + ln:])
    out[sot + 6:sot + 10] = (psot - delta).to_bytes(4, "big")
    dec = decompress(bytes(out), DecompressParams(strict=False))
    assert np.array_equal(dec.to_array(), img)


def test_plan_cache_keyed_on_bitmap_presence(mixed_stream):
    """Round-5 ADVICE fix: the serving-plan cache key must include
    COM-bitmap PRESENCE.  A crafted stream sharing the mixed main
    header but carrying no GRKTPU_HTMIX COM caches an 'ht' plan; a
    genuine mixed stream with the same main header must NOT take that
    plan (its single-pass MQ blocks would be fed to ht_scan2)."""
    from grok_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    from grok_tpu.pipeline import serve

    hdr = j2k.read_main_header(mixed_stream)
    parts = j2k.read_tile_parts(mixed_stream, hdr)
    th = j2k.TileHeader()
    j2k.read_tile_part_header(mixed_stream, parts[0], hdr, th)
    assert th.ht_mixed_bitmap() is not None

    serve._PLANS.clear()
    # crafted shape first: same main-header bytes, NO tile-part COM
    plan_ht = serve._plan_for(mixed_stream, hdr, 0, j2k.TileHeader(), 0)
    assert plan_ht is not None and plan_ht.coder == "ht"
    # the genuine mixed stream must get its own (mixed) plan, not the
    # cached 'ht' one
    plan_mx = serve._plan_for(mixed_stream, hdr, 0, th, 0)
    assert plan_mx is not None and plan_mx.coder == "mixed"
    serve._PLANS.clear()
