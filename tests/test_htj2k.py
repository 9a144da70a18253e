"""HTJ2K (Part 15) block coder tests — self-consistent path.

The normative CxtVLC tables are unavailable offline (t1ht docs), so there
is no external oracle: the contract tested here is encoder<->decoder
bit-exactness, segment structure, and API/codestream integration.
"""

import numpy as np
import pytest

from grok_tpu import CompressParams, DecompressParams, compress, decompress
from grok_tpu.core.params import CBLK_HT
from grok_tpu.t1ht import ht_decode_block, ht_encode_block
from grok_tpu.t1ht.mel import MELDecoder, MELEncoder
from grok_tpu.t1ht.tables import N_CTX, VLC_DEC, VLC_ENC
from grok_tpu.util.oracle import synthetic_image


def _random_block(rng, h, w, scale=50, density=0.5):
    mag = np.abs(rng.normal(0, scale, (h, w))).astype(np.int64)
    mag[rng.random((h, w)) < density] = 0
    neg = rng.random((h, w)) < 0.5
    return mag, neg


class TestMEL:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip(self, seed):
        from grok_tpu.t1ht.scalar import _stuff_fwd_msb
        rng = np.random.default_rng(seed)
        # biased-to-zero event streams exercise the run-length ladder
        events = (rng.random(2000) < rng.uniform(0.02, 0.5)).astype(int)
        enc = MELEncoder()
        for e in events:
            enc.encode(int(e))
        clean, nbits = enc.finish()
        wire = bytes(_stuff_fwd_msb(clean, nbits))
        dec = MELDecoder(wire)
        out = [dec.next_event() for _ in events]
        assert out == list(events)
        # adaptive code beats raw bits on sparse streams
        if events.mean() < 0.1:
            assert len(wire) * 8 < len(events)

    def test_wire_unstuffing(self):
        from grok_tpu.t1ht.scalar import _stuff_fwd_msb
        # a long zero-event run emits consecutive 1-bits (one per full
        # run), forcing 0xFF wire bytes: the stuffed byte that follows
        # carries 7 payload bits with its MSB forced 0
        enc = MELEncoder()
        events = [0] * 600 + [1, 0, 0, 1] * 40
        for e in events:
            enc.encode(e)
        clean, nbits = enc.finish()
        wire = bytes(_stuff_fwd_msb(clean, nbits))
        for a, b in zip(wire, wire[1:]):
            assert not (a == 0xFF and b > 0x8F)
        dec = MELDecoder(wire)
        assert [dec.next_event() for _ in events] == events

    def test_dense_stream_bounded(self):
        # worst case (all one-events) costs at most ~1 bit/event
        enc = MELEncoder()
        for _ in range(500):
            enc.encode(1)
        clean, nbits = enc.finish()
        assert len(clean) <= 500 // 8 + 2


class TestVLCTables:
    def test_prefix_free_and_complete(self):
        for c in range(N_CTX):
            enc = VLC_ENC[c]
            # Kraft sum <= 1 guarantees prefix-freeness for canonical codes
            assert sum(2.0 ** -ln for ln, _ in enc.values()) <= 1.0 + 1e-12
            if c == 0:
                assert 0 not in enc          # rho=0 goes through MEL
            else:
                assert 0 in enc
            for sym, (ln, code) in enc.items():
                assert 1 <= ln <= 7
                # any 7-bit window whose low ln bits equal the code
                for pad in (0, (1 << (7 - ln)) - 1):
                    dsym, dln = VLC_DEC[c][code | (pad << ln)]
                    assert (dsym, dln) == (sym, ln)


class TestNoMarkerEmulation:
    @pytest.mark.parametrize("seed", [1, 5])
    def test_no_ff_hazard_in_packet_bodies(self, seed):
        """The wire stuffing rules guarantee no 0xFF byte is followed by
        a byte > 0x8F anywhere inside HT packet bodies — so marker
        scanners (including our own SOP resync) can never misparse a
        body as a marker.  Checked over whole codestreams: any FF>8F
        pair must BE a real marker (leading FF4F..FFD9 family)."""
        img = synthetic_image(160, 128, 1, seed=seed)
        for kw in (dict(), dict(ht_planes=2, rates=[6.0]),
                   dict(sop=True, eph=True)):
            data = compress(img, CompressParams(ht=True,
                                                num_resolutions=4, **kw))
            arr = np.frombuffer(data, np.uint8)
            pos = np.nonzero((arr[:-1] == 0xFF) & (arr[1:] > 0x8F))[0]
            for i in pos.tolist():
                assert 0x4F <= arr[i + 1] <= 0xF0, \
                    f"FF {arr[i+1]:02X} at {i}: marker emulation"
            # forced stress: blocks whose MagSgn is all-ones bit runs
        mag = np.full((64, 64), (1 << 20) - 1, np.int64)
        neg = np.zeros((64, 64), bool)
        enc = ht_encode_block(mag, neg, 0)
        b = np.frombuffer(enc.data, np.uint8)
        bad = np.nonzero((b[:-1] == 0xFF) & (b[1:] > 0x8F))[0]
        assert bad.size == 0
        m2, ng = ht_decode_block(enc.data, enc.seg_lens, 1, enc.numbps,
                                 0, 64, 64)
        assert np.array_equal(m2 >> 1, mag)


class TestHTRefinementPasses:
    def test_ht_planes_1_stays_lossless(self):
        """p=1: cleanup codes plane 1, SigProp+MagRef cover plane 0 —
        every plane coded, so full-quality decode is exact."""
        img = synthetic_image(96, 96, 1, seed=19)
        data = compress(img, CompressParams(ht=True, num_resolutions=3,
                                            ht_planes=1))
        out = decompress(data).to_array()
        assert np.array_equal(out, img)

    def test_ht_planes_device_decode(self, monkeypatch):
        """ht_planes streams ride the DEVICE decode path (the Pallas
        REFINE kernel variant, interpret mode here), lossless at p=1."""
        monkeypatch.setenv("GROK_HT_PALLAS", "1")
        monkeypatch.setenv("GROK_PALLAS_INTERPRET", "1")
        img = synthetic_image(48, 48, 1, seed=25)
        data = compress(img, CompressParams(ht=True, num_resolutions=2,
                                            cblk_w_exp=4, cblk_h_exp=4,
                                            ht_planes=1))
        import grok_tpu.t1ht as t1ht_pkg

        def bomb(*a, **k):
            raise AssertionError("scalar HT fallback used")
        monkeypatch.setattr(t1ht_pkg, "ht_decode_block", bomb)
        out = decompress(data, DecompressParams(backend="jax",
                                                strict=False)).to_array()
        assert np.array_equal(out, img)

    def test_ht_planes_improves_rate_targeted_psnr(self):
        """The measured basis for keeping cleanup-only as the default
        (device path) while offering ht_planes for lossy host encodes:
        at byte targets the 3-pass blocks give PCRD finer truncation."""
        from grok_tpu.util.oracle import psnr
        img = synthetic_image(128, 128, 1, seed=20)
        dp = DecompressParams(strict=False)
        p0 = CompressParams(ht=True, num_resolutions=4, rates=[8.0])
        p2 = CompressParams(ht=True, num_resolutions=4, rates=[8.0],
                            ht_planes=2)
        d0, d2 = compress(img, p0), compress(img, p2)
        budget = img.size / 8.0 + 400
        assert len(d0) <= budget and len(d2) <= budget
        ps0 = psnr(img, decompress(d0, dp).to_array())
        ps2 = psnr(img, decompress(d2, dp).to_array())
        assert ps2 >= ps0 - 0.05, (ps0, ps2)


class TestTableDropIn:
    def test_alternate_tables_roundtrip(self):
        """The stand-in -> normative swap path: installing a different
        CxtVLC code set (here the heuristic model) via the round-5
        install_tables() API keeps the scalar path self-consistent —
        the drop-in is a one-file change (the full normative-SHAPED
        sweep incl. EMB/families/polarity lives in
        tests/test_ht_tables_dropin.py)."""
        from grok_tpu.t1ht import tables

        enc_t, _dec_t = tables._build(kind="heuristic")
        assert enc_t != tables.VLC_ENC       # genuinely different codes
        tables.install_tables(enc=enc_t)
        try:
            rng = np.random.default_rng(4)
            for _ in range(6):
                h, w = rng.integers(1, 40, 2)
                mag, neg = _random_block(rng, h, w, scale=60,
                                         density=0.6)
                mag[0, 0] = max(int(mag[0, 0]), 3)
                enc = ht_encode_block(mag, neg, 0)
                m2, ng = ht_decode_block(enc.data, enc.seg_lens, 1,
                                         enc.numbps, 0, w, h)
                assert np.array_equal(m2 >> 1, mag)
                assert np.array_equal(ng[mag > 0], neg[mag > 0])
        finally:
            tables.reset_tables()


class TestBlockCoder:
    @pytest.mark.parametrize("seed", range(4))
    def test_lossless_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        for _ in range(8):
            h, w = rng.integers(1, 65, 2)
            mag, neg = _random_block(rng, h, w,
                                     scale=rng.choice([3, 40, 400]),
                                     density=rng.uniform(0.1, 0.95))
            enc = ht_encode_block(mag, neg, 0)
            if enc.numbps == 0:
                assert not mag.any()
                continue
            assert enc.seg_passes == [1]
            mag2, ng = ht_decode_block(enc.data, enc.seg_lens,
                                       enc.numpasses, enc.numbps, 0, w, h)
            assert np.array_equal(mag2 >> 1, mag)
            assert np.array_equal(ng[mag > 0], neg[mag > 0])

    def test_three_pass_refinement(self):
        rng = np.random.default_rng(9)
        h = w = 24
        mag, neg = _random_block(rng, h, w, scale=80, density=0.4)
        p = 2
        enc = ht_encode_block(mag, neg, 0, p=p)
        assert enc.numpasses == 3 and len(enc.seg_lens) == 3
        # full 3-pass decode reaches plane p-1 exactly (p >= 2 comes
        # from the ht_planes extension, not the segment: standard
        # framing implies p = 1 for multi-pass blocks)
        mag2, ng = ht_decode_block(enc.data, enc.seg_lens, 3,
                                   enc.numbps, 0, w, h, ht_planes=p)
        v = np.abs(mag2) >> p            # drop the plane-(p-1) half bit
        # cleanup-significant samples are refined to plane p-1
        sig_cl = (mag >> p) > 0
        assert np.array_equal(v[sig_cl], (mag >> (p - 1))[sig_cl])
        # cleanup-only truncation decodes plane p
        m1, _ = ht_decode_block(enc.data[:enc.seg_lens[0]],
                                enc.seg_lens[:1], 1, enc.numbps, 0, w, h,
                                ht_planes=p)
        v1 = np.abs(m1) >> (p + 1)
        assert np.array_equal(v1[sig_cl], (mag >> p)[sig_cl])
        # monotone improvement cleanup -> 3 passes
        err1 = np.abs((np.abs(m1) >> 1) - mag).sum()
        err3 = np.abs((np.abs(mag2) >> 1) - mag).sum()
        assert err3 <= err1
        # pass metadata monotone
        assert enc.passes[0].rate < enc.passes[1].rate < enc.passes[2].rate
        assert enc.passes[0].dist <= enc.passes[2].dist

    def test_all_zero_and_single_sample(self):
        z = np.zeros((8, 8), np.int64)
        enc = ht_encode_block(z, z.astype(bool), 0)
        assert enc.numbps == 0 and enc.data == b""
        one = np.zeros((1, 1), np.int64)
        one[0, 0] = 7
        enc = ht_encode_block(one, np.ones((1, 1), bool), 2)
        m2, ng = ht_decode_block(enc.data, enc.seg_lens, 1, enc.numbps,
                                 2, 1, 1)
        assert m2[0, 0] >> 1 == 7 and bool(ng[0, 0])

    def test_corrupt_scup_permissive(self):
        rng = np.random.default_rng(3)
        mag, neg = _random_block(rng, 16, 16)
        enc = ht_encode_block(mag, neg, 0)
        bad = bytearray(enc.data)
        bad[-1] = 0xFF
        bad[-2] = 0xFF                  # Scup > segment length
        m2, ng = ht_decode_block(bytes(bad), enc.seg_lens, 1, enc.numbps,
                                 0, 16, 16, strict=False)
        assert not m2.any()
        with pytest.raises(ValueError):
            ht_decode_block(bytes(bad), enc.seg_lens, 1, enc.numbps,
                            0, 16, 16, strict=True)


class TestHTApi:
    def test_truncated_stream_degrades(self):
        from grok_tpu.codestream.j2k import CodestreamError
        img = synthetic_image(96, 96, 1, seed=17)
        d = compress(img, CompressParams(num_resolutions=3, ht=True))
        for cut in (len(d) // 2, len(d) // 4, 64):
            try:
                decompress(d[:cut], DecompressParams(strict=False))
            except CodestreamError:
                pass            # clean error allowed (header-level cuts)

    def test_lossless_gray(self):
        img = synthetic_image(128, 96, 1, seed=3)
        d = compress(img, CompressParams(num_resolutions=4, ht=True))
        assert np.array_equal(decompress(d).to_array(), img)

    def test_lossless_rgb_rct(self):
        img = synthetic_image(64, 64, 3, seed=5)
        d = compress(img, CompressParams(num_resolutions=3, ht=True))
        assert np.array_equal(decompress(d).to_array(), img)

    def test_lossy_97(self):
        img = synthetic_image(128, 128, 1, seed=7)
        d = compress(img, CompressParams(num_resolutions=4, ht=True,
                                         irreversible=True))
        out = decompress(d).to_array()
        mse = ((out.astype(float) - img) ** 2).mean()
        assert 10 * np.log10(255 ** 2 / mse) > 45

    def test_cap_marker_and_style_bit(self):
        from grok_tpu.codestream import j2k
        img = synthetic_image(64, 64, 1, seed=1)
        d = compress(img, CompressParams(num_resolutions=3, ht=True))
        hdr = j2k.read_main_header(d)
        assert hdr.cap is not None
        pcap, scaps = hdr.cap
        assert pcap & (1 << (32 - 15))
        assert len(scaps) == 1
        assert hdr.cod.comp.cblk_style & CBLK_HT
        assert hdr.rsiz & 0x4000

    def test_ht_rejects_part1_mode_switches(self):
        with pytest.raises(ValueError):
            CompressParams(ht=True, cblk_style=0x01).validate()

    def test_rate_targeted_layers(self):
        img = synthetic_image(128, 128, 1, seed=11)
        d = compress(img, CompressParams(num_resolutions=4, ht=True,
                                         num_layers=2, rates=[8, 1]))
        full = decompress(d).to_array()
        assert np.array_equal(full, img)      # last layer lossless
        l1 = decompress(d, DecompressParams(max_layers=1)).to_array()
        mse = ((l1.astype(float) - img) ** 2).mean()
        assert mse < 300                      # first layer usable

    def test_reduce_and_window(self):
        img = synthetic_image(128, 128, 1, seed=13)
        d = compress(img, CompressParams(num_resolutions=4, ht=True))
        r1 = decompress(d, DecompressParams(reduce=1)).to_array()
        assert r1.shape == (64, 64)
        win = decompress(
            d, DecompressParams(window=(32, 32, 96, 96))).to_array()
        assert np.array_equal(win, img[32:96, 32:96])
