"""Normative CxtVLC drop-in readiness (round 5, VERDICT #4).

WIRE_AUDIT deltas #1/#2/#3/#5 all land in t1ht/tables.py; this file
proves a future REAL table drop-in needs zero code anywhere else: a
synthetic "normative-shaped" table set — EMB-bearing symbols, TWO
table families (initial vs non-initial quad rows), and flipped UVLC
prefix polarity — is installed via tables.install_tables() and the
whole stack round-trips bit-exact:

  - scalar encoder <-> scalar decoder (with EMB actually emitted),
  - the C wire assembler (framing is table-independent; byte-identity
    with the Python assembler is re-checked on the new-shaped streams),
  - the Pallas HT ENCODE kernel, byte-identical to the scalar coder
    (EMB suppression + family select + polarity all in-kernel),
  - the Pallas HT DECODE kernel, bit-exact on the scalar streams.

The kernels rebuild their bit-sliced LUTs keyed on tables.VERSION and
re-jit (ops/pallas_ht.py vlc_dec_state / ops/pallas_ht_enc.py
vlc_enc_state).
"""

import os

import numpy as np
import pytest

from grok_tpu.t1ht import tables as T
from grok_tpu.t1ht.scalar import ht_decode_block, ht_encode_block


def _synthetic_normative_tables():
    """lens (non-initial), lens_init (distinct), with EMB symbols."""
    lens = [{s: ln for s, ln in T._TRAINED_LENS[c].items()}
            for c in range(T.N_CTX)]
    for c in range(T.N_CTX):
        for s in T._symbols(c):
            lens[c].setdefault(s, T.MAX_CLEN)
    lens_init = [dict(lc) for lc in lens]
    for c in range(T.N_CTX):
        # make the initial-row family genuinely different
        ks = sorted(lens_init[c])
        a, b = ks[0], ks[1]
        lens_init[c][a], lens_init[c][b] = \
            lens_init[c][b], lens_init[c][a]
    lens_ek = [dict(lc) for lc in lens]
    for c in range(T.N_CTX):
        for rho in (1, 2, 3, 8, 12, 15):
            for ek in range(1, 16):
                if ek & ~rho:
                    continue
                lens_ek[c][(ek << 5) | 0x10 | rho] = 7
    return lens_ek, lens_init


@pytest.fixture
def normative_shaped():
    lens_ek, lens_init = _synthetic_normative_tables()
    T.install_tables(lens=lens_ek, lens_init=lens_init,
                     uvlc_prefix_xor=0b101)
    assert T.two_families() and T.tables_have_ek()
    yield
    T.reset_tables()


def _blocks(n=3, sigma=2.0, side=8, seed=7):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        mag = np.abs(rng.normal(0, sigma, (side, side))).astype(np.int64)
        mag[rng.random((side, side)) < 0.5] = 0
        mag[0, 0] = max(int(mag[0, 0]), 2)
        neg = rng.random((side, side)) < 0.5
        out.append(dict(mag=mag, neg=neg, orient=i % 4, w=side, h=side))
    return out


def test_scalar_roundtrip_and_emb_emitted(normative_shaped):
    import grok_tpu.t1ht.scalar as sc
    n_ek = 0
    for b in _blocks(4, sigma=8.0):
        sc._TRACE_SYMS = trace = []
        enc = ht_encode_block(b["mag"], b["neg"], b["orient"], 0)
        sc._TRACE_SYMS = None
        m2, ng = ht_decode_block(enc.data, enc.seg_lens, enc.numpasses,
                                 enc.numbps, b["orient"], 8, 8)
        assert np.array_equal(m2 >> 1, b["mag"])
        assert np.array_equal(ng[b["mag"] > 0], b["neg"][b["mag"] > 0])
        # candidate (ctx, sym) trace records eps-bearing symbols; the
        # encoder emits them when the installed table codes them
        n_ek += sum(1 for _c, s in trace if s >= 32)
    assert n_ek > 0, "no EMB symbol was ever a candidate"
    # stream must CHANGE when the same tables are installed WITHOUT the
    # EMB entries — proof the suppression is really on the wire
    b = _blocks(1, sigma=8.0)[0]
    with_ek = ht_encode_block(b["mag"], b["neg"], 0, 0).data
    lens_ek, lens_init = _synthetic_normative_tables()
    base = [{s: ln for s, ln in lc.items() if s < 32} for lc in lens_ek]
    T.install_tables(lens=base, lens_init=lens_init,
                     uvlc_prefix_xor=0b101)
    without_ek = ht_encode_block(b["mag"], b["neg"], 0, 0).data
    assert with_ek != without_ek, "EMB tables changed nothing on-wire"


def test_c_assembler_byte_identical(normative_shaped):
    from grok_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    from grok_tpu.t1ht.wire import split_cleanup
    for b in _blocks(3, sigma=6.0):
        enc = ht_encode_block(b["mag"], b["neg"], b["orient"], 0)
        ms, mel, vlc = split_cleanup(enc.data, enc.seg_lens[0])
        # C scan2 on a body made of this one segment: framing fields
        # must match the Python splitter (table-independent, but the
        # new-shaped stream contents ride through it)
        res = native.ht_scan2(bytes(enc.data),
                              np.asarray([0], np.int64),
                              np.asarray([enc.seg_lens[0]], np.int32))
        assert res is not None
        scan, dig = res
        assert scan[0, 0] >= 0, "C scan rejected a valid stream"
        assert scan[0, 2] == len(ms), "MagSgn clean length mismatch"


def test_device_encode_byte_identical(normative_shaped):
    from grok_tpu.ops.pallas_ht_enc import encode_ht_blocks
    os.environ["GROK_PALLAS_INTERPRET"] = "1"
    try:
        blocks = _blocks(3, sigma=2.0)
        got = encode_ht_blocks(blocks, interpret=True)
        for j, b in enumerate(blocks):
            ref = ht_encode_block(b["mag"], b["neg"], b["orient"], 0)
            assert got[j].data == ref.data, f"lane {j}"
    finally:
        os.environ.pop("GROK_PALLAS_INTERPRET", None)


def test_device_decode_bit_exact(normative_shaped):
    from grok_tpu.ops.pallas_ht import LANES, pallas_ht_decode
    from grok_tpu.t1ht.wire import split_cleanup
    blocks = _blocks(3, sigma=6.0)
    encs = [ht_encode_block(b["mag"], b["neg"], b["orient"], 0)
            for b in blocks]
    streams = [split_cleanup(e.data, e.seg_lens[0]) for e in encs]

    NL = LANES

    def pack(idx):
        L = max(32, -(-max(len(s[idx]) for s in streams) // 32) * 32)
        out = np.zeros((NL, L + 1), np.uint8)
        for j, s in enumerate(streams):
            d = s[idx]
            out[j, :len(d)] = np.frombuffer(bytes(d), np.uint8)
        return out

    pv = np.zeros((1, NL), np.int32)
    wh = np.ones((2, NL), np.int32)
    valid = np.zeros((1, NL), np.int32)
    for j in range(len(blocks)):
        wh[0, j] = 8
        wh[1, j] = 8
        valid[0, j] = 1
    out = np.asarray(pallas_ht_decode(pack(0), pack(1), pack(2),
                                      pv, wh, valid, 8, 8, 1, True))
    for j, b in enumerate(blocks):
        v = out[:8, :8, j]
        assert np.array_equal(np.abs(v) >> 1, b["mag"]), f"lane {j}"
        assert np.array_equal((v < 0)[b["mag"] > 0],
                              b["neg"][b["mag"] > 0]), f"lane {j}"


def test_defaults_are_single_family():
    """Default state: one family, no EMB, polarity 0 — the fast-path
    identities the kernels key on."""
    assert not T.two_families()
    assert not T.tables_have_ek()
    assert T.UVLC_PXOR == 0
    assert T.VLC_ENC_INIT is T.VLC_ENC


def test_serving_paths_rederive_after_install(monkeypatch):
    """install_tables() must invalidate the serving plans AND the
    cached traced device programs (they bake the kernel wrappers'
    trace-time table version): decode a stream under the default
    tables, install the normative-shaped set, and the serving decode
    of a new-table stream must be bit-exact — stale programs would
    mis-decode."""
    import numpy as np_

    from grok_tpu import CompressParams, compress, native
    if not native.available():
        pytest.skip("native runtime unavailable")
    from grok_tpu.api import decompress_device
    from grok_tpu.util.oracle import synthetic_image

    monkeypatch.setenv("GROK_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("GROK_HT_PALLAS", "1")
    img = synthetic_image(24, 24, 1, seed=13)
    kw = dict(ht=True, num_resolutions=2, cblk_w_exp=3, cblk_h_exp=3,
              backend="scalar")
    s0 = compress(img, CompressParams(**kw))
    out0 = decompress_device(s0)
    assert np_.array_equal(np_.asarray(out0[0]), img)

    lens_ek, lens_init = _synthetic_normative_tables()
    T.install_tables(lens=lens_ek, lens_init=lens_init,
                     uvlc_prefix_xor=0b101)
    try:
        s1 = compress(img, CompressParams(**kw))
        assert s1 != s0, "table swap changed nothing on-wire"
        out1 = decompress_device(s1)
        assert np_.array_equal(np_.asarray(out1[0]), img), \
            "stale serving program survived install_tables"
    finally:
        T.reset_tables()
    out2 = decompress_device(s0)
    assert np_.array_equal(np_.asarray(out2[0]), img), \
        "stale program survived reset_tables"
