"""Byte-layout audit of the HT cleanup segment (docs/WIRE_AUDIT.md).

This file contains an INDEPENDENT minimal reader of the HT cleanup
segment, written from the documented ISO/IEC 15444-15 layout alone — it
deliberately shares no code with grok_tpu.t1ht (no imports from
t1ht.scalar / t1ht.mel / t1ht.wire).  The only shared artifact is the
CxtVLC code table VALUES (t1ht.tables.VLC_ENC), because codeword values
are exactly the one documented delta vs the standard (the normative
tables are unavailable offline); everything else — segment framing,
sub-stream packing, bit-stuffing, the MEL ladder, quad-pair scan,
context/exponent prediction, pair-coupled UVLC — is re-implemented here
from the layout description and must parse the production encoder's
output bit-for-bit.

If this test fails, the wire is NOT standard-framed.
"""

from __future__ import annotations

import numpy as np
import pytest

from grok_tpu.t1ht.scalar import ht_encode_block
from grok_tpu.t1ht.tables import VLC_ENC

# ---------------------------------------------------------------------------
# Independent reader (spec layout only — do not import t1ht readers)
# ---------------------------------------------------------------------------

MEL_EXPONENTS = (0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5)   # 13-state ladder


class FwdBits:
    """Forward LSB-first bit reader with 0xFF bit-stuffing: a byte that
    follows an emitted 0xFF carries 7 payload bits; reads past the end
    return 1-bits (0xFF padding)."""

    def __init__(self, data, lo, hi):
        self.data, self.pos, self.hi = data, lo, hi
        self.acc = 0
        self.n = 0
        self.prev_ff = False

    def bit(self):
        if self.n == 0:
            b = self.data[self.pos] if self.pos < self.hi else 0xFF
            self.pos += 1
            self.n = 7 if self.prev_ff else 8
            self.prev_ff = b == 0xFF
            self.acc = b
        v = self.acc & 1
        self.acc >>= 1
        self.n -= 1
        return v

    def bits(self, n):
        return sum(self.bit() << i for i in range(n))


class MelBits:
    """MEL: forward MSB-first bits over the suffix with 0xFF stuffing,
    feeding the 13-state adaptive run-length machine."""

    def __init__(self, data, lo, hi):
        self.data, self.pos, self.hi = data, lo, hi
        self.byte = 0
        self.n = 0
        self.prev_ff = False
        self.state = 0
        self.owed = 0            # zero-events owed from a decoded run
        self.one_next = False    # a 1-event owed after a partial run

    def _bit(self):
        if self.n == 0:
            b = self.data[self.pos] if self.pos < self.hi else 0xFF
            self.pos += 1
            self.n = 7 if self.prev_ff else 8
            self.prev_ff = b == 0xFF
            self.byte = b
        self.n -= 1
        return (self.byte >> self.n) & 1

    def event(self):
        if self.owed:
            self.owed -= 1
            return 0
        if self.one_next:
            self.one_next = False
            return 1
        e = MEL_EXPONENTS[self.state]
        if self._bit():                      # completed run of 2^e zeros
            self.owed = (1 << e) - 1
            self.state = min(self.state + 1, 12)
            return 0
        r = 0
        for _ in range(e):                   # partial run, MSB first
            r = (r << 1) | self._bit()
        self.state = max(self.state - 1, 0)
        if r:
            self.owed = r - 1
            self.one_next = True
            return 0
        return 1


class RevVlcBits:
    """VLC: LSB-first bits per byte, bytes walking BACKWARD from the
    high nibble of data[L-2]; a 0x7F byte whose (higher-address) file
    successor is > 0x8F carries 7 bits; reads past the start return
    1-bits."""

    def __init__(self, data, lo, L):
        self.data, self.lo = data, lo
        self.pos = L - 3
        b = data[L - 2]
        self.acc = b >> 4
        self.n = 4
        self.succ = b

    def bit(self):
        if self.n == 0:
            if self.pos >= self.lo:
                b = self.data[self.pos]
                self.pos -= 1
                self.n = 7 if (self.succ > 0x8F and b == 0x7F) else 8
                self.succ = b
            else:
                b, self.n = 0xFF, 8
            self.acc = b
        v = self.acc & 1
        self.acc >>= 1
        self.n -= 1
        return v


def read_uvlc_prefix(rd):
    """(base, suffix_len): '0'->1; '10'->2; '110'+1 -> 3+s; '111'+5 ->
    5+s (s<31) else 36 + 5 extension bits."""
    if rd.bit() == 0:
        return 1, 0
    if rd.bit() == 0:
        return 2, 0
    if rd.bit() == 0:
        return 3, 1
    return 5, 5


def read_uvlc_suffix(rd, base, slen):
    s = sum(rd.bit() << i for i in range(slen))
    if slen == 5 and s == 31:
        return 36 + sum(rd.bit() << i for i in range(5))
    return base + s


def independent_decode(seg: bytes, w: int, h: int):
    """Decode a p=0 HT cleanup segment from the documented layout.

    Returns (mu, sign) int arrays — mu the quantized magnitude (>= 1
    where significant), sign 0/1.
    """
    L = len(seg)
    assert L >= 2
    scup = (seg[L - 1] << 4) | (seg[L - 2] & 0xF)
    assert 2 <= scup <= L, "Scup out of range"
    suf = L - scup

    # canonical decode maps from the (published) code table values
    dec = []
    for c in range(8):
        m = {}
        for sym, (ln, code) in VLC_ENC[c].items():
            m[(ln, code)] = sym
        dec.append(m)

    ms = FwdBits(seg, 0, suf)
    mel = MelBits(seg, suf, L - 2)
    vlc = RevVlcBits(seg, suf, L)

    gw, gh = (w + 1) // 2, (h + 1) // 2
    rho = np.zeros((gh, gw), np.int32)
    emax_bot = np.zeros((gh, gw), np.int32)
    mu = np.zeros((h, w), np.int64)
    sign = np.zeros((h, w), np.int64)

    def read_codeword(c):
        ln, code = 0, 0
        for _ in range(8):
            code |= vlc.bit() << ln
            ln += 1
            if (ln, code) in dec[c]:
                return dec[c][(ln, code)]
        raise AssertionError("no CxtVLC codeword matched")

    for g in range(gh):
        for qp in range(0, gw, 2):
            pair = []
            for qx in (qp, qp + 1):
                if qx >= gw:
                    break
                c = 0
                if qx > 0 and (rho[g, qx - 1] & 0b1100):
                    c |= 1
                if g > 0 and (rho[g - 1, qx] & 0b1010):
                    c |= 2
                if g > 0 and qx + 1 < gw and (rho[g - 1, qx + 1] & 0b0010):
                    c |= 4
                if c == 0 and mel.event() == 0:
                    pair.append((qx, 0))
                    continue
                sym = read_codeword(c)
                rho[g, qx] = sym & 0xF
                pair.append((qx, sym))

            offs = [bool(s & 0x10) for _, s in pair]
            us = [0] * len(pair)
            if len(offs) == 2 and offs[0] and offs[1]:
                add = 0
                if g == 0 and mel.event() == 1:        # both u > 2
                    add = 2
                    b0, s0 = read_uvlc_prefix(vlc)
                    b1, s1 = read_uvlc_prefix(vlc)
                elif g == 0:
                    b0, s0 = read_uvlc_prefix(vlc)
                    if s0 or b0 >= 3:                  # 3-bit prefix
                        b1, s1 = vlc.bit() + 1, 0      # u1 in one bit
                    else:
                        b1, s1 = read_uvlc_prefix(vlc)
                else:
                    b0, s0 = read_uvlc_prefix(vlc)
                    b1, s1 = read_uvlc_prefix(vlc)
                us[0] = read_uvlc_suffix(vlc, b0, s0) + add
                us[1] = read_uvlc_suffix(vlc, b1, s1) + add
            else:
                for i, off in enumerate(offs):
                    if off:
                        b, s = read_uvlc_prefix(vlc)
                        us[i] = read_uvlc_suffix(vlc, b, s)

            for (qx, sym), u in zip(pair, us):
                r = sym & 0xF
                if r == 0:
                    continue
                # vertical exponent predictor
                kappa = 1
                if r & (r - 1):
                    kappa = max(1, int(emax_bot[g - 1, qx] if g else 0) - 1)
                U = int(kappa + u)
                ek = sym >> 5
                eb = 0
                for i, (dy, dx) in enumerate(((0, 0), (1, 0),
                                              (0, 1), (1, 1))):
                    if not (r >> i) & 1:
                        continue
                    k = (ek >> i) & 1
                    v = ms.bits(U - k) | (k << (U - 1))
                    if i & 1:
                        eb = max(eb, v.bit_length())
                    y, x = 2 * g + dy, 2 * qx + dx
                    if y < h and x < w:
                        mu[y, x] = (v >> 1) + 1
                        sign[y, x] = v & 1
                emax_bot[g, qx] = eb
    return mu, sign


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def _random_block(rng, h, w, scale, density):
    mag = np.abs(rng.normal(0, scale, (h, w))).astype(np.int64)
    mag[rng.random((h, w)) < density] = 0
    neg = (rng.random((h, w)) < 0.5) & (mag > 0)
    return mag, neg


@pytest.mark.parametrize("seed,w,h,scale,density", [
    (0, 32, 32, 200, 0.5),
    (1, 17, 9, 40, 0.3),
    (2, 64, 64, 3000, 0.7),
    (3, 5, 1, 80, 0.2),
    (4, 1, 7, 12, 0.0),
    (5, 24, 16, 6, 0.9),
])
def test_independent_reader_parses_p0_segment(seed, w, h, scale, density):
    rng = np.random.default_rng(seed)
    mag, neg = _random_block(rng, h, w, scale, density)
    enc = ht_encode_block(mag, neg, 0)
    if enc.data is None:
        pytest.skip("empty block")
    assert len(enc.seg_lens) == 1, "p=0 block must be cleanup-only"
    mu, sign = independent_decode(enc.data[:enc.seg_lens[0]], w, h)
    assert np.array_equal(mu, mag), "magnitudes differ"
    nz = mag > 0
    assert np.array_equal(sign[nz].astype(bool), neg[nz]), "signs differ"


def test_no_marker_emulation_in_segment():
    """No 0xFF byte may be followed by a byte > 0x8F anywhere (the
    packet-body safety rule the stuffing exists for)."""
    rng = np.random.default_rng(42)
    for _ in range(40):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        mag, neg = _random_block(rng, h, w, float(rng.integers(2, 4000)),
                                 float(rng.random()))
        enc = ht_encode_block(mag, neg, 0)
        if enc.data is None:
            continue
        d = enc.data
        for i in range(len(d) - 1):
            assert not (d[i] == 0xFF and d[i + 1] > 0x8F), \
                f"marker emulation at byte {i}"


def test_scup_is_last_12_bits():
    rng = np.random.default_rng(7)
    mag, neg = _random_block(rng, 16, 16, 100, 0.4)
    enc = ht_encode_block(mag, neg, 0)
    d, L = enc.data, enc.seg_lens[0]
    scup = (d[L - 1] << 4) | (d[L - 2] & 0xF)
    assert 2 <= scup <= L


def test_ht_planes_extension_com_roundtrip():
    """ht_planes >= 1 rides a COM marker, not segment bytes; the stream
    round-trips through the public API and the marker is present."""
    from grok_tpu import api
    from grok_tpu.codestream import j2k
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (64, 64), np.uint8)
    cs = api.compress(img, api.CompressParams(
        num_resolutions=2, ht=True, ht_planes=2))
    hdr = j2k.read_main_header(cs)
    assert hdr.ht_planes_ext() == 2
    dec = api.decompress(cs)
    arr = np.asarray(dec.components[0].data)
    # ht_planes=2 truncates below plane 1 (SigProp/MagRef refine plane
    # 1): coefficient error <= 3, a few pixels more after inverse DWT
    err = np.abs(arr.astype(np.int64) - img.astype(np.int64))
    assert float(err.mean()) < 3.0 and int(err.max()) <= 24
    # p = 0 default emits no extension marker
    cs0 = api.compress(img, api.CompressParams(
        num_resolutions=2, ht=True))
    assert j2k.read_main_header(cs0).ht_planes_ext() == 0
