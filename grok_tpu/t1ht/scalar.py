"""HTJ2K block coder, scalar reference model (ISO/IEC 15444-15 structure).

Codeword layout of the HT Cleanup segment (self-consistent framing; the
spec interleaves Scup into the last VLC bytes, we store it explicitly):

    [0]                p      plane of the cleanup pass (1 byte)
    [1 .. L-Scup)      MagSgn stream, forward, LSB-first bits
    [L-Scup .. )       MEL stream, forward, MSB-first bits
    ( .. L-4)          VLC stream, stored byte-reversed (read backward)
    [L-4 .. L-2)       len(MEL), little-endian (device packer boundary)
    [L-2 .. L)         Scup = len(MEL) + len(VLC) + 4, little-endian

No 0xFF bit-stuffing anywhere in the segment: the lockstep device
decoder reads fixed byte widths; marker-code emulation inside packet
bodies is an accepted non-conformance of this experimental path.

Coding model per 2x2 quad (samples column-wise n0=(0,0) n1=(1,0)
n2=(0,1) n3=(1,1), offsets (dy,dx)):

  - significance pattern rho = sum(sig(ni) << i)
  - quad context c = left | top<<1 | topright<<2 from neighbouring quads'
    significance (quad-level; the spec uses sample-level context bits)
  - c == 0: MEL codes the event (rho != 0); VLC then codes rho in [1,16)
  - c != 0: VLC codes rho in [0,16)
  - rho != 0: UVLC codes u = U - 1 where U = max bit-length of the
    significant quantized magnitudes v_n = mag_n >> p
  - MagSgn holds, per significant sample, U bits of (v_n - 1) then the
    sign bit (no EMB known-bit suppression: costs ~1 bit/significant
    sample vs the normative coder, see t1ht/__init__ docstring)

Optional HT SigProp / HT MagRef passes (numpasses 2, 3) refine plane
p-1 with raw bits in their own terminated segments, 4-row stripe scan.

Reference parity: [grok: src/lib/core/t1/t1_ht/ ht_block_encoding.cpp,
ht_block_decoding.cpp] (SURVEY.md §2 row 8); behavior per ISO/IEC
15444-15 except the table/framing substitutions documented above.
"""

from __future__ import annotations

import numpy as np

from grok_tpu.t1.t1_scalar import EncodedBlock, PassInfo
from grok_tpu.t1ht.mel import MELDecoder, MELEncoder
from grok_tpu.t1ht.tables import (VLC_DEC, VLC_ENC, uvlc_decode,
                                  uvlc_encode)

# sample offsets within a quad, scan order (dy, dx)
_QOFF = ((0, 0), (1, 0), (0, 1), (1, 1))


class _MagSgnWriter:
    """LSB-first bit packer (no stuffing — see module docstring)."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def bit(self, b: int):
        self._acc |= (b & 1) << self._n
        self._n += 1
        if self._n == 8:
            self.buf.append(self._acc)
            self._acc = 0
            self._n = 0

    def bits(self, v: int, n: int):
        for i in range(n):
            self.bit((v >> i) & 1)

    def finish(self) -> bytes:
        if self._n:
            self.buf.append(self._acc)
            self._acc = 0
            self._n = 0
        return bytes(self.buf)


class _MagSgnReader:
    def __init__(self, data: bytes, start: int, end: int):
        self.data, self.pos, self.end = data, start, end
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos] if self.pos < self.end else 0
            self.pos += 1
            self._acc = b
            self._n = 8
        v = self._acc & 1
        self._acc >>= 1
        self._n -= 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _VLCWriter:
    """LSB-first bit buffer; bytes are reversed at finish (the stream is
    stored backward at the end of the segment)."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def bits(self, v: int, n: int):
        for i in range(n):
            self._acc |= ((v >> i) & 1) << self._n
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc = 0
                self._n = 0

    def finish(self) -> bytes:
        if self._n:
            self.buf.append(self._acc)
            self._acc = 0
            self._n = 0
        return bytes(reversed(self.buf))


class _VLCReader:
    """Reads the byte-reversed VLC stream backward (byte at `end-1`
    first), LSB-first bits within each byte."""

    def __init__(self, data: bytes, start: int, end: int):
        self.data, self.start, self.pos = data, start, end - 1
        self._acc = 0
        self._n = 0

    def _fill(self, need: int):
        while self._n < need:
            b = self.data[self.pos] if self.pos >= self.start else 0
            self.pos -= 1
            self._acc |= b << self._n
            self._n += 8

    def peek7(self) -> int:
        self._fill(7)
        return self._acc & 0x7F

    def skip(self, n: int):
        self._fill(n)
        self._acc >>= n
        self._n -= n

    def bit(self) -> int:
        self._fill(1)
        v = self._acc & 1
        self._acc >>= 1
        self._n -= 1
        return v


def _quad_grid(w: int, h: int):
    return (h + 1) // 2, (w + 1) // 2


def ht_encode_block(mag: np.ndarray, neg: np.ndarray, orient: int,
                    style: int = 0, p: int = 0) -> EncodedBlock:
    """Encode one code-block with the HT coder.

    p: cleanup bitplane (0 = lossless cleanup, single pass; p > 0 adds
    HT SigProp + HT MagRef passes refining plane p-1).
    """
    h, w = mag.shape
    mag = np.asarray(mag, dtype=np.int64)
    neg = np.asarray(neg, dtype=bool)
    numbps = int(mag.max()).bit_length() if mag.size else 0
    if numbps == 0:
        return EncodedBlock()
    p = min(p, numbps - 1) if numbps > 1 else 0

    v = mag >> p
    gh, gw = _quad_grid(w, h)
    sig = v > 0

    mel = MELEncoder()
    vlc = _VLCWriter()
    ms = _MagSgnWriter()

    rho_row = np.zeros((gh, gw), dtype=np.int32)
    for g in range(gh):
        for qx in range(gw):
            rho = 0
            vals = []
            for i, (dy, dx) in enumerate(_QOFF):
                y, x = 2 * g + dy, 2 * qx + dx
                if y < h and x < w and sig[y, x]:
                    rho |= 1 << i
                    vals.append((int(v[y, x]), bool(neg[y, x])))
            rho_row[g, qx] = rho
            left = rho_row[g, qx - 1] != 0 if qx > 0 else False
            top = rho_row[g - 1, qx] != 0 if g > 0 else False
            topr = rho_row[g - 1, qx + 1] != 0 \
                if (g > 0 and qx + 1 < gw) else False
            c = int(left) | (int(top) << 1) | (int(topr) << 2)
            if c == 0:
                mel.encode(1 if rho else 0)
                if rho == 0:
                    continue
            ln, code = VLC_ENC[c][rho]
            vlc.bits(code, ln)
            if rho == 0:
                continue
            U = max(val.bit_length() for val, _ in vals)
            ln, code = uvlc_encode(U - 1)
            vlc.bits(code, ln)
            for val, ng in vals:
                ms.bits(val - 1, U)
                ms.bit(1 if ng else 0)

    mel_b = mel.finish()
    vlc_b = vlc.finish()
    ms_b = ms.finish()
    nm = len(mel_b)
    scup = nm + len(vlc_b) + 4
    cleanup = bytes([p]) + ms_b + mel_b + vlc_b + \
        bytes([nm & 0xFF, (nm >> 8) & 0xFF,
               scup & 0xFF, (scup >> 8) & 0xFF])

    # distortion bookkeeping (Part-1 half-bit reconstruction model)
    m = mag.astype(np.float64)
    rec = np.where(sig, (v << p).astype(np.float64) + 0.5 * (1 << p), 0.0)
    d_total = float((m ** 2).sum())
    d_clean = d_total - float(((m - rec) ** 2).sum())
    passes = [PassInfo(rate=len(cleanup), dist=d_clean, term=True)]
    seg_lens = [len(cleanup)]
    data = cleanup

    if p > 0:
        sp_b, new_sig = _encode_sigprop(mag, neg, sig, p - 1, w, h)
        mr_b = _encode_magref(mag, sig, p - 1, w, h)
        bp = p - 1
        v1 = mag >> bp
        rec_sp = rec.copy()
        rec_sp[new_sig] = 1.5 * (1 << bp)
        d_sp = d_total - float(((m - rec_sp) ** 2).sum())
        rec_mr = rec_sp.copy()
        rec_mr[sig] = (v1[sig] << bp).astype(np.float64) + 0.5 * (1 << bp)
        d_mr = d_total - float(((m - rec_mr) ** 2).sum())
        passes.append(PassInfo(rate=len(cleanup) + len(sp_b),
                               dist=d_sp, term=True))
        passes.append(PassInfo(rate=len(cleanup) + len(sp_b) + len(mr_b),
                               dist=d_mr, term=True))
        seg_lens += [len(sp_b), len(mr_b)]
        data = cleanup + sp_b + mr_b

    return EncodedBlock(data=data, numbps=numbps, passes=passes,
                        seg_lens=seg_lens,
                        seg_passes=[1] * len(seg_lens))


def _stripe_scan(w: int, h: int):
    for y0 in range(0, h, 4):
        for x in range(w):
            for y in range(y0, min(y0 + 4, h)):
                yield x, y


def _encode_sigprop(mag, neg, sig, bp, w, h):
    """HT SigProp: raw significance + sign of plane `bp` for samples with
    a significant neighbour; causal in stripe scan order."""
    wr = _MagSgnWriter()
    st = np.zeros((h + 2, w + 2), dtype=bool)
    st[1:h + 1, 1:w + 1] = sig
    new_sig = np.zeros((h, w), dtype=bool)
    for x, y in _stripe_scan(w, h):
        if st[y + 1, x + 1]:
            continue
        if not st[y:y + 3, x:x + 3].any():
            continue
        bit = (int(mag[y, x]) >> bp) & 1
        wr.bit(bit)
        if bit:
            wr.bit(1 if neg[y, x] else 0)
            st[y + 1, x + 1] = True
            new_sig[y, x] = True
    return wr.finish(), new_sig


def _encode_magref(mag, sig, bp, w, h):
    """HT MagRef: raw refinement bit of plane `bp` for samples already
    significant after the cleanup pass."""
    wr = _MagSgnWriter()
    for x, y in _stripe_scan(w, h):
        if sig[y, x]:
            wr.bit((int(mag[y, x]) >> bp) & 1)
    return wr.finish()


def ht_decode_block(data: bytes, seg_lens: list[int], numpasses: int,
                    numbps: int, orient: int, w: int, h: int,
                    style: int = 0,
                    strict: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Decode one HT code-block; mirrors t1_scalar.decode_block's contract
    (returns mag2 = 2*value with the half-bit below the last decoded
    plane, and the sign array)."""
    mag2 = np.zeros((h, w), dtype=np.int64)
    neg = np.zeros((h, w), dtype=bool)
    if numpasses <= 0 or numbps <= 0 or not data:
        return mag2, neg
    if not seg_lens:
        seg_lens = [len(data)]
    L = seg_lens[0]
    if L > len(data):
        # truncated cleanup segment: the VLC suffix (stored at the END of
        # the segment) is gone — nothing recoverable from this block
        if strict:
            raise ValueError("HT cleanup segment truncated")
        return mag2, neg
    if L < 6:
        return mag2, neg
    p = data[0]
    scup = data[L - 2] | (data[L - 1] << 8)
    mel_len = data[L - 4] | (data[L - 3] << 8)
    if scup < 4 or scup > L - 1 or mel_len > scup - 4:
        if strict:
            raise ValueError("HT cleanup: bad Scup")
        return mag2, neg

    ms = _MagSgnReader(data, 1, L - scup)
    mel = MELDecoder(data, L - scup, L - scup + mel_len)
    vlc = _VLCReader(data, L - scup + mel_len, L - 4)

    gh, gw = _quad_grid(w, h)
    v = np.zeros((h, w), dtype=np.int64)
    rho_row = np.zeros((gh, gw), dtype=np.int32)
    for g in range(gh):
        for qx in range(gw):
            left = rho_row[g, qx - 1] != 0 if qx > 0 else False
            top = rho_row[g - 1, qx] != 0 if g > 0 else False
            topr = rho_row[g - 1, qx + 1] != 0 \
                if (g > 0 and qx + 1 < gw) else False
            c = int(left) | (int(top) << 1) | (int(topr) << 2)
            if c == 0 and mel.next_event() == 0:
                continue
            sym, ln = VLC_DEC[c][vlc.peek7()]
            if sym < 0:
                if strict:
                    raise ValueError("HT cleanup: bad VLC code")
                return mag2, neg
            vlc.skip(ln)
            rho = sym
            rho_row[g, qx] = rho
            if rho == 0:
                continue
            U = uvlc_decode(vlc.bit) + 1
            for i, (dy, dx) in enumerate(_QOFF):
                if not (rho >> i) & 1:
                    continue
                y, x = 2 * g + dy, 2 * qx + dx
                val = ms.bits(U) + 1
                sgn = ms.bit()
                if y < h and x < w:
                    v[y, x] = val
                    neg[y, x] = bool(sgn)

    sig = v > 0
    lp = np.full((h, w), int(p), dtype=np.int64)

    if numpasses >= 2 and len(seg_lens) >= 2 and p > 0:
        bp = p - 1
        s0, s1 = seg_lens[0], seg_lens[0] + seg_lens[1]
        rd = _MagSgnReader(data, s0, min(s1, len(data)))
        st = np.zeros((h + 2, w + 2), dtype=bool)
        st[1:h + 1, 1:w + 1] = sig
        for x, y in _stripe_scan(w, h):
            if st[y + 1, x + 1]:
                continue
            if not st[y:y + 3, x:x + 3].any():
                continue
            if rd.bit():
                neg[y, x] = bool(rd.bit())
                st[y + 1, x + 1] = True
                v[y, x] = 1
                lp[y, x] = bp

        if numpasses >= 3 and len(seg_lens) >= 3:
            s2 = s1 + seg_lens[2]
            rd = _MagSgnReader(data, s1, min(s2, len(data)))
            for x, y in _stripe_scan(w, h):
                if sig[y, x]:
                    v[y, x] = (v[y, x] << 1) | rd.bit()
                    lp[y, x] = bp

    nz = v > 0
    mag2[nz] = (v[nz] << (lp[nz] + 1)) + np.where(lp[nz] > 0,
                                                  1 << lp[nz], 0)
    return mag2, neg
