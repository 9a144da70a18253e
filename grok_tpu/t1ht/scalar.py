"""HTJ2K block coder, scalar reference model (ISO/IEC 15444-15 structure).

Wire layout of the HT Cleanup segment (standard framing — the full
byte-layout audit vs ISO/IEC 15444-15 lives in docs/WIRE_AUDIT.md):

    [0 .. L-Scup)      MagSgn stream: forward, LSB-first bits, 0xFF
                       bit-stuffing (a byte after 0xFF carries 7 bits)
    [L-Scup .. L)      suffix: MEL stream growing FORWARD from L-Scup
                       (MSB-first bits, 0xFF stuffing) and the VLC
                       stream growing BACKWARD from the high nibble of
                       byte L-2 (LSB-first bits per byte, read toward
                       lower addresses, 0x7F-after->0x8F un-stuffing)
    last 12 bits       Scup = (data[L-1] << 4) | (data[L-2] & 0xF)

No explicit sub-stream lengths: MEL and VLC share the suffix and are
sized by the encoder so they never collide.  The stuffing rules (plus
boundary padding in `assemble_cleanup`) guarantee no 0xFF byte is ever
followed by a byte > 0x8F anywhere in the segment — no marker-code
emulation inside packet bodies.

The cleanup bitplane p is NOT in the segment (standard behavior): a
1-pass block codes p = 0 and a 2/3-pass block codes p = 1 (the HT
SigProp / HT MagRef passes refine plane p-1 = 0).  This framework's
deeper-truncation extension (ht_planes >= 1) signals the global plane
P once, in a COM marker (codestream/j2k.py); the per-block plane is
then min(P, numbps-1), decoder-computable from the tag-tree numbps.

Coding model per 2x2 quad (samples column-major n0=(0,0) n1=(1,0)
n2=(0,1) n3=(1,1), offsets (dy,dx)); quantized magnitude mu_n >= 1 for
significant samples, v_n = ((mu_n - 1) << 1) | sign_n, exponent
E_n = bitlength(v_n):

  - significance pattern rho = sum(sig(n_i) << i)
  - sample-level context c = tables.quad_ctx(left, above, above-right)
  - c == 0: a MEL event codes (rho != 0); rho == 0 quads cost no VLC
  - CxtVLC codes (rho, u_off [, eps_k]) jointly per context
  - exponent bound U_q = kappa_q + u_q with the vertical predictor
    kappa_q = tables.quad_kappa(rho, E_above) (E_above = max E_n over
    the bottom-row samples of the quad directly above); u_off = u_q > 0
    and u_q >= 1 is UVLC-coded
  - quads are processed in PAIRS along each quad row; when both quads
    of a pair have u_off = 1 the UVLC prefixes are interleaved (pfx0,
    pfx1, sfx0, sfx1), and in the INITIAL row pair a MEL event codes
    whether both u > 2 (then u-2 values are coded; otherwise a 3-bit
    first prefix implies u1 <= 2, coded in one bit) — see
    _emit_u_pair / _read_u_pair
  - MagSgn codes, per significant sample, m_n = U_q - eps_k(n) low bits
    of v_n; when eps_k(n) = 1 the decoder restores the known MSB at
    bit U_q - 1 (the EMB magnitude-bit suppression; default tables set
    eps_k = 0)

Optional HT SigProp / HT MagRef passes (numpasses 2, 3) refine plane
p-1 with raw stuffed bits in their own terminated segments, 4-row
stripe scan.

Reference parity: [grok: src/lib/core/t1/t1_ht/ ht_block_encoding.cpp,
ht_block_decoding.cpp] (SURVEY.md §2 row 8); behavior per ISO/IEC
15444-15 structure with self-consistent code tables (t1ht/tables.py).
"""

from __future__ import annotations

import numpy as np

from grok_tpu.t1.t1_scalar import EncodedBlock, PassInfo
from grok_tpu.t1ht.mel import BitSink, MELDecoder, MELEncoder
from grok_tpu.t1ht import tables as _T
from grok_tpu.t1ht.tables import (quad_ctx, quad_kappa, uvlc_encode,
                                  uvlc_parts)

# sample offsets within a quad, scan order (dy, dx)
_QOFF = ((0, 0), (1, 0), (0, 1), (1, 1))

MAX_SCUP = 4079

# table-training hook (tools/gen_ht_tables.py): when set to a list, the
# encoder appends every coded (context, symbol) pair
_TRACE_SYMS: list | None = None


# --- wire assembly (shared by the scalar and device encoders) ---------------

def _stuff_fwd_lsb(buf: bytes, nbits: int) -> bytearray:
    """Clean LSB-first bit sequence -> stuffed forward stream (MagSgn,
    SigProp, MagRef): after an emitted 0xFF the next byte carries only
    7 payload bits (bit 7 forced 0)."""
    out = bytearray()
    acc = 0
    n = 0
    cap = 8
    for i in range(nbits):
        acc |= ((buf[i >> 3] >> (i & 7)) & 1) << n
        n += 1
        if n == cap:
            out.append(acc)
            cap = 7 if acc == 0xFF else 8
            acc = 0
            n = 0
    if n:
        out.append(acc)
    return out


def _stuff_fwd_msb(buf: bytes, nbits: int) -> bytearray:
    """Clean LSB-first bit sequence -> stuffed forward MSB-first stream
    (MEL): bits packed from bit 7 down; after 0xFF only 7 bits."""
    out = bytearray()
    acc = 0
    n = 0
    cap = 8
    for i in range(nbits):
        b = (buf[i >> 3] >> (i & 7)) & 1
        acc |= b << (cap - 1 - n)
        n += 1
        if n == cap:
            out.append(acc)
            cap = 7 if acc == 0xFF else 8
            acc = 0
            n = 0
    if n:
        out.append(acc)
    return out


def _vlc_backward_bytes(buf: bytes, nbits: int) -> tuple[int, bytearray]:
    """Clean LSB-first VLC bit sequence -> (first-nibble value, body
    bytes in BACKWARD-emission order).  body[0] sits at file position
    L-3, body[1] at L-4, ...  Un-stuffing rule: a byte whose file
    successor is > 0x8F and whose own low 7 bits are all ones is
    emitted as the 7-bit byte 0x7F."""
    def bit(i):
        return (buf[i >> 3] >> (i & 7)) & 1 if i < nbits else 0

    nib = bit(0) | (bit(1) << 1) | (bit(2) << 2) | (bit(3) << 3)
    body = bytearray()
    i = 4
    prev_gt = nib >= 0x9            # successor byte is (nib<<4)|scup&0xF
    while i < nbits:
        acc = 0
        for k in range(7):
            acc |= bit(i + k) << k
        if prev_gt and acc == 0x7F:
            body.append(0x7F)
            i += 7
        else:
            acc |= bit(i + 7) << 7
            body.append(acc)
            i += 8
        prev_gt = body[-1] > 0x8F
    return nib, body


def assemble_cleanup(ms: tuple[bytes, int], mel: tuple[bytes, int],
                     vlc: tuple[bytes, int]) -> bytes:
    """Build the wire cleanup segment from clean LSB-first bit streams.

    ms/mel/vlc: (bytes, bit_count) in transmission order.  Both the
    scalar encoder and the device encode post-pass call this, so all
    backends produce byte-identical segments."""
    ms_w = _stuff_fwd_lsb(*ms)
    mel_w = _stuff_fwd_msb(*mel)
    nib, vlc_body = _vlc_backward_bytes(*vlc)

    pad_mid = 0                      # 0x00 bytes between MEL and VLC
    while True:
        scup = len(mel_w) + pad_mid + len(vlc_body) + 2
        if scup > MAX_SCUP:
            raise ValueError("HT cleanup suffix too long")
        b_l2 = (nib << 4) | (scup & 0xF)
        b_l1 = scup >> 4
        # hazard: 0xFF followed by > 0x8F across region boundaries
        if b_l2 == 0xFF and b_l1 > 0x8F:
            pad_mid += 1
            continue
        first_vlc = vlc_body[-1] if vlc_body else b_l2
        if mel_w and pad_mid == 0 and mel_w[-1] == 0xFF \
                and first_vlc > 0x8F:
            pad_mid += 1
            continue
        break
    suffix = bytes(mel_w) + bytes(pad_mid) + bytes(reversed(vlc_body)) + \
        bytes([b_l2, b_l1])
    first_suffix = suffix[0]
    if ms_w and ms_w[-1] == 0xFF and first_suffix > 0x8F:
        ms_w.append(0x00)
    return bytes(ms_w) + suffix


def parse_cleanup(data, L: int):
    """Split a wire cleanup segment: (ms_lo, ms_hi, suf_lo) byte ranges
    within data, or None if the framing is invalid."""
    if L > len(data) or L < 2:
        return None
    scup = (data[L - 1] << 4) | (data[L - 2] & 0xF)
    if scup < 2 or scup > L:
        return None
    return 0, L - scup, L - scup


def derive_p(numpasses: int, numbps: int, ht_planes: int | None) -> int:
    """Per-block cleanup plane.

    Standard framing (ht_planes None/0): p = 1 when HT SigProp/MagRef
    follow (numpasses >= 2), else 0.  With the ht_planes extension the
    global plane P is signalled once (COM marker) and the per-block
    plane is min(P, numbps-1) — the encoder clamp, decoder-computable
    from the tag-tree numbps, so PCRD pass truncation stays decodable."""
    if ht_planes:
        return min(ht_planes, numbps - 1) if numbps > 1 else 0
    return 1 if numpasses >= 2 else 0


# --- wire bit readers --------------------------------------------------------

class _FwdReader:
    """Forward LSB-first reader with 0xFF un-stuffing (MagSgn, SigProp,
    MagRef); reads past `end` return 1-bits (0xFF padding)."""

    __slots__ = ("data", "pos", "end", "_acc", "_n", "_prev_ff")

    def __init__(self, data, start: int, end: int):
        self.data, self.pos, self.end = data, start, end
        self._acc = 0
        self._n = 0
        self._prev_ff = False

    def bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos] if self.pos < self.end else 0xFF
            self.pos += 1
            self._n = 7 if self._prev_ff else 8
            self._prev_ff = b == 0xFF
            self._acc = b
        v = self._acc & 1
        self._acc >>= 1
        self._n -= 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


def _emit_u_pair(vlc: BitSink, mel: MELEncoder, initial: bool,
                 u0: int, off0: bool, u1: int, off1: bool):
    """UVLC emission for one quad pair (u = U - kappa per quad; off =
    u_off).  Both off: interleaved prefixes then suffixes (pfx0 pfx1
    sfx0 sfx1, each suffix carrying its own escape extension).  In the
    INITIAL row pair a MEL event codes (u0 > 2 and u1 > 2); when set,
    u-2 values are coded; when clear, a 3-bit first prefix (u0 >= 3)
    implies u1 <= 2, coded in ONE bit in the second prefix position."""
    if off0 and off1:
        if initial:
            big = u0 > 2 and u1 > 2
            mel.encode(1 if big else 0)
            if big:
                l0, p0, s0, sb0 = uvlc_parts(u0 - 2)
                l1, p1, s1, sb1 = uvlc_parts(u1 - 2)
            else:
                l0, p0, s0, sb0 = uvlc_parts(u0)
                if l0 == 3:              # u0 >= 3 => u1 <= 2: one bit
                    l1, p1, s1, sb1 = 1, u1 - 1, 0, 0
                else:
                    l1, p1, s1, sb1 = uvlc_parts(u1)
        else:
            l0, p0, s0, sb0 = uvlc_parts(u0)
            l1, p1, s1, sb1 = uvlc_parts(u1)
        vlc.bits_lsb(p0, l0)
        vlc.bits_lsb(p1, l1)
        vlc.bits_lsb(sb0, s0)
        vlc.bits_lsb(sb1, s1)
    elif off0:
        ln, code = uvlc_encode(u0)
        vlc.bits_lsb(code, ln)
    elif off1:
        ln, code = uvlc_encode(u1)
        vlc.bits_lsb(code, ln)


class _VLCReader:
    """Backward VLC reader: starts at the high nibble of data[L-2] and
    walks toward lower addresses; LSB-first bits per byte; a 0x7F byte
    whose file successor is > 0x8F carries 7 bits."""

    __slots__ = ("data", "start", "pos", "_acc", "_n", "_prev")

    def __init__(self, data, start: int, L: int):
        self.data, self.start = data, start
        self.pos = L - 3
        b = data[L - 2]
        self._acc = b >> 4
        self._n = 4
        self._prev = b

    def _fill(self, need: int):
        while self._n < need:
            if self.pos >= self.start:
                b = self.data[self.pos]
                self.pos -= 1
                nb = 7 if (self._prev > 0x8F and b == 0x7F) else 8
                self._prev = b
            else:
                b, nb = 0xFF, 8
            self._acc |= (b & ((1 << nb) - 1)) << self._n
            self._n += nb

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


def _read_u_pair(vlc: "_VLCReader", mel: MELDecoder, initial: bool,
                 off0: bool, off1: bool) -> tuple[int, int]:
    """(u0, u1) — the decode mirror of _emit_u_pair."""
    def pfx():
        # (is 3-bit prefix, base, suffix length); UVLC_PXOR flips the
        # i-th transmitted prefix bit (tables.py polarity knob)
        x = _T.UVLC_PXOR
        if vlc.bit() ^ (x & 1) == 0:
            return False, 1, 0
        if vlc.bit() ^ ((x >> 1) & 1) == 0:
            return False, 2, 0
        if vlc.bit() ^ ((x >> 2) & 1) == 0:
            return True, 3, 1
        return True, 5, 5

    def val(cls):
        _l3, base, sl = cls
        v = 0
        for i in range(sl):
            v |= vlc.bit() << i
        if sl == 5 and v == 31:
            e = 0
            for i in range(5):
                e |= vlc.bit() << i
            return 36 + e
        return base + v

    if off0 and off1:
        add = 0
        if initial and mel.next_event() == 1:
            add = 2
            c0 = pfx()
            c1 = pfx()
        elif initial:
            c0 = pfx()
            if c0[0]:                    # u0 >= 3 => u1 <= 2: one bit
                c1 = (False, vlc.bit() + 1, 0)
            else:
                c1 = pfx()
        else:
            c0 = pfx()
            c1 = pfx()
        return val(c0) + add, val(c1) + add
    if off0:
        return val(pfx()), 0
    if off1:
        return 0, val(pfx())
    return 0, 0


def _quad_grid(w: int, h: int):
    return (h + 1) // 2, (w + 1) // 2


def _exp(v: int) -> int:
    return v.bit_length()


# --- encoder -----------------------------------------------------------------

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

    vq = mag >> p
    gh, gw = _quad_grid(w, h)
    sig = vq > 0

    mel = MELEncoder()
    vlc = BitSink()
    ms = BitSink()

    rho_row = np.zeros((gh, gw), dtype=np.int32)
    ebot_row = np.zeros((gh, gw), dtype=np.int32)

    def code_quad(g: int, qx: int) -> tuple[int, bool]:
        """MEL significance event + CxtVLC codeword + MagSgn payload of
        one quad; returns (u, u_off) for the pair's deferred UVLC."""
        rho = 0
        vals = []            # (v_n, E_n) per significant sample
        ebot = 0
        for i, (dy, dx) in enumerate(_QOFF):
            y, x = 2 * g + dy, 2 * qx + dx
            if y < h and x < w and sig[y, x]:
                rho |= 1 << i
                v = ((int(vq[y, x]) - 1) << 1) | int(neg[y, x])
                e = _exp(v)
                vals.append((v, e))
                if i & 1:
                    ebot = max(ebot, e)
        rho_row[g, qx] = rho
        ebot_row[g, qx] = ebot
        rl = rho_row[g, qx - 1] if qx > 0 else 0
        ra = rho_row[g - 1, qx] if g > 0 else 0
        rar = rho_row[g - 1, qx + 1] if (g > 0 and qx + 1 < gw) else 0
        c = quad_ctx(rl, ra, rar)
        enc_c = (_T.VLC_ENC_INIT if g == 0 else _T.VLC_ENC)[c]
        if c == 0:
            mel.encode(1 if rho else 0)
            if rho == 0:
                return 0, False
        kappa = quad_kappa(rho, int(ebot_row[g - 1, qx]) if g else 0)
        if rho == 0:
            if _TRACE_SYMS is not None:
                _TRACE_SYMS.append((c, 0))
            ln, code = enc_c[0]
            vlc.bits_lsb(code, ln)
            return 0, False
        u_act = max(e for _, e in vals)
        U = max(kappa, u_act)
        u = U - kappa
        sym = ((1 if u else 0) << 4) | rho
        # EMB: samples attaining the exponent bound have a known MSB
        # (bit U-1 of v_n is 1); the table entry for (rho, u_off,
        # eps_k) suppresses those bits when it exists, else fall
        # back to the eps_k = 0 base entry (always present)
        ek = 0
        vi = 0
        for i in range(4):
            if (rho >> i) & 1:
                if vals[vi][1] == U:
                    ek |= 1 << i
                vi += 1
        if _TRACE_SYMS is not None:
            _TRACE_SYMS.append((c, (ek << 5) | sym))
        if ek and (ek << 5) | sym in enc_c:
            sym |= ek << 5
        else:
            ek = 0
        ln, code = enc_c[sym]
        vlc.bits_lsb(code, ln)
        vi = 0
        for i in range(4):
            if (rho >> i) & 1:
                v = vals[vi][0]
                vi += 1
                ms.bits_lsb(v, U - ((ek >> i) & 1))
        return u, u > 0

    for g in range(gh):
        for qp in range(0, gw, 2):
            u0, off0 = code_quad(g, qp)
            if qp + 1 < gw:
                u1, off1 = code_quad(g, qp + 1)
            else:
                u1, off1 = 0, False
            if off0 or off1:
                _emit_u_pair(vlc, mel, g == 0, u0, off0, u1, off1)

    mel_b, mel_n = mel.finish()
    vlc_n = vlc.nbits
    vlc_b = vlc.finish()
    ms_n = ms.nbits
    ms_b = ms.finish()
    cleanup = assemble_cleanup((ms_b, ms_n), (mel_b, mel_n),
                               (vlc_b, vlc_n))

    # distortion bookkeeping (Part-1 half-bit reconstruction model)
    m = mag.astype(np.float64)
    rec = np.where(sig, (vq << p).astype(np.float64) + 0.5 * (1 << p), 0.0)
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


def _finish_raw(sink: BitSink) -> bytes:
    """Terminate a SigProp/MagRef segment: stuffed wire bytes with a
    guaranteed non-0xFF final byte (packet-body safety)."""
    n = sink.nbits
    out = _stuff_fwd_lsb(sink.finish(), n)
    if out and out[-1] == 0xFF:
        out.append(0x00)
    return bytes(out)


def _encode_sigprop(mag, neg, sig, bp, w, h):
    """HT SigProp: raw significance + sign of plane `bp` for samples with
    a significant neighbour; causal in stripe scan order."""
    wr = BitSink()
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
    return _finish_raw(wr), new_sig


def _encode_magref(mag, sig, bp, w, h):
    """HT MagRef: raw refinement bit of plane `bp` for samples already
    significant after the cleanup pass."""
    wr = BitSink()
    for x, y in _stripe_scan(w, h):
        if sig[y, x]:
            wr.bit((int(mag[y, x]) >> bp) & 1)
    return _finish_raw(wr)


# --- decoder -----------------------------------------------------------------

def ht_decode_block(data: bytes, seg_lens: list[int], numpasses: int,
                    numbps: int, orient: int, w: int, h: int,
                    style: int = 0, strict: bool = False,
                    ht_planes: int | None = None
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Decode one HT code-block; mirrors t1_scalar.decode_block's contract
    (returns mag2 = 2*value with the half-bit below the last decoded
    plane, and the sign array).  The cleanup plane is derive_p(numpasses,
    numbps, ht_planes) — not in the segment (standard framing)."""
    mag2 = np.zeros((h, w), dtype=np.int64)
    neg = np.zeros((h, w), dtype=bool)
    if numpasses <= 0 or numbps <= 0 or not data:
        return mag2, neg
    if not seg_lens:
        seg_lens = [len(data)]
    L = seg_lens[0]
    if L > len(data):
        # truncated cleanup segment: the suffix (stored at the END of
        # the segment) is gone — nothing recoverable from this block
        if strict:
            raise ValueError("HT cleanup segment truncated")
        return mag2, neg
    hdr = parse_cleanup(data, L)
    if hdr is None:
        if strict:
            raise ValueError("HT cleanup: bad framing")
        return mag2, neg
    ms_lo, ms_hi, suf_lo = hdr
    p = derive_p(numpasses, numbps, ht_planes)

    ms = _FwdReader(data, ms_lo, ms_hi)
    mel = MELDecoder(data, suf_lo, L - 2)
    vlc = _VLCReader(data, suf_lo, L)

    gh, gw = _quad_grid(w, h)
    v = np.zeros((h, w), dtype=np.int64)
    rho_row = np.zeros((gh, gw), dtype=np.int32)
    ebot_row = np.zeros((gh, gw), dtype=np.int32)
    for g in range(gh):
        for qp in range(0, gw, 2):
            qinfo = []                        # (qx, sym) per pair quad
            for qx in (qp, qp + 1):
                if qx >= gw:
                    break
                rl = rho_row[g, qx - 1] if qx > 0 else 0
                ra = rho_row[g - 1, qx] if g > 0 else 0
                rar = rho_row[g - 1, qx + 1] \
                    if (g > 0 and qx + 1 < gw) else 0
                c = quad_ctx(rl, ra, rar)
                if c == 0 and mel.next_event() == 0:
                    qinfo.append((qx, 0))
                    continue
                dec_c = (_T.VLC_DEC_INIT if g == 0 else _T.VLC_DEC)[c]
                sym, ln = dec_c[vlc.peek7()]
                if sym < 0:
                    if strict:
                        raise ValueError("HT cleanup: bad VLC code")
                    return mag2, neg
                vlc.skip(ln)
                rho_row[g, qx] = sym & 0xF
                qinfo.append((qx, sym))
            off0 = bool(qinfo[0][1] & 0x10)
            off1 = len(qinfo) > 1 and bool(qinfo[1][1] & 0x10)
            u0, u1 = _read_u_pair(vlc, mel, g == 0, off0, off1)
            for (qx, sym), u in zip(qinfo, (u0, u1)):
                rho = sym & 0xF
                if rho == 0:
                    continue
                kappa = quad_kappa(rho,
                                   int(ebot_row[g - 1, qx]) if g else 0)
                U = kappa + u
                if U > 40:
                    if strict:
                        raise ValueError("HT cleanup: bad exponent bound")
                    return mag2, neg
                ek = sym >> 5
                ebot = 0
                for i, (dy, dx) in enumerate(_QOFF):
                    if not (rho >> i) & 1:
                        continue
                    k = (ek >> i) & 1
                    full = ms.bits(U - k) | (k << (U - 1))
                    e = _exp(full)
                    if i & 1:
                        ebot = max(ebot, e)
                    y, x = 2 * g + dy, 2 * qx + dx
                    if y < h and x < w:
                        v[y, x] = (full >> 1) + 1
                        neg[y, x] = bool(full & 1)
                ebot_row[g, qx] = ebot

    sig = v > 0
    lp = np.full((h, w), int(p), dtype=np.int64)

    if numpasses >= 2 and len(seg_lens) >= 2 and p > 0:
        bp = p - 1
        s0, s1 = seg_lens[0], seg_lens[0] + seg_lens[1]
        rd = _FwdReader(data, s0, min(s1, len(data)))
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
            rd = _FwdReader(data, s1, min(s2, len(data)))
            for x, y in _stripe_scan(w, h):
                if sig[y, x]:
                    v[y, x] = (v[y, x] << 1) | rd.bit()
                    lp[y, x] = bp

    nz = v > 0
    mag2[nz] = (v[nz] << (lp[nz] + 1)) + np.where(lp[nz] > 0,
                                                  1 << lp[nz], 0)
    return mag2, neg
