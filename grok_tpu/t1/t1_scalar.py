"""EBCOT Tier-1 block coder — scalar reference model (ISO/IEC 15444-1 Annex D).

Per-code-block bitplane coding: significance-propagation, magnitude-
refinement and cleanup passes over 4-row stripes, 19 MQ contexts, run-length
and uniform modes, mode switches (BYPASS / RESET / TERMALL / VSC / SEGSYM),
per-pass rate and distortion logging for PCRD.

This is the behavioral oracle for the batched device coder
(grok_tpu/ops/t1_vec.py) and the native host coder (grok_tpu/native).

Reference parity: [grok: src/lib/core/t1/t1_part1/T1Part1.cpp, t1.cpp] —
behavior normative per ISO 15444-1 Annex D; this is not a translation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from grok_tpu.codestream.bitio import BitReader, BitWriter
from grok_tpu.core.params import (CBLK_BYPASS, CBLK_HT, CBLK_PTERM,
                                  CBLK_RESET, CBLK_SEGSYM, CBLK_TERMALL,
                                  CBLK_VSC)
from grok_tpu.t1.luts import mr_context, sc_context, zc_context
from grok_tpu.t1.mq import CTX_RL, CTX_UNI, MQDecoder, MQEncoder

PASS_SIG, PASS_REF, PASS_CLN = 0, 1, 2


def pass_schedule(numbps: int) -> list[tuple[int, int]]:
    """[(pass_type, bitplane)] — cleanup at the MSB plane, then SPP/MRP/CUP."""
    if numbps <= 0:
        return []
    sched = [(PASS_CLN, numbps - 1)]
    for bp in range(numbps - 2, -1, -1):
        sched += [(PASS_SIG, bp), (PASS_REF, bp), (PASS_CLN, bp)]
    return sched


def is_raw_pass(passno: int, ptype: int, style: int) -> bool:
    return bool(style & CBLK_BYPASS) and passno >= 10 and ptype != PASS_CLN


def segment_pass_counts(numpasses: int, style: int) -> list[int]:
    """How coding passes group into codeword segments (termination pattern).

    Shared by T1 (encode/decode) and T2 (length signalling) — the decoder
    derives the segment count from numpasses + style alone (B.10.7).
    """
    if numpasses <= 0:
        return []
    if style & CBLK_HT:
        # HT passes (Cleanup, SigProp, MagRef) each terminate their own
        # codeword segment (ISO 15444-15 pass structure)
        return [1] * numpasses
    if style & CBLK_TERMALL:
        return [1] * numpasses
    if style & CBLK_BYPASS:
        segs = [min(10, numpasses)]
        rem = numpasses - segs[0]
        while rem:
            k = min(2, rem)           # raw SPP+MRP run
            segs.append(k)
            rem -= k
            if rem:
                segs.append(1)        # MQ cleanup
                rem -= 1
        return segs
    return [numpasses]


@dataclass
class PassInfo:
    rate: int          # cumulative bytes (over all segments) to decode through this pass
    dist: float        # cumulative distortion reduction (quantized-units^2)
    term: bool         # segment terminates after this pass


@dataclass
class EncodedBlock:
    data: bytes = b""
    numbps: int = 0                      # magnitude bitplanes actually coded
    passes: list[PassInfo] = field(default_factory=list)
    seg_lens: list[int] = field(default_factory=list)       # exact terminated lengths
    seg_passes: list[int] = field(default_factory=list)

    @property
    def numpasses(self) -> int:
        return len(self.passes)


class _Flags:
    """Significance/sign state with a 1-sample insignificant border."""

    __slots__ = ("w", "h", "sig", "sgn", "visited", "refined", "vsc")

    def __init__(self, w: int, h: int, vsc: bool):
        self.w, self.h, self.vsc = w, h, vsc
        self.sig = np.zeros((h + 2, w + 2), dtype=np.uint8)
        self.sgn = np.zeros((h + 2, w + 2), dtype=np.int8)
        self.visited = np.zeros((h, w), dtype=bool)
        self.refined = np.zeros((h, w), dtype=bool)

    def _below_masked(self, y: int) -> bool:
        # VSC: the stripe-causal context ignores the row below the stripe
        return self.vsc and (y % 4) == 3

    def counts(self, x: int, y: int) -> tuple[int, int, int]:
        s, i, j = self.sig, y + 1, x + 1
        h = int(s[i, j - 1]) + int(s[i, j + 1])
        if self._below_masked(y):
            v = int(s[i - 1, j])
            d = int(s[i - 1, j - 1]) + int(s[i - 1, j + 1])
        else:
            v = int(s[i - 1, j]) + int(s[i + 1, j])
            d = (int(s[i - 1, j - 1]) + int(s[i - 1, j + 1])
                 + int(s[i + 1, j - 1]) + int(s[i + 1, j + 1]))
        return h, v, d

    def zc(self, orient: int, x: int, y: int) -> int:
        h, v, d = self.counts(x, y)
        return zc_context(orient, h, v, d)

    def sc(self, x: int, y: int) -> tuple[int, int]:
        g, i, j = self.sgn, y + 1, x + 1
        hs = max(-1, min(1, int(g[i, j - 1]) + int(g[i, j + 1])))
        below = 0 if self._below_masked(y) else int(g[i + 1, j])
        vs = max(-1, min(1, int(g[i - 1, j]) + below))
        return sc_context(hs, vs)

    def mr(self, x: int, y: int) -> int:
        h, v, d = self.counts(x, y)
        return mr_context(h + v + d > 0, bool(self.refined[y, x]))

    def set_sig(self, x: int, y: int, negative: bool):
        self.sig[y + 1, x + 1] = 1
        self.sgn[y + 1, x + 1] = -1 if negative else 1


def _stripes(w: int, h: int):
    for y0 in range(0, h, 4):
        ymax = min(y0 + 4, h)
        for x in range(w):
            yield x, y0, ymax


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _EncCtl:
    """Coder multiplexing (MQ <-> raw) + segment/rate bookkeeping."""

    def __init__(self, style: int):
        self.style = style
        self.mq = MQEncoder()
        self.raw: BitWriter | None = None
        self.done = bytearray()
        self.seg_lens: list[int] = []
        self.seg_passes: list[int] = []
        self._passes_in_seg = 0

    def begin_pass(self, passno: int, ptype: int):
        raw = is_raw_pass(passno, ptype, self.style)
        if raw and self.raw is None:
            self.raw = BitWriter()
        if self.style & CBLK_RESET and not raw:
            self.mq.reset_ctx()

    def end_pass(self, passno: int, ptype: int, is_last: bool) -> tuple[int, bool]:
        """Returns (cumulative rate to decode through this pass, terminated)."""
        raw = is_raw_pass(passno, ptype, self.style)
        self._passes_in_seg += 1
        term = is_last or self._must_terminate(passno, ptype)
        if term:
            pterm = bool(self.style & CBLK_PTERM)
            if raw:
                seg = self.raw.flush(pterm=pterm)
                self.raw = None
            else:
                seg = self.mq.erterm_flush() if pterm else self.mq.flush()
                ctx = self.mq.ctx
                self.mq = MQEncoder()
                self.mq.ctx = ctx  # contexts persist across segments unless RESET
            self.done.extend(seg)
            self.seg_lens.append(len(seg))
            self.seg_passes.append(self._passes_in_seg)
            self._passes_in_seg = 0
            return len(self.done), True
        if raw:
            pending = len(self.raw.buf) + (1 if self.raw._nbits else 0)
            return len(self.done) + pending, False
        return len(self.done) + self.mq.numbytes() + 5, False

    def _must_terminate(self, passno: int, ptype: int) -> bool:
        if self.style & CBLK_TERMALL:
            return True
        if self.style & CBLK_BYPASS:
            # terminate at every MQ<->raw switch (from pass 10 on)
            if passno >= 9:
                if ptype == PASS_CLN:
                    return True          # next pass (SPP) is raw
                if ptype == PASS_REF and passno >= 10:
                    return True          # raw run ends before MQ cleanup
        return False

    # bit sinks ------------------------------------------------------------
    def code(self, passno: int, ptype: int, bit: int, cx: int):
        if is_raw_pass(passno, ptype, self.style):
            self.raw.write_bit(bit)
        else:
            self.mq.encode(bit, cx)


def encode_block(mag: np.ndarray, neg: np.ndarray, orient: int,
                 style: int = 0, frac: np.ndarray | None = None) \
        -> EncodedBlock:
    """Encode one code-block.

    mag: (h, w) non-negative int magnitudes (quantized, ROI-shifted).
    neg: (h, w) bool, True for negative coefficients.
    frac: optional (h, w) sub-step residual of the irreversible
    quantizer (core.quant.quantize_frac) — used ONLY by the PCRD
    distortion model, which then measures reductions against the true
    value mag + frac instead of the integer lattice (the codeword
    bytes are unaffected).  None (the reversible path) keeps the exact
    integer model.
    """
    h, w = mag.shape
    mag = np.asarray(mag, dtype=np.int64)
    numbps = int(mag.max()).bit_length() if mag.size else 0
    if numbps == 0:
        return EncodedBlock()
    sched = pass_schedule(numbps)
    fl = _Flags(w, h, bool(style & CBLK_VSC))
    ctl = _EncCtl(style)
    vsc_all = bool(style & CBLK_VSC)

    # distortion model: decoder reconstruction in quantized units
    rec = np.zeros((h, w), dtype=np.float64)
    dist_total = 0.0
    passes: list[PassInfo] = []

    def upd_dist(x, y, bp, became_sig):
        nonlocal dist_total
        m = float(mag[y, x])
        if frac is not None:
            m += float(frac[y, x])
        if became_sig:
            new = 1.5 * (1 << bp)
        else:
            new = float((int(mag[y, x]) >> bp << bp)) + 0.5 * (1 << bp)
        old = rec[y, x]
        dist_total += (m - old) ** 2 - (m - new) ** 2
        rec[y, x] = new

    for passno, (ptype, bp) in enumerate(sched):
        ctl.begin_pass(passno, ptype)
        code = lambda bit, cx: ctl.code(passno, ptype, bit, cx)
        raw = is_raw_pass(passno, ptype, style)

        if ptype == PASS_SIG:
            for x, y0, ymax in _stripes(w, h):
                for y in range(y0, ymax):
                    if fl.sig[y + 1, x + 1] or fl.visited[y, x]:
                        continue
                    zc = fl.zc(orient, x, y)
                    if zc == 0:
                        continue
                    bit = (int(mag[y, x]) >> bp) & 1
                    code(bit, zc)
                    if bit:
                        if raw:
                            code(1 if neg[y, x] else 0, 0)
                        else:
                            cx, xor = fl.sc(x, y)
                            code((1 if neg[y, x] else 0) ^ xor, cx)
                        fl.set_sig(x, y, bool(neg[y, x]))
                        upd_dist(x, y, bp, True)
                    fl.visited[y, x] = True

        elif ptype == PASS_REF:
            for x, y0, ymax in _stripes(w, h):
                for y in range(y0, ymax):
                    if not fl.sig[y + 1, x + 1] or fl.visited[y, x]:
                        continue
                    bit = (int(mag[y, x]) >> bp) & 1
                    if raw:
                        code(bit, 0)
                    else:
                        code(bit, fl.mr(x, y))
                    fl.refined[y, x] = True
                    upd_dist(x, y, bp, False)

        else:  # PASS_CLN
            for x, y0, ymax in _stripes(w, h):
                y = y0
                if (ymax - y0 == 4
                        and not any(fl.sig[y0 + 1 + k, x + 1]
                                    or fl.visited[y0 + k, x] for k in range(4))
                        and all(fl.zc(orient, x, y0 + k) == 0 for k in range(4))):
                    # run-length mode
                    bits = [(int(mag[y0 + k, x]) >> bp) & 1 for k in range(4)]
                    if not any(bits):
                        ctl.mq.encode(0, CTX_RL)
                        continue
                    ctl.mq.encode(1, CTX_RL)
                    r = bits.index(1)
                    ctl.mq.encode((r >> 1) & 1, CTX_UNI)
                    ctl.mq.encode(r & 1, CTX_UNI)
                    yfirst = y0 + r
                    cx, xor = fl.sc(x, yfirst)
                    ctl.mq.encode((1 if neg[yfirst, x] else 0) ^ xor, cx)
                    fl.set_sig(x, yfirst, bool(neg[yfirst, x]))
                    upd_dist(x, yfirst, bp, True)
                    y = yfirst + 1
                for yy in range(y, ymax):
                    if fl.sig[yy + 1, x + 1] or fl.visited[yy, x]:
                        continue
                    zc = fl.zc(orient, x, yy)
                    bit = (int(mag[yy, x]) >> bp) & 1
                    ctl.mq.encode(bit, zc)
                    if bit:
                        cx, xor = fl.sc(x, yy)
                        ctl.mq.encode((1 if neg[yy, x] else 0) ^ xor, cx)
                        fl.set_sig(x, yy, bool(neg[yy, x]))
                        upd_dist(x, yy, bp, True)
            if style & CBLK_SEGSYM:
                for b in (1, 0, 1, 0):
                    ctl.mq.encode(b, CTX_UNI)
            fl.visited[:] = False

        rate, term = ctl.end_pass(passno, ptype, passno == len(sched) - 1)
        passes.append(PassInfo(rate=rate, dist=dist_total, term=term))

    # clamp optimistic (slack-padded) rates to their segment's real end
    total = 0
    pi = 0
    for seg_len, seg_np in zip(ctl.seg_lens, ctl.seg_passes):
        total += seg_len
        for _ in range(seg_np):
            if passes[pi].rate > total:
                passes[pi].rate = total
            pi += 1
    for i in range(1, len(passes)):
        if passes[i].rate < passes[i - 1].rate:
            passes[i].rate = passes[i - 1].rate

    return EncodedBlock(data=bytes(ctl.done), numbps=numbps, passes=passes,
                        seg_lens=ctl.seg_lens, seg_passes=ctl.seg_passes)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_block(data: bytes, seg_lens: list[int], numpasses: int, numbps: int,
                 orient: int, w: int, h: int, style: int = 0,
                 strict: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Decode one code-block.

    data: concatenated codeword segments; seg_lens: their lengths (from T2).
    numbps: magnitude bitplanes (Mb - zero_bitplanes).
    Returns (mag2, neg): mag2 = reconstructed magnitude * 2 with the half-bit
    at the last coded plane (reversible: coef = sign * (mag2 >> 1);
    irreversible: coef = sign * mag2 * delta / 2).
    """
    mag2 = np.zeros((h, w), dtype=np.int64)
    neg = np.zeros((h, w), dtype=bool)
    if numpasses <= 0 or numbps <= 0:
        return mag2, neg

    vknown = np.zeros((h, w), dtype=np.int64)
    lastp = np.full((h, w), -1, dtype=np.int64)
    fl = _Flags(w, h, bool(style & CBLK_VSC))

    sched = pass_schedule(numbps)[:numpasses]
    seg_counts = segment_pass_counts(numpasses, style)
    if seg_lens and len(seg_lens) != len(seg_counts):
        if strict:
            raise ValueError(
                f"segment count mismatch: header {len(seg_lens)} vs derived "
                f"{len(seg_counts)}")
        seg_counts = seg_counts[:len(seg_lens)]
    if not seg_lens:
        seg_lens = [len(data)]
        seg_counts = [numpasses]

    # map pass -> (segment, raw?)
    seg_of_pass = []
    for si, c in enumerate(seg_counts):
        seg_of_pass += [si] * c
    seg_starts = np.concatenate([[0], np.cumsum(seg_lens)]).astype(int)

    mq: MQDecoder | None = None
    rawrd: BitReader | None = None
    mq_ctx = None
    cur_seg = -1

    def open_seg(si: int, raw: bool):
        nonlocal mq, rawrd, mq_ctx
        s, e = int(seg_starts[si]), int(seg_starts[si + 1])
        if raw:
            rawrd = BitReader(data, s, e)
        else:
            mq = MQDecoder(data, s, e)
            if mq_ctx is not None:
                mq.ctx = mq_ctx

    try:
        for passno, (ptype, bp) in enumerate(sched):
            raw = is_raw_pass(passno, ptype, style)
            si = seg_of_pass[passno] if passno < len(seg_of_pass) else None
            if si is None or si >= len(seg_lens):
                break
            if si != cur_seg:
                if mq is not None:
                    mq_ctx = mq.ctx
                open_seg(si, raw)
                cur_seg = si
            if style & CBLK_RESET and not raw:
                mq.reset_ctx()

            if ptype == PASS_SIG:
                rd = (lambda cx: rawrd.read_bit()) if raw else mq.decode
                for x, y0, ymax in _stripes(w, h):
                    for y in range(y0, ymax):
                        if fl.sig[y + 1, x + 1] or fl.visited[y, x]:
                            continue
                        zc = fl.zc(orient, x, y)
                        if zc == 0:
                            continue
                        if rd(zc):
                            if raw:
                                s_bit = rawrd.read_bit()
                            else:
                                cx, xor = fl.sc(x, y)
                                s_bit = mq.decode(cx) ^ xor
                            fl.set_sig(x, y, bool(s_bit))
                            neg[y, x] = bool(s_bit)
                            vknown[y, x] = 1 << bp
                            lastp[y, x] = bp
                        fl.visited[y, x] = True

            elif ptype == PASS_REF:
                for x, y0, ymax in _stripes(w, h):
                    for y in range(y0, ymax):
                        if not fl.sig[y + 1, x + 1] or fl.visited[y, x]:
                            continue
                        if raw:
                            bit = rawrd.read_bit()
                        else:
                            bit = mq.decode(fl.mr(x, y))
                        fl.refined[y, x] = True
                        vknown[y, x] |= bit << bp
                        lastp[y, x] = bp

            else:  # PASS_CLN
                for x, y0, ymax in _stripes(w, h):
                    y = y0
                    if (ymax - y0 == 4
                            and not any(fl.sig[y0 + 1 + k, x + 1]
                                        or fl.visited[y0 + k, x]
                                        for k in range(4))
                            and all(fl.zc(orient, x, y0 + k) == 0
                                    for k in range(4))):
                        if not mq.decode(CTX_RL):
                            continue
                        r = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI)
                        yfirst = y0 + r
                        cx, xor = fl.sc(x, yfirst)
                        s_bit = mq.decode(cx) ^ xor
                        fl.set_sig(x, yfirst, bool(s_bit))
                        neg[yfirst, x] = bool(s_bit)
                        vknown[yfirst, x] = 1 << bp
                        lastp[yfirst, x] = bp
                        y = yfirst + 1
                    for yy in range(y, ymax):
                        if fl.sig[yy + 1, x + 1] or fl.visited[yy, x]:
                            continue
                        zc = fl.zc(orient, x, yy)
                        if mq.decode(zc):
                            cx, xor = fl.sc(x, yy)
                            s_bit = mq.decode(cx) ^ xor
                            fl.set_sig(x, yy, bool(s_bit))
                            neg[yy, x] = bool(s_bit)
                            vknown[yy, x] = 1 << bp
                            lastp[yy, x] = bp
                if style & CBLK_SEGSYM:
                    seg = (mq.decode(CTX_UNI) << 3) | (mq.decode(CTX_UNI) << 2) \
                        | (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI)
                    if strict and seg != 0b1010:
                        raise ValueError("segmentation symbol mismatch")
                fl.visited[:] = False
    except EOFError:
        if strict:
            raise
        # truncated raw segment: keep what decoded so far

    sig_mask = lastp >= 0
    mag2 = np.where(sig_mask, vknown * 2 + (1 << np.maximum(lastp, 0)), 0)
    return mag2, neg
