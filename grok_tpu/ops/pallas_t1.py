"""Pallas TPU kernel: batched Tier-1 (EBCOT/MQ) block decode.

One pallas_call decodes a batch of code-blocks entirely on-core: all
decisions for all lanes run inside a single compiled Mosaic program with
hardware loops — none of the per-op dispatch overhead that caps the XLA
fallback (ops/t1_dec.py).

Design (round-2 rework):

- **Packed flag words** (the same idea that doubled the native host
  decoder): one int32 per coefficient carries the significance of all 8
  neighbours, the signs of the 4 orthogonal ones, and the self
  sig/visited/refined/negative bits.  Context formation is ONE point load
  plus ~12 bit ops — the round-1 kernel's 18 unaligned neighbourhood
  loads per decision are gone.  Updates are full-row column-selects
  (Mosaic cannot read-modify-write at two traced indices).
- **Byte-pair staging** (unchanged from round 1 — the one structure
  Mosaic's layout inference accepts): each lane stages a 64-byte window
  of (byte, next) pairs as loop-carried values, reloaded with two
  one-hot granule sums per column group.  Rolling/word-bank variants
  all hit unimplemented sublane-broadcast relayouts in Mosaic.
- **Class-split context banks**, loop-carried as register values (not
  VMEM scratch — scratch round-trips per decision are ~3x slower): ZC
  (9), SC (5), MR (3), RL (1), UNI (1); each decode's one-hot only
  spans its class and RL/UNI decodes index no bank at all.
- **Sublane batching**: every lane register is (S, 128); with S=8 (block
  dims <= 32) one launch decodes 1024 blocks and each VPU op carries
  8x128 lanes.  S=1 keeps 3D arrays for 64x64 blocks (VMEM bound).

Round 2: ALL Part-1 mode switches decode in-kernel — BYPASS raw
segments (maskable MSB-first unstuffing reader sharing the staged
window), TERMALL/BYPASS multi-segment codewords (per-pass segmentation
table, masked INITDEC re-init, per-segment end-of-data clamping),
RESET (masked context-bank re-init per pass), VSC (flag-word masking of
the below-stripe bits at stripe row 3), and SEGSYM (four discarded UNI
decisions per cleanup).  Bit-exact vs the scalar coder across styles
0x00..0x3F on TPU hardware (tests/test_pallas_t1.py).

Reference parity: the batched device path replaces the per-block
thread-pool T1 of the reference [grok: src/lib/core/t1/t1_part1/,
plugin batch API]; MQ decode per ISO 15444-1 Annex C, passes per D.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from grok_tpu.t1.mq import MQ_NLPS, MQ_NMPS, MQ_QE, MQ_SWITCH

LANES = 128


def t1_pallas_enabled() -> bool:
    """Pallas is the DEFAULT Part-1 device kernel on TPU backends since
    round 3 (13.2 MP/s/core at 64x64 > the host C coder's 12.5; the XLA
    kernel is dispatch-bound on the axon runtime).  GROK_T1_PALLAS=0
    forces the XLA kernel; any other value forces Pallas on."""
    import os

    env = os.environ.get("GROK_T1_PALLAS")
    if env is not None:
        return env not in ("0", "")
    try:
        import jax as _jax
        return _jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


# flag word bits (coefficient-relative neighbourhood state)
F_NW, F_N, F_NE = 1 << 0, 1 << 1, 1 << 2
F_W, F_E = 1 << 3, 1 << 4
F_SW, F_S, F_SE = 1 << 5, 1 << 6, 1 << 7
F_SGN_N, F_SGN_E, F_SGN_S, F_SGN_W = 1 << 8, 1 << 9, 1 << 10, 1 << 11
F_SIG, F_VIS, F_MU, F_NEG = 1 << 12, 1 << 13, 1 << 14, 1 << 15
F_ANYSIG = 0xFF          # any neighbour significant

# packed MQ table row: (qe << 13) | (nmps << 7) | (nlps << 1) | switch
_MQ_PACKED = np.asarray(
    (MQ_QE.astype(np.int64) << 13) | (MQ_NMPS.astype(np.int64) << 7)
    | (MQ_NLPS.astype(np.int64) << 1) | MQ_SWITCH.astype(np.int64),
    dtype=np.int32)

# bank order inside the carried tuple: (st, mps) pairs
ZC, SC, MR, RL, UNI = 0, 2, 4, 6, 8


def _zc_ctx_arith(orient, h, v, d):
    """Zero-coding context (Table D.1) as vector arithmetic.

    orient/h/v/d: int32 arrays; LL/LH use (h,v) as-is, HL swaps, HH is
    diagonal-driven.  Mirrors t1/luts.zc_context exactly.
    """
    swap = orient == 1
    hh = jnp.where(swap, v, h)
    vv = jnp.where(swap, h, v)
    nh = jnp.where(
        hh == 2, 8,
        jnp.where(hh == 1,
                  jnp.where(vv >= 1, 7, jnp.where(d >= 1, 6, 5)),
                  jnp.where(vv == 2, 4,
                            jnp.where(vv == 1, 3,
                                      jnp.where(d >= 2, 2,
                                                jnp.where(d == 1, 1, 0))))))
    hv = h + v
    hhb = jnp.where(
        d >= 3, 8,
        jnp.where(d == 2, jnp.where(hv >= 1, 7, 6),
                  jnp.where(d == 1,
                            jnp.where(hv >= 2, 5,
                                      jnp.where(hv == 1, 4, 3)),
                            jnp.where(hv >= 2, 2,
                                      jnp.where(hv == 1, 1, 0)))))
    return jnp.where(orient == 3, hhb, nh)


def _sc_ctx_arith(hs, vs):
    """Sign-coding (absolute context 9..13, xor) from clamped sums
    (Table D.2) — used by the encoder kernel (pallas_t1_enc)."""
    ctx = jnp.where(hs == 0,
                    jnp.where(vs == 0, 9, 10),
                    jnp.where(vs * hs == 1, 13,
                              jnp.where(vs == 0, 12, 11)))
    xor = jnp.where(hs == -1, 1, jnp.where((hs == 0) & (vs == -1), 1, 0))
    return ctx, xor


def _sc_from_flags(f):
    """Sign-coding (local context 0..4, xor) from a flag word."""
    hc = ((f >> 4) & 1) * (1 - 2 * ((f >> 9) & 1)) + \
        ((f >> 3) & 1) * (1 - 2 * ((f >> 11) & 1))
    vc = ((f >> 1) & 1) * (1 - 2 * ((f >> 8) & 1)) + \
        ((f >> 6) & 1) * (1 - 2 * ((f >> 10) & 1))
    hs = jnp.clip(hc, -1, 1)
    vs = jnp.clip(vc, -1, 1)
    ctx = jnp.where(hs == 0,
                    jnp.where(vs == 0, 0, 1),
                    jnp.where(vs * hs == 1, 4,
                              jnp.where(vs == 0, 3, 2)))
    xor = jnp.where(hs == -1, 1,
                    jnp.where((hs == 0) & (vs == -1), 1, 0))
    return ctx, xor


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def pallas_t1_decode(data, numpasses, numbps, orient, wh, ptbl, stylev,
                     W: int, H: int, maxbp: int, S: int,
                     interpret: bool = False):
    """Decode a batch of S*128 code-blocks with one Pallas kernel.

    data: (G, 32, [S,] LANES) int32 quad-packed (b0|b1<<8|b2<<16|b3<<24)
    codewords in 32-byte granules, 0xFF-padded per lane beyond each
    length, with >=2 spare granules.
    numpasses/numbps/orient: (1|S, LANES) int32; wh: (2, [S,] LANES).
    ptbl: (3, P8, [S,] LANES) int32 per-pass segmentation table —
    [0] byte offset where pass p opens a new codeword segment (-1 =
    continue), [1] that segment's end offset, [2] pass p is raw
    (BYPASS).  stylev: (1|S, LANES) bit0 VSC, bit1 RESET, bit2 SEGSYM.
    All 0x3F mode switches are decoded in-kernel (round-2 capability
    work; round 1 handled the default style only).
    Returns signed mag2 (H, W, [S,] LANES) int32 (negative = sign bit).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = data.shape[0]
    P8 = ptbl.shape[1]
    n_stripes = (H + 3) // 4
    # mid-hierarchy sizing: worst-case MQ consumption is ~26 B/column
    # (11 decisions x 2 bytein); K columns between full reloads needs
    # 31 B skew + 26K + 64 B window <= 32*MIDG
    MIDG = 16
    NC = n_stripes * W
    K = 16
    while NC % K:
        K //= 2
    arr_tail = (S, LANES) if S > 1 else (LANES,)
    nd = len(arr_tail)
    lane_sh = (S, LANES) if S > 1 else (1, LANES)
    kd = S == 1                        # keepdims for axis-0 reductions
    mq_tbl = jnp.asarray(_MQ_PACKED).reshape((47,) + (1,) * nd)
    VSC_MASK = ~(F_SW | F_S | F_SE)

    def iota_for(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * nd, 0)

    def kernel(data_ref, npass_ref, nbps_ref, ori_ref, wh_ref, ptbl_ref,
               style_ref, mqtbl_ref, out_ref, flags_ref, mid_ref,
               mba_ref):
        if S == 1:
            ori = ori_ref[...]                 # (1, L)
            npass = npass_ref[...]
            nbps = nbps_ref[...]
            wv = wh_ref[0:1]
            hv = wh_ref[1:2]
            sty = style_ref[...]
        else:
            ori = ori_ref[...]                 # (S, L)
            npass = npass_ref[...]
            nbps = nbps_ref[...]
            wv = wh_ref[0]
            hv = wh_ref[1]
            sty = style_ref[...]
        vsc_l = (sty & 1) != 0
        reset_l = (sty & 2) != 0
        segsym_l = (sty & 4) != 0

        flags_ref[...] = jnp.zeros((H + 2, W + 2) + arr_tail, jnp.int32)
        out_ref[...] = jnp.zeros((H, W) + arr_tail, jnp.int32)

        giota = jax.lax.broadcasted_iota(
            jnp.int32, (G,) + (1,) * (nd + 1), 0)
        miota = jax.lax.broadcasted_iota(
            jnp.int32, (MIDG,) + (1,) * (nd + 1), 0)
        siota = iota_for(64)
        tiota = iota_for(47)
        piota = iota_for(P8)

        mid_ref[...] = jnp.zeros((MIDG, 32) + arr_tail, jnp.int32)
        mba_ref[...] = jnp.zeros(lane_sh, jnp.int32)

        def mid_refresh(bp):
            """Reload the MIDG-granule mid scratch from the full
            (G, 32) stream buffer around bp — the round-3 hierarchy
            (borrowed from the HT kernels): the O(G) full-buffer scan
            runs once per K-column group / pass start instead of per
            column, which at G=128 (dense 64x64 streams) was the
            kernel's dominant cost.  Byte-pair entries ride two
            granules per one-hot pass."""
            mg = bp >> 5
            d = data_ref[...]
            parts = []
            for jj in range(MIDG):
                sel = (giota == (mg + jj)[None]).astype(jnp.int32)
                parts.append(jnp.sum(d * sel, axis=0))
            mid_ref[...] = jnp.stack(parts, axis=0)
            mba_ref[...] = mg << 5

        def stage_load(bp):
            """(64, [S,] L) staged byte-pair window at each lane's
            32-aligned base, reloaded from the mid scratch (O(MIDG)).
            Valid while bp stays inside mid's coverage — guaranteed by
            the K-column group bound (<= 26 B/column worst case)."""
            rel = (bp >> 5) - (mba_ref[...] >> 5)
            d = mid_ref[...]
            lo = jnp.sum(d * (miota == rel[None]).astype(jnp.int32),
                         axis=0)
            hi = jnp.sum(d * (miota == (rel + 1)[None]).astype(jnp.int32),
                         axis=0)
            return jnp.concatenate([lo, hi], axis=0), ((bp >> 5) << 5)

        def stage_read(stage, base, bp):
            """Quad word (bytes bp..bp+3, LE) from the staged window."""
            sel = (siota == (bp - base)).astype(jnp.int32)
            return jnp.sum(stage * sel, axis=0, keepdims=kd)

        # MQ register tuple: (a, c, ct, bp, stage, base, send)
        # send = current segment's end byte offset: reads past it see
        # 0xFF (C.3.4 end-of-data semantics) so concatenated segments
        # never bleed into each other.
        def seg_bytes_w(w, off, bp, send):
            """(cur, nxt) at byte offset `off` of the quad word `w`
            anchored at bp - off, with C.3.4 end-of-data clamping."""
            sh = off << 3
            cur = (w >> sh) & 0xFF
            nxt = (w >> (sh + 8)) & 0xFF
            cur = jnp.where(bp >= send, 0xFF, cur)
            nxt = jnp.where(bp + 1 >= send, 0xFF, nxt)
            return cur, nxt

        def bytein_w(mq, m, w, bp0):
            """One BYTEIN with the bytes taken from the pre-read quad
            word w (anchored at bp0; bp - bp0 <= 2 across a renorm's
            three chained byteins, so one window read serves all)."""
            a, c, ct, bp, stage, base, send = mq
            cur, nxt = seg_bytes_w(w, bp - bp0, bp, send)
            is_ff = cur == 0xFF
            stop = is_ff & (nxt > 0x8F)
            c_new = jnp.where(stop, c + 0xFF00,
                              jnp.where(is_ff, c + (nxt << 9),
                                        c + (nxt << 8)))
            ct_new = jnp.where(is_ff & ~stop, 7, 8)
            bp_new = jnp.where(stop, bp, bp + 1)
            return (a, jnp.where(m, c_new, c), jnp.where(m, ct_new, ct),
                    jnp.where(m, bp_new, bp), stage, base, send)

        def nbits_to_msb(a):
            n = jnp.zeros_like(a)
            v = a
            n = n + jnp.where(v < 0x100, 8, 0)
            v = jnp.where(v < 0x100, v << 8, v)
            n = n + jnp.where(v < 0x1000, 4, 0)
            v = jnp.where(v < 0x1000, v << 4, v)
            n = n + jnp.where(v < 0x4000, 2, 0)
            v = jnp.where(v < 0x4000, v << 2, v)
            n = n + jnp.where(v < 0x8000, 1, 0)
            return n

        def renorm(mq, need):
            a, c, ct, bp, stage, base, send = mq
            n = jnp.where(need, nbits_to_msb(a), 0)
            w = stage_read(stage, base, bp)
            bp0 = bp
            for _ in range(3):
                m = n > 0
                feed = m & (ct == 0)
                a, c, ct, bp, stage, base, send = bytein_w(
                    (a, c, ct, bp, stage, base, send), feed, w, bp0)
                s = jnp.minimum(n, jnp.where(ct > 0, ct, 0))
                a = jnp.where(m, (a << s) & 0xFFFF, a)
                c = jnp.where(m, c << s, c)
                ct = jnp.where(m, ct - s, ct)
                n = n - s
            return (a, c, ct, bp, stage, base, send)

        def mq_core(mq, i, mps, act):
            """One MQ decision given gathered state (i, mps).

            Returns (mq', bit, new_i, new_mps, upd); the caller scatters
            the state update back to its bank where upd == 1."""
            a, c, ct, bp, stage, base, send = mq
            packed = jnp.sum(jnp.where(tiota == i, mqtbl_ref[...], 0),
                             axis=0, keepdims=kd)
            qe = (packed >> 13) & 0xFFFF
            nmps = (packed >> 7) & 0x3F
            nlps = (packed >> 1) & 0x3F
            sw = packed & 1

            a1 = (a - qe) & 0xFFFF
            chigh = (c >> 16) & 0xFFFF
            lps = (chigh < qe).astype(jnp.int32)
            small = (a1 < qe).astype(jnp.int32)
            msb = ((a1 & 0x8000) != 0).astype(jnp.int32)
            act = act.astype(jnp.int32)

            renorm_needed = lps | (1 - msb)
            is_mps = jnp.where(lps == 1, small, msb | (1 - small))
            bit = jnp.where(is_mps == 1, mps, 1 - mps)
            use_nmps = jnp.where(lps == 1, small, 1 - small)
            new_i = jnp.where(use_nmps == 1, nmps, nlps)
            flip = (1 - use_nmps) * sw
            new_mps = jnp.where(flip == 1, 1 - mps, mps)

            upd = act * renorm_needed
            a = jnp.where(act * lps == 1, qe,
                          jnp.where(act == 1, a1, a))
            c = jnp.where(act * (1 - lps) == 1, c - (qe << 16), c)
            mq = renorm((a, c, ct, bp, stage, base, send), upd == 1)
            return mq, jnp.where(act == 1, bit, 0), new_i, new_mps, upd

        def bank_dec(st, bi, n, cxl, act):
            """Decode with carried bank (bi) state selected by cxl."""
            mq, banks, ex = st
            stv, mpsv = banks[bi], banks[bi + 1]
            sel = iota_for(n) == cxl
            i = jnp.sum(jnp.where(sel, stv, 0), axis=0, keepdims=kd)
            mps = jnp.sum(jnp.where(sel, mpsv, 0), axis=0, keepdims=kd)
            mq, bit, new_i, new_mps, upd = mq_core(mq, i, mps, act)
            updr = sel & (upd == 1)
            stv = jnp.where(updr, new_i, stv)
            mpsv = jnp.where(updr, new_mps, mpsv)
            banks = banks[:bi] + (stv, mpsv) + banks[bi + 2:]
            return (mq, banks, ex), bit

        def reg_dec(st, bi, act):
            """Decode with a single-context carried bank (RL / UNI)."""
            mq, banks, ex = st
            i, mps = banks[bi], banks[bi + 1]      # lane_sh
            mq, bit, new_i, new_mps, upd = mq_core(mq, i, mps, act)
            i = jnp.where(upd == 1, new_i, i)
            mps = jnp.where(upd == 1, new_mps, mps)
            banks = banks[:bi] + (i, mps) + banks[bi + 2:]
            return (mq, banks, ex), bit

        def raw_bit(st, m):
            """One raw (BYPASS) bit, MSB-first with 0xFF unstuffing,
            consuming only where m.  Raw segments reuse the MQ tuple's
            byte position/stage; (rct, rbyte, rprev) live in ex."""
            (a, c, ct, bp, stage, base, send), banks, ex = st
            rct, rbyte, rprev = ex
            need = m & (rct == 0)
            cur = stage_read(stage, base, bp) & 0xFF
            cur = jnp.where(bp >= send, 0, cur)
            nb = jnp.where(rprev == 0xFF, 7, 8)
            rbyte = jnp.where(need, cur, rbyte)
            rct = jnp.where(need, nb, rct)
            rprev = jnp.where(need, cur, rprev)
            bp = jnp.where(need, bp + 1, bp)
            rct = rct - m.astype(jnp.int32)
            bit = (rbyte >> jnp.maximum(rct, 0)) & 1
            bit = jnp.where(m, bit, 0)
            return ((a, c, ct, bp, stage, base, send), banks,
                    (rct, rbyte, rprev)), bit

        def pass_start(st, pno, act_pass):
            """Open pass `pno` (per-lane pass index): look up the
            segmentation table, re-init the MQ or raw coder at new
            segment starts, apply RESET.  Returns (st, raw_l)."""
            (a, c, ct, bp, stage, base, send), banks, ex = st
            rct, rbyte, rprev = ex
            idx = jnp.clip(pno, 0, P8 - 1)
            mask = act_pass & (pno >= 0)
            sel = piota == idx
            tbl = ptbl_ref[...]
            ns = jnp.sum(jnp.where(sel, tbl[0], 0), axis=0, keepdims=kd)
            se = jnp.sum(jnp.where(sel, tbl[1], 0), axis=0, keepdims=kd)
            rawf = jnp.sum(jnp.where(sel, tbl[2], 0), axis=0, keepdims=kd)
            raw_l = mask & (rawf == 1)
            m_new = mask & (ns >= 0)
            send = jnp.where(m_new, se, send)
            bp = jnp.where(m_new, ns, bp)
            # raw open: fresh bit state
            m_raw = m_new & (rawf == 1)
            rct = jnp.where(m_raw, 0, rct)
            rprev = jnp.where(m_raw, 0, rprev)
            # MQ open (C.3.5 INITDEC), masked
            m_mq = m_new & (rawf == 0)
            mid_refresh(bp)
            stage, base = stage_load(bp)
            w0 = stage_read(stage, base, bp)
            cur, _ = seg_bytes_w(w0, jnp.zeros_like(bp), bp, send)
            a = jnp.where(m_mq, 0x8000, a)
            c = jnp.where(m_mq, cur << 16, c)
            ct = jnp.where(m_mq, 0, ct)
            # bytein reads b[bp] for the 0xFF check and feeds b[bp+1]:
            # bp stays on the segment's first byte here
            mq = bytein_w((a, c, ct, bp, stage, base, send), m_mq, w0, bp)
            a, c, ct, bp, stage, base, send = mq
            c = jnp.where(m_mq, c << 7, c)
            ct = jnp.where(m_mq, ct - 7, ct)
            # RESET: context banks to initial states at every non-raw
            # pass start for RESET lanes
            m_rst = act_pass & (pno >= 0) & reset_l & (rawf == 0)
            nb_ = []
            for i_b, init_b in enumerate(banks_init):
                nb_.append(jnp.where(m_rst, init_b, banks[i_b]))
            return ((a, c, ct, bp, stage, base, send), tuple(nb_),
                    (rct, rbyte, rprev)), raw_l

        def refresh(st):
            (a, c, ct, bp, stage, base, send), banks, ex = st
            stage, base = stage_load(bp)
            return ((a, c, ct, bp, stage, base, send), banks, ex)

        def mid_at(st):
            """Re-center the mid scratch on the current byte position
            (group-level; the per-column refresh reads mid only)."""
            (a, c, ct, bp, stage, base, send), banks, ex = st
            mid_refresh(bp)
            return st

        # -- flag helpers --------------------------------------------------
        wiota = iota_for(W)
        wiota2 = iota_for(W + 2)

        def fread(y, x):
            """Flag word of coefficient (y, x), shaped lane_sh."""
            v = flags_ref[y + 1, pl.ds(x + 1, 1)]
            if S == 1:
                return v                 # (1, L)
            return jnp.sum(v, axis=0)    # (1, S, L) -> (S, L)

        def vread(y, x):
            v = out_ref[y, pl.ds(x, 1)]
            if S == 1:
                return v
            return jnp.sum(v, axis=0)

        def row_patterns(x, m, pats):
            """OR-pattern row: columns x+k get value pats[k] where m.

            Conditions are built full-shape ((W+2, [S,] L)) via compare &
            mask — the only sublane-broadcast form Mosaic lowers."""
            out = None
            for k, p in pats:
                v = jnp.where((wiota2 == x + k) & m, p, 0)
                out = v if out is None else out | v
            return out

        def val_set(y, x, vals, m):
            row = out_ref[y]
            sel = (wiota == x) & m
            out_ref[y] = jnp.where(sel, vals, row)

        def mark_sig(y, x, negb, m, vis_m=None):
            """Set (y, x) significant with sign negb where m (bool).

            vis_m: mask of lanes whose centre sample also gets VIS in the
            same row op (used by SPP for every coded sample)."""
            top = row_patterns(x, m, [
                (0, F_SE), (1, F_S | (negb << 10)), (2, F_SW)])
            flags_ref[y] = flags_ref[y] | top
            ctr = row_patterns(x, m, [
                (0, F_E | (negb << 9)),
                (1, F_SIG | (negb << 15)),
                (2, F_W | (negb << 11))])
            if vis_m is not None:
                ctr = ctr | row_patterns(x, vis_m, [(1, F_VIS)])
            flags_ref[y + 1] = flags_ref[y + 1] | ctr
            bot = row_patterns(x, m, [
                (0, F_NE), (1, F_N | (negb << 8)), (2, F_NW)])
            flags_ref[y + 2] = flags_ref[y + 2] | bot

        # -- initial state: segment 0 opens via pass_start at passno 0 ---
        bp0 = jnp.zeros(lane_sh, jnp.int32)
        stage0, base0 = stage_load(bp0)
        zi_l = jnp.zeros(lane_sh, jnp.int32)
        mq0 = (jnp.full(lane_sh, 0x8000, jnp.int32), zi_l, zi_l,
               bp0, stage0, base0, jnp.full(lane_sh, 1, jnp.int32))
        ex0 = (zi_l, zi_l, zi_l)                # raw (rct, rbyte, rprev)

        # context banks: ZC ctx0 starts at state 4, RL at 3, UNI at 46
        zi9 = jnp.zeros((9,) + arr_tail, jnp.int32)
        full9 = jax.lax.broadcasted_iota(jnp.int32, (9,) + arr_tail, 0)
        banks_init = (
            jnp.where(full9 == 0, 4, zi9),                      # zc st
            zi9,                                                # zc mps
            jnp.zeros((5,) + arr_tail, jnp.int32),              # sc st
            jnp.zeros((5,) + arr_tail, jnp.int32),              # sc mps
            jnp.zeros((3,) + arr_tail, jnp.int32),              # mr st
            jnp.zeros((3,) + arr_tail, jnp.int32),              # mr mps
            jnp.full(lane_sh, 3, jnp.int32),                    # rl st
            jnp.zeros(lane_sh, jnp.int32),                      # rl mps
            jnp.full(lane_sh, 46, jnp.int32),                   # uni st
            jnp.zeros(lane_sh, jnp.int32),                      # uni mps
        )
        st0 = (mq0, banks_init, ex0)

        # -- pass bodies ---------------------------------------------------
        def spp_step(col, dy, bp, st, raw_l):
            x = col % W
            yr = (col // W) * 4 + dy
            k_lane = nbps - 1 - bp
            act = (k_lane >= 1) & (3 * k_lane - 2 < npass) & \
                (x < wv) & (yr < hv)
            y = jnp.minimum(yr, H - 1)
            f = fread(y, x)
            if dy == 3:
                # VSC: stripe-causal context ignores the row below
                f = jnp.where(vsc_l, f & VSC_MASK, f)
            coded = act & ((f & (F_SIG | F_VIS)) == 0) & \
                ((f & F_ANYSIG) != 0)
            h = ((f >> 3) & 1) + ((f >> 4) & 1)
            v = ((f >> 1) & 1) + ((f >> 6) & 1)
            d = ((f >> 0) & 1) + ((f >> 2) & 1) + ((f >> 5) & 1) + \
                ((f >> 7) & 1)
            zc = _zc_ctx_arith(ori, h, v, d)
            st, bit = bank_dec(st, ZC, 9, zc, coded & ~raw_l)
            st, rbit = raw_bit(st, coded & raw_l)
            bit = jnp.where(raw_l, rbit, bit)
            became = coded & (bit == 1)
            sc, xr = _sc_from_flags(f)
            st, sbit = bank_dec(st, SC, 5, sc, became & ~raw_l)
            st, rsgn = raw_bit(st, became & raw_l)
            negb = jnp.where(raw_l, rsgn, sbit ^ xr)
            # VIS for every coded sample rides the centre-row op
            mark_sig(y, x, negb, became, vis_m=coded)
            val_set(y, x,
                    jnp.full(lane_sh, jnp.int32(3) << bp, jnp.int32),
                    became)
            return st

        def mrp_step(col, dy, bp, st, raw_l):
            x = col % W
            yr = (col // W) * 4 + dy
            k_lane = nbps - 1 - bp
            act = (k_lane >= 1) & (3 * k_lane - 1 < npass) & \
                (x < wv) & (yr < hv)
            y = jnp.minimum(yr, H - 1)
            f = fread(y, x)
            if dy == 3:
                f = jnp.where(vsc_l, f & VSC_MASK, f)
            coded = act & ((f & F_SIG) != 0) & ((f & F_VIS) == 0)
            was_ref = (f & F_MU) != 0
            anysig = (f & F_ANYSIG) != 0
            mr = jnp.where(was_ref, 2, jnp.where(anysig, 1, 0))
            st, bit = bank_dec(st, MR, 3, mr, coded & ~raw_l)
            st, rbit = raw_bit(st, coded & raw_l)
            bit = jnp.where(raw_l, rbit, bit)
            v2 = vread(y, x)
            nv = v2 + (bit << (bp + 1)) - (jnp.int32(1) << (bp + 1)) \
                + (jnp.int32(1) << bp)
            val_set(y, x, nv, coded)
            flags_ref[y + 1] = flags_ref[y + 1] | \
                row_patterns(x, coded, [(1, F_MU)])
            return st

        def cln_step(col, j, bp, carry):
            st, rl_mode, has, r, became = carry
            x = col % W
            y0 = (col // W) * 4
            dy = min(max((j - 3) // 2, 0), 3)
            y = jnp.minimum(y0 + dy, H - 1)
            k_lane = nbps - 1 - bp
            act = (k_lane >= 0) & (3 * k_lane < npass)
            is_rl = j == 0
            is_uni = (j == 1) | (j == 2)
            is_zc = (j >= 3) & ((j - 3) % 2 == 0)

            if is_rl:
                # full stripe-column RL eligibility: no sig neighbours,
                # none significant or visited, full 4-row stripe in-block
                ys = jnp.maximum(jnp.minimum(y0, H - 4), 0)
                m0 = fread(jnp.minimum(ys, H - 1), x)
                m1 = fread(jnp.minimum(ys + 1, H - 1), x)
                m2 = fread(jnp.minimum(ys + 2, H - 1), x)
                m3 = fread(jnp.minimum(ys + 3, H - 1), x)
                m3 = jnp.where(vsc_l, m3 & VSC_MASK, m3)
                any_state = (m0 | m1 | m2 | m3) & \
                    (F_ANYSIG | F_SIG | F_VIS)
                full = (y0 + 4 <= hv) & (x < wv)
                rl_now = act & full & (any_state == 0)
                st, bit = reg_dec(st, RL, rl_now)
                rl_i = rl_now.astype(jnp.int32)
                return (st, rl_i, rl_i * bit, r, became)

            if is_uni:
                st, bit = reg_dec(st, UNI, has == 1)
                r = jnp.where(j == 1, bit << 1, r | bit)
                return (st, rl_mode, has, r, became)

            f = fread(y, x)
            if dy == 3:
                f = jnp.where(vsc_l, f & VSC_MASK, f)
            if is_zc:
                cur_sig = (f & F_SIG) != 0
                visv = (f & F_VIS) != 0
                ok = act & (x < wv) & (y0 + dy < hv)
                in_rl_skip = (rl_mode == 1) & \
                    ((has == 0) | ((has == 1) & (r >= dy)))
                h = ((f >> 3) & 1) + ((f >> 4) & 1)
                v = ((f >> 1) & 1) + ((f >> 6) & 1)
                d = ((f >> 0) & 1) + ((f >> 2) & 1) + ((f >> 5) & 1) + \
                    ((f >> 7) & 1)
                zc = _zc_ctx_arith(ori, h, v, d)
                normal = ok & ~cur_sig & ~visv & ~in_rl_skip
                st, bit = bank_dec(st, ZC, 9, zc, normal)
                became = normal.astype(jnp.int32) * bit
                return (st, rl_mode, has, r, became)

            # sign-coding slot
            first = (has == 1) & (r == dy)
            code_sc = (became == 1) | first
            sc, xr = _sc_from_flags(f)
            st, bit = bank_dec(st, SC, 5, sc, code_sc)
            mark_sig(y, x, bit ^ xr, code_sc)
            val_set(y, x,
                    jnp.full(lane_sh, jnp.int32(3) << bp, jnp.int32),
                    code_sc)
            zi = jnp.zeros(lane_sh, jnp.int32)
            return (st, rl_mode, has, r, zi)

        def plane_body(bp, st):
            k_lane = nbps - 1 - bp
            act_spp = (k_lane >= 1) & (3 * k_lane - 2 < npass)
            st, raw_spp = pass_start(st, 3 * k_lane - 2, act_spp)

            def spp_col(col, st):
                st = refresh(st)
                for dy in range(4):
                    st = spp_step(col, dy, bp, st, raw_spp)
                return st

            def spp_group(o, st):
                st = mid_at(st)
                return jax.lax.fori_loop(o * K, o * K + K, spp_col, st)
            st = jax.lax.fori_loop(0, NC // K, spp_group, st)

            act_mrp = (k_lane >= 1) & (3 * k_lane - 1 < npass)
            st, raw_mrp = pass_start(st, 3 * k_lane - 1, act_mrp)

            def mrp_col(col, st):
                st = refresh(st)
                for dy in range(4):
                    st = mrp_step(col, dy, bp, st, raw_mrp)
                return st

            def mrp_group(o, st):
                st = mid_at(st)
                return jax.lax.fori_loop(o * K, o * K + K, mrp_col, st)
            st = jax.lax.fori_loop(0, NC // K, mrp_group, st)

            act_cln = (k_lane >= 0) & (3 * k_lane < npass)
            st, _raw_cln = pass_start(st, 3 * k_lane, act_cln)

            zi = jnp.zeros(lane_sh, jnp.int32)

            def cln_col(col, carry):
                st, rl_mode, has, r, became = carry
                carry = (refresh(st), rl_mode, has, r, became)
                for j in range(6):
                    carry = cln_step(col, j, bp, carry)
                st, rl_mode, has, r, became = carry
                carry = (refresh(st), rl_mode, has, r, became)
                for j in range(6, 11):
                    carry = cln_step(col, j, bp, carry)
                return carry
            def cln_group(o, carry):
                st_g = mid_at(carry[0])
                return jax.lax.fori_loop(
                    o * K, o * K + K, cln_col,
                    (st_g,) + tuple(carry[1:]))
            carry = jax.lax.fori_loop(0, NC // K, cln_group,
                                      (st, zi, zi, zi, zi))
            st = carry[0]
            # SEGSYM: four discarded UNI decisions close each cleanup
            m_ss = segsym_l & act_cln
            st = mid_at(st)
            st = refresh(st)
            for _ in range(4):
                st, _bit = reg_dec(st, UNI, m_ss)
            # clear VIS everywhere (end of plane)
            flags_ref[...] = flags_ref[...] & ~F_VIS
            return st

        st = st0
        for bp_static in range(maxbp - 1, -1, -1):
            st = plane_body(bp_static, st)

        # apply signs: out = mag2 * (1 - 2*neg)
        core = flags_ref[1:H + 1, 1:W + 1]
        neg = (core & F_NEG) != 0
        out_ref[...] = jnp.where(neg, -out_ref[...], out_ref[...])

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W) + arr_tail, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2) + arr_tail, jnp.int32),   # flags
            pltpu.VMEM((MIDG, 32) + arr_tail, jnp.int32),       # byte mid
            pltpu.VMEM(lane_sh, jnp.int32),                     # mid base
        ],
        interpret=interpret,
    )(data, numpasses, numbps, orient, wh, ptbl, stylev, mq_tbl)
    return out


def sublanes_for(W: int, H: int) -> int:
    """Sublane batch S for a (W, H) bucket, bounded by VMEM.

    Budget per lane: flags (H+2)(W+2) + out H*W int32 words; with
    S*128 lanes the total must stay well under the ~16 MB core VMEM."""
    words = (H + 2) * (W + 2) + H * W
    return 8 if words * 8 * 128 * 4 <= 11 * 2 ** 20 else 1


def pack_for_pallas(blocks: list[dict], S: int, L: int | None = None):
    """Arrange block descriptors for pallas_t1_decode.

    Returns (data (G,32,[S,]LANES) i32 byte pairs, numpasses, numbps,
    orient (1|S,LANES), wh (2,[S,]LANES), count).  Pads the lane dim and
    codewords with 0xFF (the C.3.4 end-of-data byte)."""
    B = len(blocks)
    NL = S * LANES
    assert B <= NL
    maxlen = max((len(b["data"]) for b in blocks), default=1)
    if L is None:
        # >=2 spare 0xFF granules past the longest codeword so the
        # staged window (granules g, g+1) never reads outside the buffer
        L = max(96, -(-(maxlen + 72) // 32) * 32)
    raw = np.full((NL, L + 3), 0xFF, dtype=np.uint8)
    npass = np.zeros((NL,), np.int32)
    nbps = np.zeros((NL,), np.int32)
    ori = np.zeros((NL,), np.int32)
    wh = np.ones((2, NL), np.int32)
    for j, b in enumerate(blocks):
        d = b["data"]
        raw[j, :len(d)] = np.frombuffer(d, dtype=np.uint8)
        npass[j] = b["numpasses"]
        nbps[j] = b["numbps"]
        ori[j] = b["orient"]
        wh[0, j] = b["w"]
        wh[1, j] = b["h"]
    # per-pass segmentation table (new-segment start / end / raw) from
    # the B.10.7 termination schedule; single-segment default style gets
    # one row-0 entry per lane (segment [0, len))
    from grok_tpu.t1.t1_scalar import is_raw_pass, pass_schedule, \
        segment_pass_counts
    maxbp_k = -(-int(nbps.max()) // 4) * 4 if B else 4
    P8 = max(8, -(-(3 * maxbp_k) // 8) * 8)
    ptbl = np.zeros((3, P8, NL), np.int32)
    ptbl[0] -= 1
    style_v = np.zeros((NL,), np.int32)
    for j, b in enumerate(blocks):
        style = b.get("style", 0)
        style_v[j] = ((1 if style & 0x08 else 0)        # VSC
                      | (2 if style & 0x02 else 0)      # RESET
                      | (4 if style & 0x20 else 0))     # SEGSYM
        np_j = int(npass.flat[j] if npass.ndim == 1 else npass.reshape(-1)[j])
        seg_lens = list(b.get("seg_lens") or [len(b["data"])])
        counts = segment_pass_counts(np_j, style)
        if len(seg_lens) < len(counts):
            counts = counts[:len(seg_lens)]
        sched = pass_schedule(int(nbps.reshape(-1)[j]))[:np_j]
        starts = np.concatenate([[0], np.cumsum(seg_lens)]).astype(int)
        seg_of = []
        for si, cnt in enumerate(counts):
            seg_of += [si] * cnt
        prev_si = -1
        for pno in range(min(np_j, len(seg_of), P8, len(sched))):
            si = seg_of[pno]
            if si != prev_si:
                ptbl[0, pno, j] = starts[si]
                ptbl[1, pno, j] = starts[si + 1]
                prev_si = si
            ptype, _bp = sched[pno]
            ptbl[2, pno, j] = 1 if is_raw_pass(pno, ptype, style) else 0
    # quad entries: bytes [i .. i+3] LE at every byte position, so the
    # kernel reads ONE staged word per renorm (up to 3 chained byteins
    # ride in-register byte selects instead of 3 one-hot window reads)
    r32 = raw.astype(np.uint32)
    pairs = (r32[:, :L] | (r32[:, 1:L + 1] << 8) | (r32[:, 2:L + 2] << 16)
             | (r32[:, 3:L + 3] << 24)).view(np.int32)
    # (NL, L) -> (G, 32, [S,] LANES); lane j = s*LANES + l
    G = L // 32
    if S > 1:
        data = np.ascontiguousarray(
            pairs.reshape(S, LANES, G, 32).transpose(2, 3, 0, 1))
        npass = npass.reshape(S, LANES)
        nbps = nbps.reshape(S, LANES)
        ori = ori.reshape(S, LANES)
        wh = wh.reshape(2, S, LANES)
        ptbl = ptbl.reshape(3, P8, S, LANES)
        style_v = style_v.reshape(S, LANES)
    else:
        data = np.ascontiguousarray(
            pairs.reshape(LANES, G, 32).transpose(1, 2, 0))
        npass = npass.reshape(1, LANES)
        nbps = nbps.reshape(1, LANES)
        ori = ori.reshape(1, LANES)
        style_v = style_v.reshape(1, LANES)
    return data, npass, nbps, ori, wh, ptbl, style_v, B


def decode_bucket_pallas(blocks: list[dict], W: int, H: int,
                         interpret: bool = False):
    """decode_blocks-compatible adapter: one pallas launch per <=S*128
    blocks of a (W, H) bucket.  Returns [(mag2 int64 (h, w), neg bool)].
    The DEFAULT device path on TPU backends since round 3 (the XLA
    kernel is axon-dispatch-bound: A/B 49.9 vs 2348 ms per 512^2 frame
    on the serving path); GROK_T1_PALLAS=0 forces the XLA kernel."""
    S = min(sublanes_for(W, H), -(-len(blocks) // LANES))
    data, npass, nbps, ori, wh, ptbl, style_v, B = pack_for_pallas(
        blocks, S)
    maxbp = -(-int(nbps.max()) // 4) * 4 if B else 4
    out = pallas_t1_decode(
        jnp.asarray(data), jnp.asarray(npass), jnp.asarray(nbps),
        jnp.asarray(ori), jnp.asarray(wh), jnp.asarray(ptbl),
        jnp.asarray(style_v), W, H, maxbp, S, interpret)
    out = np.asarray(out)
    res = []
    for j, b in enumerate(blocks):
        if S > 1:
            v = out[:b["h"], :b["w"], j // LANES, j % LANES]
        else:
            v = out[:b["h"], :b["w"], j]
        res.append((np.abs(v).astype(np.int64), v < 0))
    return res
