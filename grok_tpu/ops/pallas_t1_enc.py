"""Pallas TPU kernel: batched Tier-1 (EBCOT/MQ) block ENCODE.

The encode mirror of ops/pallas_t1.py: 128 MQ encoder state machines
advance in lockstep inside one Mosaic program.  Per-lane codeword bytes
are written through a 64-byte staged window (the VPU has no per-lane
scatter) that is flushed/rebased unconditionally at each column group —
the same discipline as the decoder's staged reads, and for the same
Mosaic reasons (no lax.cond joins; every traced vector >= 2D; int32
masks — see CLAUDE.md and ops/pallas_t1.py).

Round 4: the write side is QUAD-PACKED (4 bytes per int32, LE — the
encode mirror of the decoder's quad staging): the staged window is
(16, LANES) packed words and a whole renorm's byte traffic (up to 3
chained byteouts: carry RMW + emit each) rides ONE window span load +
in-register byte selects + one masked span store, instead of up to 9
one-hot scans of a 64-row byte window.  Packing also shrinks the
output buffer and the mid-granule scratch 4x, which is what lets the
64x64 config run the mid hierarchy inside the 16 MB VMEM budget
(round 3 measured <128 KB headroom at byte-per-row layout).

Contract matches ops/t1_enc.t1_encode_batch (default code-block style,
single segment): returns byte buffers + conservative per-pass rate
watermarks + the significance-type map; the host wrapper reconstructs
exact PCRD distortions (t1_enc._pass_distortions).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from grok_tpu.ops.pallas_t1 import (_MQ_PACKED, _sc_ctx_arith,
                                    _zc_ctx_arith)

LANES = 128
CTX_RL = 17
CTX_UNI = 18
N_CTX = 19
NCW = (N_CTX + 3) // 4          # packed context-state rows (4/word)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def pallas_t1_encode(mneg, orient, numbps,
                     W: int, H: int, maxbp: int, L: int,
                     interpret: bool = False):
    """Encode a batch of LANES code-blocks with one Pallas kernel.

    mneg: (H, W, LANES) int32 = (mag << 1) | neg — sign packed into
    bit 0 to halve the VMEM input footprint (64x64 x 128 lanes must fit
    the 16 MB scoped-vmem budget).  orient/numbps: (1, LANES) int32.
    L: output bytes per lane (multiple of 32; index 0 = carry sentinel).
    The refined-before test derives from mneg in-kernel
    (msb > bp+1  <=>  mag >= 1 << (bp+2)); the per-position visited
    flag lives in bit 2 of the significance scratch.
    Returns (out (G, 8, LANES) int32 QUAD-PACKED bytes (LE: byte
             32*g + 4*r + k of lane j at bits [8k, 8k+8) of
             out[g, r, j] — unpack with unpack_out_bytes),
             lengths (1, LANES),
             rates (R8, LANES) watermarks [R8 = 3*maxbp padded to 8],
             sigtype (H, W, LANES) int32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = L // 32
    n_stripes = (H + 3) // 4
    npass_max = 3 * maxbp
    R8 = -(-npass_max // 8) * 8
    mq_tbl = jnp.asarray(_MQ_PACKED).reshape(47, 1)
    # write-side mid hierarchy (round 3, mirrors the decoder): the
    # O(G) full-buffer restage runs once per KG-column group through a
    # MIDG-granule mid scratch; per-column restages touch mid only.
    # Coverage: a cleanup column emits <= 11 decisions x 2 B = 22 B
    # (spp 16 B, mrp 8 B), so KG=16 columns + 31 B skew + 64 B window
    # = 447 <= 32*MIDG = 512 B.  Quad-packing (round 4) shrank out+mid
    # 4x (mid hierarchy now fits 64x64); KG=16 halves the regroup
    # cadence (+10-18% measured, bit-exact on hardware both shapes).
    USE_MID = True
    MIDG = 16
    NC = n_stripes * W
    KG = 16
    while NC % KG:
        KG //= 2

    def kernel(mneg_ref, ori_ref, nbps_ref, mqtbl_ref,
               out_ref, len_ref, rates_ref, sigtype_ref,
               sig_ref, stage_ref, base_ref, mid_ref, mba_ref):
        ori = ori_ref[...]
        nbps = nbps_ref[...]

        out_ref[...] = jnp.zeros((G, 8, LANES), jnp.int32)
        rates_ref[...] = jnp.zeros((R8, LANES), jnp.int32)
        sigtype_ref[...] = jnp.zeros((H, W, LANES), jnp.int32)
        sig_ref[...] = jnp.zeros((H + 2, W + 2, LANES), jnp.int32)
        stage_ref[...] = jnp.zeros((16, LANES), jnp.int32)
        base_ref[...] = jnp.zeros((1, LANES), jnp.int32)
        mid_ref[...] = jnp.zeros((MIDG, 8, LANES), jnp.int32)
        mba_ref[...] = jnp.zeros((1, LANES), jnp.int32)

        giota = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0)
        miota = jax.lax.broadcasted_iota(jnp.int32, (MIDG, 1, 1), 0)
        siota = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        tiota = jax.lax.broadcasted_iota(jnp.int32, (47, 1), 0)
        ciota_pk = jax.lax.broadcasted_iota(jnp.int32, (NCW, 1), 0)
        riota = jax.lax.broadcasted_iota(jnp.int32, (R8, 1), 0)
        wiota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        wiota2 = jax.lax.broadcasted_iota(jnp.int32, (W + 2, 1), 0)

        # -- staged output window + mid hierarchy --------------------------
        # stage_ref holds bytes [base, base+64) for every lane as 16
        # quad-packed words; the per-column restage() scatters into /
        # reloads from the MIDG-granule mid scratch (O(MIDG)); mid
        # retires into the full buffer and re-centers once per
        # KG-column group (O(G)).  MQ carries mutate already-emitted
        # bytes, so mid->full is a REPLACE (not the HT encoder's
        # append-only OR) — mid always holds the authoritative content
        # of its granules.
        def win_to_mid():
            rel = (base_ref[...] >> 5) - (mba_ref[...] >> 5)
            d = mid_ref[...]
            sel0 = (miota == rel[None, :, :]).astype(jnp.int32)
            sel1 = (miota == (rel + 1)[None, :, :]).astype(jnp.int32)
            d = jnp.where(sel0 == 1, stage_ref[0:8, :][None], d)
            d = jnp.where(sel1 == 1, stage_ref[8:16, :][None], d)
            mid_ref[...] = d

        def win_from_mid(bp):
            rel = (bp >> 5) - (mba_ref[...] >> 5)
            d = mid_ref[...]
            lo = jnp.sum(d * (miota == rel[None, :, :]).astype(jnp.int32),
                         axis=0)
            hi = jnp.sum(
                d * (miota == (rel + 1)[None, :, :]).astype(jnp.int32),
                axis=0)
            stage_ref[...] = jnp.concatenate([lo, hi], axis=0)
            base_ref[...] = (bp >> 5) << 5

        def mid_to_full():
            mg = mba_ref[...] >> 5
            mid = mid_ref[...]
            d = out_ref[...]
            for j in range(MIDG):
                selj = (giota == (mg + j)[None, :, :]).astype(jnp.int32)
                d = jnp.where(selj == 1, mid[j][None], d)
            out_ref[...] = d

        def mid_shift(bp):
            mg_new = bp >> 5
            dg = mg_new - (mba_ref[...] >> 5)
            mid = mid_ref[...]
            parts = []
            for j in range(MIDG):
                sj = (miota == (dg + j)[None, :, :]).astype(jnp.int32)
                parts.append(jnp.sum(mid * sj, axis=0))
            mid_ref[...] = jnp.stack(parts, axis=0)
            mba_ref[...] = mg_new << 5

        def restage_direct(bp):
            g_old = base_ref[...] >> 5
            sel0 = (giota == g_old[None, :, :]).astype(jnp.int32)
            sel1 = (giota == (g_old + 1)[None, :, :]).astype(jnp.int32)
            d = out_ref[...]
            d = jnp.where(sel0 == 1, stage_ref[0:8, :][None], d)
            d = jnp.where(sel1 == 1, stage_ref[8:16, :][None], d)
            out_ref[...] = d
            g_new = bp >> 5
            s0 = (giota == g_new[None, :, :]).astype(jnp.int32)
            s1 = (giota == (g_new + 1)[None, :, :]).astype(jnp.int32)
            lo2 = jnp.sum(d * s0, axis=0)
            hi2 = jnp.sum(d * s1, axis=0)
            stage_ref[...] = jnp.concatenate([lo2, hi2], axis=0)
            base_ref[...] = g_new << 5

        def restage(bp):
            if not USE_MID:
                restage_direct(bp)
                return
            win_to_mid()
            win_from_mid(bp)

        def regroup(bp):
            """KG-column group boundary: retire mid into the full
            buffer and re-center it on bp's granule."""
            if not USE_MID:
                return
            win_to_mid()
            mid_to_full()
            mid_shift(bp)
            win_from_mid(bp)

        def out_get(bp):
            r = (bp - base_ref[...]) >> 2
            sel = (siota == r).astype(jnp.int32)
            w = jnp.sum(stage_ref[...] * sel, axis=0, keepdims=True)
            return jax.lax.shift_right_logical(w, (bp & 3) << 3) & 0xFF

        # -- span window traffic (round 4) ----------------------------------
        # One renorm touches bytes [bp0, bp0+3] only (3 chained
        # byteouts: carry RMW at bp then emit at bp+1 each).  Load that
        # span as one int32 (two adjacent packed rows, per-lane
        # aligned), mutate it in-register, store it back once — the
        # encode mirror of the decoder's bytein_w quad reads.
        def span_load(bp0):
            """Load the 4-byte span at bp0 from the staged window;
            returns (span, ctx) with ctx = (sel0, sel1, sh) reused by
            span_store — the store targets the SAME rows, so the
            16-row one-hots are built once per renorm (round 5)."""
            r0 = (bp0 - base_ref[...]) >> 2
            st = stage_ref[...]
            sel0 = siota == r0
            sel1 = siota == (r0 + 1)
            w0 = jnp.sum(jnp.where(sel0, st, 0), axis=0, keepdims=True)
            w1 = jnp.sum(jnp.where(sel1, st, 0), axis=0, keepdims=True)
            sh = (bp0 & 3) << 3
            lo = jax.lax.shift_right_logical(w0, sh)
            hi = jnp.where(sh == 0, 0,
                           jnp.left_shift(w1, (32 - sh) & 31))
            return lo | hi, (sel0, sel1, sh)

        def span_store(ctx, span):
            sel0, sel1, sh = ctx
            ones = jnp.full_like(sh, -1)
            st = stage_ref[...]
            m0 = jnp.left_shift(ones, sh)
            new0 = jnp.left_shift(span, sh)
            st = jnp.where(sel0, (st & ~m0) | (new0 & m0), st)
            shr = (32 - sh) & 31
            m1 = jnp.where(sh == 0, 0,
                           jax.lax.shift_right_logical(ones, shr))
            new1 = jax.lax.shift_right_logical(span, shr)
            st = jnp.where(sel1, (st & ~m1) | (new1 & m1), st)
            stage_ref[...] = st

        # -- MQ encoder (C.2.5/6/8), all (1, LANES) int32 ------------------
        def byteout_span(st, m, span, bp0):
            a, c, ct, bp = st
            sh = (bp - bp0) << 3
            cur = jax.lax.shift_right_logical(span, sh) & 0xFF
            is_ff = (cur == 0xFF).astype(jnp.int32)
            nocarry = (c < 0x8000000).astype(jnp.int32)
            mi = m.astype(jnp.int32)
            carry = mi * (1 - is_ff) * (1 - nocarry)
            # carry RMW: cur != 0xFF here, so +1 never crosses a byte
            span = jnp.where(carry == 1,
                             span + jnp.left_shift(jnp.ones_like(sh), sh),
                             span)
            cur2 = jnp.where(carry == 1, cur + 1, cur)
            now_ff = (cur2 == 0xFF).astype(jnp.int32)
            emit7 = mi * jnp.where(
                is_ff == 1, 1, (1 - nocarry) * now_ff)
            c_pre = jnp.where(
                (mi * (1 - is_ff) * (1 - nocarry) * now_ff) == 1,
                c & 0x7FFFFFF, c)
            bp2 = jnp.where(mi == 1, bp + 1, bp)
            val = jnp.where(emit7 == 1, c_pre >> 20, c_pre >> 19) & 0xFF
            sh2 = (bp2 - bp0) << 3
            wm = jnp.left_shift(jnp.full_like(sh2, 0xFF), sh2)
            span = jnp.where(mi == 1,
                             (span & ~wm) | jnp.left_shift(val, sh2),
                             span)
            c2 = jnp.where(emit7 == 1, c_pre & 0xFFFFF, c_pre & 0x7FFFF)
            c3 = jnp.where(mi == 1, c2, c)
            ct3 = jnp.where(mi == 1, jnp.where(emit7 == 1, 7, 8), ct)
            return (a, c3, ct3, bp2), span

        def nbits_to_msb(a):
            n = jnp.zeros_like(a)
            v = jnp.maximum(a, 1)
            n = n + jnp.where(v < 0x100, 8, 0)
            v = jnp.where(v < 0x100, v << 8, v)
            n = n + jnp.where(v < 0x1000, 4, 0)
            v = jnp.where(v < 0x1000, v << 4, v)
            n = n + jnp.where(v < 0x4000, 2, 0)
            v = jnp.where(v < 0x4000, v << 2, v)
            n = n + jnp.where(v < 0x8000, 1, 0)
            return n

        def enc_renorm(st, need):
            a, c, ct, bp = st
            bp0 = bp
            span, sctx = span_load(bp0)
            n = jnp.where(need, nbits_to_msb(a), 0)
            for _ in range(3):
                m = (n > 0).astype(jnp.int32)
                s = jnp.minimum(n, ct) * m
                a = jnp.where(m == 1, (a << s) & 0xFFFF, a)
                c = jnp.where(m == 1, (c << s) & 0xFFFFFFF, c)
                ct = ct - s
                n = n - s
                fire = (m == 1) & (ct == 0)
                (a, c, ct, bp), span = byteout_span((a, c, ct, bp),
                                                    fire, span, bp0)
            span_store(sctx, span)
            return (a, c, ct, bp)

        def mq_encode(mqs, d, cx, active):
            # context states live PACKED: 4 contexts per int32 row
            # (7 bits each: state index | mps << 6), NCW = 5 rows for
            # 19 contexts — fetch is a 5-row one-hot + one variable
            # shift instead of two 19-row masked sums, and the update
            # is one masked row write (round 5: ~2x less per-decision
            # state traffic; the decisions/slot lever, VERDICT #5)
            (a, c, ct, bp), ctx_pk = mqs
            rsel = cx >> 2
            sh7 = (cx & 3) * 7
            selw = ciota_pk == rsel
            w = jnp.sum(jnp.where(selw, ctx_pk, 0), axis=0,
                        keepdims=True)
            cell = jax.lax.shift_right_logical(w, sh7) & 0x7F
            i = cell & 0x3F
            mps = cell >> 6
            packed = jnp.sum(
                jnp.where(tiota == i, mqtbl_ref[...], 0), axis=0,
                keepdims=True)
            qe = (packed >> 13) & 0xFFFF
            nmps = (packed >> 7) & 0x3F
            nlps = (packed >> 1) & 0x3F
            sw = packed & 1

            a1 = (a - qe) & 0xFFFF
            msb = ((a1 & 0x8000) != 0).astype(jnp.int32)
            small = (a1 < qe).astype(jnp.int32)
            is_mps = (d == mps).astype(jnp.int32)
            act = active.astype(jnp.int32)

            add_c = jnp.where(is_mps == 1, msb | (1 - small), small)
            c = jnp.where((act * add_c) == 1, c + qe, c)
            set_a_qe = jnp.where(is_mps == 1, (1 - msb) * small,
                                 1 - small)
            a = jnp.where(act == 1, jnp.where(set_a_qe == 1, qe, a1), a)

            renorm_needed = jnp.where(is_mps == 1, 1 - msb, 1)
            upd = act * renorm_needed
            new_i = jnp.where(is_mps == 1, nmps, nlps)
            flip = (1 - is_mps) * sw
            new_mps = jnp.where(flip == 1, 1 - mps, mps)
            new_cell = new_i | (new_mps << 6)
            m7 = jnp.left_shift(jnp.full_like(sh7, 0x7F), sh7)
            neww = (w & ~m7) | jnp.left_shift(new_cell, sh7)
            ctx_pk = jnp.where(selw & (upd == 1), neww, ctx_pk)
            mq = enc_renorm((a, c, ct, bp), upd == 1)
            return (mq, ctx_pk)

        # -- flag helpers (mirror pallas_t1) -------------------------------
        def nbhd(y, x):
            return sig_ref[pl.ds(y, 3), pl.ds(x, 3), :]

        def counts(y, x):
            n = ((nbhd(y, x) & 3) != 0).astype(jnp.int32)
            h = n[1:2, 0, :] + n[1:2, 2, :]
            v = n[0:1, 1, :] + n[2:3, 1, :]
            d = (n[0:1, 0, :] + n[0:1, 2, :] + n[2:3, 0, :]
                 + n[2:3, 2, :])
            return h, v, d

        def signs(y, x):
            n = nbhd(y, x) & 3
            s = jnp.where(n == 1, 1, jnp.where(n == 2, -1, 0))
            hs = jnp.clip(s[1:2, 0, :] + s[1:2, 2, :], -1, 1)
            vs = jnp.clip(s[0:1, 1, :] + s[2:3, 1, :], -1, 1)
            return hs, vs

        def row_set(ref, y, x, vals, m, border):
            it = wiota2 if border else wiota
            row = ref[y, :, :]
            sel = (it == x) & m
            ref[y, :, :] = jnp.where(sel, vals, row)

        def mark_sig(y, x, negb, stype, m):
            # preserves bit 2 (visited): callers only mark not-visited
            # positions, so a plain value write is safe
            row_set(sig_ref, y + 1, x + 1,
                    jnp.where(negb == 1, 2, 1), m, True)
            row_set(sigtype_ref, y, x,
                    jnp.full((1, LANES), stype, jnp.int32), m, False)

        def vis_set(y, x, m):
            row = sig_ref[y + 1, :, :]
            sel = (wiota2 == x + 1) & m
            sig_ref[y + 1, :, :] = jnp.where(sel, row | 4, row)

        def magbit(y, x, bp):
            return (mneg_ref[y, pl.ds(x, 1), :] >> (bp + 1)) & 1

        def negbit(y, x):
            return mneg_ref[y, pl.ds(x, 1), :] & 1

        # -- initial state --------------------------------------------------
        # derive the zero template from a VMEM load: plain constants get
        # a lane-replicated Mosaic layout that the fori-loop join cannot
        # reconcile with the loop body's tiled values ("Invalid relayout
        # {0,0} -> {*,*}")
        z2 = nbps * 0
        # packed initial states: ctx 0 -> 4 (word 0 slot 0), RL=17 -> 3
        # (word 4 slot 1), UNI=18 -> 46 (word 4 slot 2); mps all 0
        crow = jax.lax.broadcasted_iota(jnp.int32, (NCW, LANES), 0)
        ctx_pk0 = jnp.where(crow == CTX_UNI >> 2,
                            (46 << ((CTX_UNI & 3) * 7))
                            | (3 << ((CTX_RL & 3) * 7)),
                            jnp.where(crow == 0, 4, 0))
        mqs = ((z2 + 0x8000, z2, z2 + 12, z2), ctx_pk0)

        def record(passno, mqs):
            # conservative per-pass rate watermark: bytes so far + 5
            bp = mqs[0][3]
            oh = (riota == passno)
            rates_ref[...] = jnp.where(oh, bp + 5, rates_ref[...])

        # -- pass bodies (unconditional restage per column group) ----------
        def spp_step(col, dy, bp, mqs):
            x = col % W
            yr = (col // W) * 4 + dy
            k_lane = nbps - 1 - bp
            act = (k_lane >= 1) & (x < W) & (yr < H)
            y = jnp.minimum(yr, H - 1)
            cell = sig_ref[y + 1, pl.ds(x + 1, 1), :]
            cur_sig = (cell & 3) != 0
            visv = (cell & 4) != 0
            h, v, d = counts(y, x)
            zc = _zc_ctx_arith(ori, h, v, d)
            coded = act & ~cur_sig & ~visv & (zc != 0)
            bit = magbit(y, x, bp)
            mqs = mq_encode(mqs, bit, zc, coded)
            became = coded & (bit == 1)
            hs, vs = signs(y, x)
            sc, xr = _sc_ctx_arith(hs, vs)
            nb = negbit(y, x)
            mqs = mq_encode(mqs, nb ^ xr, sc, became)
            mark_sig(y, x, nb, 1, became)
            vis_set(y, x, coded)
            return mqs

        def mrp_step(col, dy, bp, mqs):
            x = col % W
            yr = (col // W) * 4 + dy
            k_lane = nbps - 1 - bp
            act = (k_lane >= 1) & (yr < H)
            y = jnp.minimum(yr, H - 1)
            cell = sig_ref[y + 1, pl.ds(x + 1, 1), :]
            cur_sig = (cell & 3) != 0
            visv = (cell & 4) != 0
            coded = act & cur_sig & ~visv
            ref_before = (mneg_ref[y, pl.ds(x, 1), :]
                          >= (1 << (bp + 3))).astype(jnp.int32)
            h, v, d = counts(y, x)
            mr = jnp.where(ref_before == 1, 16,
                           jnp.where(h + v + d > 0, 15, 14))
            bit = magbit(y, x, bp)
            mqs = mq_encode(mqs, bit, mr, coded)
            return mqs

        def cln_step(col, j, bp, carry):
            mqs, rl_mode, has, r, became = carry
            x = col % W
            y0 = (col // W) * 4
            dy = min(max((j - 3) // 2, 0), 3)
            y = jnp.minimum(y0 + dy, H - 1)
            k_lane = nbps - 1 - bp
            act = k_lane >= 0
            is_rl = j == 0
            is_uni = (j == 1) | (j == 2)
            is_zc = (j >= 3) & ((j - 3) % 2 == 0)
            is_sc = (j >= 3) & ((j - 3) % 2 == 1)

            ys = jnp.minimum(y0, H - 4)
            seg = ((sig_ref[pl.ds(ys, 6), pl.ds(x, 3), :] & 3) != 0)
            nosig = jnp.sum(jnp.sum(seg.astype(jnp.int32), axis=0),
                            axis=0, keepdims=True) == 0
            visc = (sig_ref[pl.ds(ys + 1, 4), pl.ds(x + 1, 1), :]
                    & 4) >> 2
            novis = jnp.sum(jnp.sum(visc, axis=0), axis=0,
                            keepdims=True) == 0
            full = (jnp.zeros((1, LANES), jnp.int32)
                    + (y0 + 4 <= H).astype(jnp.int32)) == 1
            rl_now = act & full & nosig & novis

            mcol = mneg_ref[pl.ds(ys, 4), pl.ds(x, 1), :]  # (4,1,LANES)
            b0 = (mcol[0:1, 0, :] >> (bp + 1)) & 1
            b1 = (mcol[1:2, 0, :] >> (bp + 1)) & 1
            b2 = (mcol[2:3, 0, :] >> (bp + 1)) & 1
            b3 = (mcol[3:4, 0, :] >> (bp + 1)) & 1
            any1 = (b0 + b1 + b2 + b3) > 0
            rfirst = jnp.where(b0 == 1, 0,
                               jnp.where(b1 == 1, 1,
                                         jnp.where(b2 == 1, 2, 3)))

            cell2 = sig_ref[y + 1, pl.ds(x + 1, 1), :]
            cur_sig = (cell2 & 3) != 0
            visv = (cell2 & 4) != 0
            in_rl_skip = (rl_mode == 1) & ((has == 0)
                                           | ((has == 1) & (r >= dy)))
            h, v, d = counts(y, x)
            zc = _zc_ctx_arith(ori, h, v, d)
            hs, vs = signs(y, x)
            sc, xr = _sc_ctx_arith(hs, vs)
            normal = is_zc & act & ~cur_sig & ~visv & ~in_rl_skip
            first = is_sc & (has == 1) & (r == dy)

            bit_zc = magbit(y, x, bp)
            nb = negbit(y, x)
            cx = jnp.where(is_rl, CTX_RL,
                           jnp.where(is_uni, CTX_UNI,
                                     jnp.where(is_zc, zc, sc)))
            setm = is_sc & ((became == 1) | first)
            d_bit = jnp.where(is_rl, jnp.where(any1, 1, 0),
                              jnp.where(j == 1, (r >> 1) & 1,
                                        jnp.where(j == 2, r & 1,
                                                  jnp.where(is_zc, bit_zc,
                                                            nb ^ xr))))
            rl_i = rl_now.astype(jnp.int32)
            norm_i = normal.astype(jnp.int32)
            setm_i = setm.astype(jnp.int32)
            act_i = jnp.where(is_rl, rl_i,
                              jnp.where(is_uni, has,
                                        jnp.where(is_zc, norm_i, setm_i)))
            mqs = mq_encode(mqs, d_bit, cx, act_i == 1)

            rl_mode = jnp.where(is_rl, rl_i, rl_mode)
            has = jnp.where(is_rl, rl_i * any1.astype(jnp.int32), has)
            r = jnp.where(is_rl, rfirst, r)
            new_became = norm_i * bit_zc
            mark_sig(y, x, nb, 2, setm)
            became = jnp.where(is_sc, 0,
                               jnp.where(is_zc, new_became, became))
            return (mqs, rl_mode, has, r, became)

        def restage_mqs(mqs):
            restage(mqs[0][3])
            return mqs

        def plane_body(bp, mqs):
            k_lane = nbps - 1 - bp

            def spp_col(col, mqs):
                mqs = restage_mqs(mqs)
                for dy in range(4):
                    mqs = spp_step(col, dy, bp, mqs)
                return mqs

            def spp_group(o, mqs):
                regroup(mqs[0][3])
                return jax.lax.fori_loop(o * KG, o * KG + KG, spp_col,
                                         mqs)
            mqs = jax.lax.fori_loop(0, NC // KG, spp_group, mqs)
            record(3 * k_lane - 2, mqs)

            def mrp_col(col, mqs):
                mqs = restage_mqs(mqs)
                for dy in range(4):
                    mqs = mrp_step(col, dy, bp, mqs)
                return mqs

            def mrp_group(o, mqs):
                regroup(mqs[0][3])
                return jax.lax.fori_loop(o * KG, o * KG + KG, mrp_col,
                                         mqs)
            mqs = jax.lax.fori_loop(0, NC // KG, mrp_group, mqs)
            record(3 * k_lane - 1, mqs)

            z = nbps * 0

            def cln_col(col, carry):
                mqs, rl_mode, has, r, became = carry
                carry = (restage_mqs(mqs), rl_mode, has, r, became)
                for j in range(6):
                    carry = cln_step(col, j, bp, carry)
                mqs, rl_mode, has, r, became = carry
                carry = (restage_mqs(mqs), rl_mode, has, r, became)
                for j in range(6, 11):
                    carry = cln_step(col, j, bp, carry)
                return carry

            def cln_group(o, carry):
                regroup(carry[0][0][3])
                return jax.lax.fori_loop(o * KG, o * KG + KG, cln_col,
                                         carry)
            carry = jax.lax.fori_loop(0, NC // KG, cln_group,
                                      (mqs, z, z, z, z))
            mqs = carry[0]
            record(3 * k_lane, mqs)
            sig_ref[...] = sig_ref[...] & 3     # clear visited bits
            return mqs

        for bp_static in range(maxbp - 1, -1, -1):
            mqs = plane_body(bp_static, mqs)

        # -- FLUSH (C.2.9), masked on lanes with data ----------------------
        active = nbps > 0
        (a, c, ct, bp), _ = mqs
        tempc = c + a
        c1 = c | 0xFFFF
        c1 = jnp.where(c1 >= tempc, c1 - 0x8000, c1)
        c1 = jnp.where(active, c1, c)
        bp0 = bp
        span, sctx = span_load(bp0)
        st = (a, (c1 << ct) & 0xFFFFFFF, ct, bp)
        st, span = byteout_span(st, active, span, bp0)
        a, c2, ct2, bp2 = st
        st = (a, (c2 << ct2) & 0xFFFFFFF, ct2, bp2)
        st, span = byteout_span(st, active, span, bp0)
        a, c3, ct3, bp3 = st
        span_store(sctx, span)
        last = out_get(bp3)
        bp4 = jnp.where(active & (last != 0xFF), bp3 + 1, bp3)
        win_to_mid()
        mid_to_full()                 # final flush: window -> mid -> full
        len_ref[...] = jnp.maximum(bp4 - 1, 0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((G, 8, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((1, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((R8, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((H, W, LANES), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, LANES), jnp.int32),
            pltpu.VMEM((16, LANES), jnp.int32),          # packed window
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((MIDG, 8, LANES), jnp.int32),     # write mid
            pltpu.VMEM((1, LANES), jnp.int32),           # mid base
        ],
        interpret=interpret,
    )(mneg, orient, numbps, mq_tbl)
    return out


def pack_for_pallas_enc(blocks: list[dict]):
    """Arrange encode jobs (mag/neg/orient/style==0) for the kernel.

    Returns (mneg (H,W,LANES) i32 [= mag<<1 | neg], orient,
    numbps (1,LANES), W, H, maxbp, L)."""
    B = len(blocks)
    assert B <= LANES
    H, W = blocks[0]["mag"].shape
    assert H >= 4, "pallas encode bucket needs H >= 4 (stripe slices)"
    mneg = np.zeros((H, W, LANES), np.int32)
    ori = np.zeros((1, LANES), np.int32)
    nbps = np.zeros((1, LANES), np.int32)
    for j, b in enumerate(blocks):
        m = np.asarray(b["mag"], np.int64)
        assert m.shape == (H, W), "encode bucket must be exact-shape"
        mneg[:, :, j] = (m << 1) | np.asarray(b["neg"], np.int64)
        ori[0, j] = b["orient"]
        mx = int(m.max()) if m.size else 0
        nbps[0, j] = mx.bit_length()
    maxbp = int(nbps.max()) if B else 1
    maxbp = max(maxbp, 1)
    # output budget: ~1.1 byte/px + slack (VMEM-bounded); the adapter
    # falls back to the XLA path if any lane comes within 64 bytes of L
    L = max(96, -(-(H * W + H * W // 8 + 256) // 32) * 32)
    return mneg, ori, nbps, W, H, maxbp, L


def unpack_out_bytes(out: np.ndarray, lane: int, total: int) -> bytes:
    """Lane `lane`'s codeword bytes from the kernel's quad-packed
    output (G, 8, LANES): LE words -> bytes, skipping the index-0
    carry sentinel."""
    words = np.ascontiguousarray(out[:, :, lane].reshape(-1)
                                 .astype("<i4"))
    return words.tobytes()[1:1 + total]


def rates_from_watermarks(rates_col, numbps: int, total: int) -> list[int]:
    """Per-pass cumulative byte rates from the kernel's watermark table
    column (R8 rows): plane k's SPP/MRP/CUP sit at 3k-2 / 3k-1 / 3k
    (plane 0 = MSB has only CUP at row 0).  Clamped to the terminated
    total and made monotonic — the simulation contract encode_blocks
    provides (watermarks are conservative, the final pass is exact)."""
    from grok_tpu.t1.t1_scalar import pass_schedule

    sched = pass_schedule(numbps)
    out = []
    for (ptype, bp) in sched:
        k = numbps - 1 - bp
        idx = 3 * k + (ptype - 2 if ptype != 2 else 0)
        out.append(min(int(rates_col[idx]), total))
    for t in range(1, len(out)):
        out[t] = max(out[t], out[t - 1])
    out[-1] = total
    return out


def encode_bucket_pallas(blocks: list[dict]) -> list:
    """encode_blocks-compatible adapter: one pallas launch per <=LANES
    exact-shape blocks.  Returns EncodedBlock list (exact PCRD
    distortions reconstructed on host, same as the XLA path)."""
    from grok_tpu.ops.t1_enc import _pass_distortions
    from grok_tpu.t1.t1_scalar import (EncodedBlock, PassInfo,
                                       pass_schedule)

    mneg, ori, nbps, W, H, maxbp, L = pack_for_pallas_enc(blocks)
    maxbp4 = -(-maxbp // 4) * 4          # stable jit cache
    out, lens, rates, sigtype = pallas_t1_encode(
        jnp.asarray(mneg), jnp.asarray(ori),
        jnp.asarray(nbps), W, H, maxbp4, L, False)
    out = np.asarray(out)
    lens = np.asarray(lens)
    if int(lens.max()) >= L - 64:
        # output budget overrun risk: redo this bucket on the XLA path
        from grok_tpu.ops import t1_enc as _xla
        import os
        env = os.environ.pop("GROK_T1_PALLAS", None)
        try:
            return _xla.encode_blocks(blocks)
        finally:
            if env is not None:
                os.environ["GROK_T1_PALLAS"] = env
    rates = np.asarray(rates)
    sigtype = np.asarray(sigtype)
    results = []
    for j, b in enumerate(blocks):
        numbps = int(nbps[0, j])
        if numbps == 0:
            results.append(EncodedBlock())
            continue
        total = int(lens[0, j])
        data = unpack_out_bytes(out, j, total)
        sched = pass_schedule(numbps)
        npasses = len(sched)
        dists = _pass_distortions(np.asarray(b["mag"], np.int64),
                                  sigtype[:, :, j], numbps,
                                  b.get("frac"))
        lane_rates = rates_from_watermarks(rates[:, j], numbps, total)
        passes = [PassInfo(rate=lane_rates[t], dist=float(dists[t]),
                           term=(t == npasses - 1))
                  for t in range(npasses)]
        results.append(EncodedBlock(data=data, numbps=numbps,
                                    passes=passes, seg_lens=[total],
                                    seg_passes=[npasses]))
    return results
