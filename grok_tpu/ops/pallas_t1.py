"""Pallas TPU kernel: batched Tier-1 (EBCOT/MQ) block decode.

One pallas_call decodes a batch of code-blocks entirely on-core: all
decisions for all lanes run inside a single compiled Mosaic program with
hardware loops — none of the per-op dispatch overhead that caps the XLA
fallback (ops/t1_dec.py).

Layout: lanes = blocks, shape (1, 128) per scalar register row; flag
state as (H+2, W+2, 128) / (H, W, 128) VMEM scratch.  Per-lane compressed
bytes can't be fetched with hardware addressing (the VPU has no per-lane
gather), so the kernel keeps a 64-byte staged window per lane, refreshed
every 8 decision slots with a one-hot granule reduction over the (G, 32,
128)-arranged codeword buffer — amortized to ~tens of cycles per slot.

Context formation (ZC/SC/MR) is arithmetized from the normative rules
(no table gathers); the 47-state MQ table is packed into one int32 row
resolved with a single one-hot reduction.

Same contract as ops/t1_dec.t1_decode_batch: default code-block style,
single codeword segment; bit-exact vs the scalar coder
(tests/test_pallas_t1.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from grok_tpu.t1.mq import MQ_NLPS, MQ_NMPS, MQ_QE, MQ_SWITCH

LANES = 128
CTX_RL = 17
CTX_UNI = 18
N_CTX = 19

# packed MQ table row: (qe << 13) | (nmps << 7) | (nlps << 1) | switch
_MQ_PACKED = np.asarray(
    (MQ_QE.astype(np.int64) << 13) | (MQ_NMPS.astype(np.int64) << 7)
    | (MQ_NLPS.astype(np.int64) << 1) | MQ_SWITCH.astype(np.int64),
    dtype=np.int32)


def _zc_ctx_arith(orient, h, v, d):
    """Zero-coding context (Table D.1) as vector arithmetic.

    orient/h/v/d: int32 arrays; LL/LH use (h,v) as-is, HL swaps, HH is
    diagonal-driven.  Mirrors t1/luts.zc_context exactly.
    """
    swap = orient == 1
    hh = jnp.where(swap, v, h)
    vv = jnp.where(swap, h, v)
    # non-HH bands
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
    """Sign-coding (context, xor) from clamped sums (Table D.2)."""
    ctx = jnp.where(hs == 0,
                    jnp.where(vs == 0, 9, 10),
                    jnp.where(vs * hs == 1, 13,
                              jnp.where(vs == 0, 12, 11)))
    xor = jnp.where(hs == -1, 1, jnp.where((hs == 0) & (vs == -1), 1, 0))
    return ctx, xor


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def pallas_t1_decode(data, numpasses, numbps, orient, wh,
                     W: int, H: int, maxbp: int, L: int,
                     interpret: bool = False):
    """Decode a batch of LANES code-blocks with one Pallas kernel.

    data: (G, 32, LANES) int32, byte-pair-packed ((b<<8)|next) codewords
    arranged in 32-byte granules, 0xFF-padded per lane beyond each length.
    numpasses/numbps/orient: (1, LANES) int32; wh: (2, LANES) int32.
    Returns (mag2 (H, W, LANES) int32, neg (H, W, LANES) int32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = data.shape[0]
    n_stripes = (H + 3) // 4
    mq_tbl = jnp.asarray(_MQ_PACKED).reshape(47, 1)

    def kernel(data_ref, npass_ref, nbps_ref, ori_ref, wh_ref, mqtbl_ref,
               mag2_ref, neg_ref, sig_ref, vis_ref, val2_ref):
        # EVERY traced vector in this kernel is kept >= 2D.  Mosaic's
        # 1-D ("implicit dim") layout path aborts the compiler on this
        # toolchain (layout.h:320 "arr.size() >= layout_rank") once 1-D
        # values flow through chained decodes into scratch stores; with
        # all lane registers shaped (1, LANES) the kernel lowers cleanly.
        ori = ori_ref[...]
        wv = wh_ref[0:1, :]
        hv = wh_ref[1:2, :]
        npass = npass_ref[...]
        nbps = nbps_ref[...]

        sig_ref[...] = jnp.zeros((H + 2, W + 2, LANES), jnp.int32)
        vis_ref[...] = jnp.zeros((H, W, LANES), jnp.int32)
        val2_ref[...] = jnp.zeros((H, W, LANES), jnp.int32)
        neg_ref[...] = jnp.zeros((H, W, LANES), jnp.int32)

        giota = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0)
        siota = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
        tiota = jax.lax.broadcasted_iota(jnp.int32, (47, 1), 0)

        def stage_load(bp):
            """(64, LANES) staged window at each lane's 32-aligned base.

            bp: (1, LANES)."""
            g0 = bp >> 5
            sel0 = (giota == g0[None, :, :]).astype(jnp.int32)
            sel1 = (giota == (g0 + 1)[None, :, :]).astype(jnp.int32)
            d = data_ref[...]
            lo = jnp.sum(d * sel0, axis=0)      # (32, LANES)
            hi = jnp.sum(d * sel1, axis=0)
            return jnp.concatenate([lo, hi], axis=0), (g0 << 5)

        def stage_read(stage, base, bp):
            """Byte pair at bp from the staged window: (cur, nxt)."""
            sel = (siota == (bp - base)).astype(jnp.int32)   # (64, LANES)
            v = jnp.sum(stage * sel, axis=0, keepdims=True)  # (1, LANES)
            return (v >> 8) & 0xFF, v & 0xFF

        def bytein(mq, m):
            a, c, ct, bp, stage, base = mq
            cur, nxt = stage_read(stage, base, bp)
            is_ff = cur == 0xFF
            stop = is_ff & (nxt > 0x8F)
            c_new = jnp.where(stop, c + 0xFF00,
                              jnp.where(is_ff, c + (nxt << 9),
                                        c + (nxt << 8)))
            ct_new = jnp.where(is_ff & ~stop, 7, 8)
            bp_new = jnp.where(stop, bp, bp + 1)
            return (a, jnp.where(m, c_new, c), jnp.where(m, ct_new, ct),
                    jnp.where(m, bp_new, bp), stage, base)

        def nbits_to_msb(a):
            # 16 - bit_length(a) for a in [1, 0xFFFF], branch-free
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
            a, c, ct, bp, stage, base = mq
            n = jnp.where(need, nbits_to_msb(a), 0)
            for _ in range(3):
                m = n > 0
                feed = m & (ct == 0)
                a, c, ct, bp, stage, base = bytein(
                    (a, c, ct, bp, stage, base), feed)
                s = jnp.minimum(n, jnp.where(ct > 0, ct, 0))
                a = jnp.where(m, (a << s) & 0xFFFF, a)
                c = jnp.where(m, c << s, c)
                ct = jnp.where(m, ct - s, ct)
                n = n - s
            return (a, c, ct, bp, stage, base)

        def mq_decode(mqs, cx, active):
            (a, c, ct, bp, stage, base), ctx_st, ctx_mps = mqs
            oh = (jax.lax.broadcasted_iota(jnp.int32, (N_CTX, LANES), 0)
                  == cx)
            i = jnp.sum(jnp.where(oh, ctx_st, 0), axis=0, keepdims=True)
            mps = jnp.sum(jnp.where(oh, ctx_mps, 0), axis=0, keepdims=True)
            packed = jnp.sum(
                jnp.where(tiota == i, mqtbl_ref[...], 0), axis=0,
                keepdims=True)
            qe = (packed >> 13) & 0xFFFF
            nmps = (packed >> 7) & 0x3F
            nlps = (packed >> 1) & 0x3F
            sw = packed & 1

            # int32 0/1 masks everywhere: Mosaic cannot lower select_n on
            # i1 vectors
            a1 = (a - qe) & 0xFFFF
            chigh = (c >> 16) & 0xFFFF
            lps = (chigh < qe).astype(jnp.int32)
            small = (a1 < qe).astype(jnp.int32)
            msb = ((a1 & 0x8000) != 0).astype(jnp.int32)
            act = active.astype(jnp.int32)

            renorm_needed = lps | (1 - msb)
            is_mps = jnp.where(lps == 1, small, msb | (1 - small))
            bit = jnp.where(is_mps == 1, mps, 1 - mps)
            use_nmps = jnp.where(lps == 1, small, 1 - small)
            new_i = jnp.where(use_nmps == 1, nmps, nlps)
            flip = (1 - use_nmps) * sw
            new_mps = jnp.where(flip == 1, 1 - mps, mps)

            upd = act * renorm_needed
            a = jnp.where(act * jnp.where(lps == 1, 1, 0) == 1, qe,
                          jnp.where(act == 1, a1, a))
            c = jnp.where(act * (1 - lps) == 1, c - (qe << 16), c)
            updr = oh & (upd == 1)
            ctx_st = jnp.where(updr, new_i, ctx_st)
            ctx_mps = jnp.where(updr, new_mps, ctx_mps)
            mq = renorm((a, c, ct, bp, stage, base), upd == 1)
            return (mq, ctx_st, ctx_mps), jnp.where(act == 1, bit, 0)

        # -- flag access helpers (scalar y/x; lanes vectorized) ------------
        def nbhd(y, x):
            return sig_ref[pl.ds(y, 3), pl.ds(x, 3), :]

        def counts(y, x):
            n = (nbhd(y, x) != 0).astype(jnp.int32)
            h = n[1:2, 0, :] + n[1:2, 2, :]          # (1, LANES)
            v = n[0:1, 1, :] + n[2:3, 1, :]
            d = (n[0:1, 0, :] + n[0:1, 2, :] + n[2:3, 0, :] + n[2:3, 2, :])
            return h, v, d

        def signs(y, x):
            n = nbhd(y, x)
            s = jnp.where(n == 1, 1, jnp.where(n == 2, -1, 0))
            hs = jnp.clip(s[1:2, 0, :] + s[1:2, 2, :], -1, 1)
            vs = jnp.clip(s[0:1, 1, :] + s[2:3, 1, :], -1, 1)
            return hs, vs

        def sigc(y, x):
            return sig_ref[y + 1, pl.ds(x + 1, 1), :]    # (1, LANES)

        wiota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        wiota2 = jax.lax.broadcasted_iota(jnp.int32, (W + 2, 1), 0)

        def row_set(ref, y, x, vals, m, border):
            # Mosaic crashes on read-modify-write at two traced indices;
            # one dynamic row index + a vectorized column select lowers fine
            it = wiota2 if border else wiota
            row = ref[y, :, :]
            sel = (it == x) & m
            ref[y, :, :] = jnp.where(sel, vals, row)

        def mark_sig(y, x, negb, bp, m):
            row_set(sig_ref, y + 1, x + 1,
                    jnp.where(negb == 1, 2, 1), m, True)
            row_set(val2_ref, y, x,
                    jnp.full((1, LANES), jnp.int32(3) << bp, jnp.int32),
                    m, False)
            row_set(neg_ref, y, x, negb, m, False)

        # -- initial MQ state ----------------------------------------------
        bp0 = jnp.zeros((1, LANES), jnp.int32)
        stage, base = stage_load(bp0)
        cur, _ = stage_read(stage, base, bp0)
        c0 = cur << 16
        mq0 = (jnp.full((1, LANES), 0x8000, jnp.int32), c0,
               jnp.zeros((1, LANES), jnp.int32), bp0, stage, base)
        mq0 = bytein(mq0, jnp.ones((1, LANES), bool))
        a_, c_, ct_, bp_, stage, base = mq0
        mq0 = (a_, c_ << 7, ct_ - 7, bp_, stage, base)
        crow = jax.lax.broadcasted_iota(jnp.int32, (N_CTX, LANES), 0)
        ctx_st0 = jnp.where(crow == CTX_UNI, 46,
                            jnp.where(crow == CTX_RL, 3,
                                      jnp.where(crow == 0, 4, 0)))
        mqs0 = (mq0, ctx_st0, jnp.zeros((N_CTX, LANES), jnp.int32))

        def refresh(mqs):
            (a, c, ct, bp, stage, base), cs, cm = mqs
            stage, base = stage_load(bp)
            return ((a, c, ct, bp, stage, base), cs, cm)

        # -- pass bodies ---------------------------------------------------
        # NOTE: refreshes are UNCONDITIONAL at the top of each unrolled
        # column group.  The natural `lax.cond(i % k == 0, refresh, ...)`
        # trips a Mosaic relayout bug on TPU (the cond join wants a
        # lane-replicated layout the pass cannot produce:
        # "Invalid relayout ... {*,0} -> {*,*}", and the same family as
        # the layout.h:320 crash); a nested loop with the refresh always
        # taken compiles cleanly and costs only the redundant one-hot
        # granule sums.
        def spp_step(col, dy, bp, mqs):
            # 2 decodes/step -> up to 6 bytes; 4 steps per refresh stay
            # within the 31-byte refill budget of the staged window
            x = col % W
            yr = (col // W) * 4 + dy
            k_lane = nbps - 1 - bp
            act = (k_lane >= 1) & (3 * k_lane - 2 < npass) & \
                (x < wv) & (yr < hv)
            y = jnp.minimum(yr, H - 1)   # masked rows clamp in-bounds
            cur_sig = sigc(y, x) != 0
            visv = vis_ref[y, pl.ds(x, 1), :] != 0
            h, v, d = counts(y, x)
            zc = _zc_ctx_arith(ori, h, v, d)
            coded = act & ~cur_sig & ~visv & (zc != 0)
            mqs, bit = mq_decode(mqs, zc, coded)
            became = coded & (bit == 1)
            hs, vs = signs(y, x)
            sc, xr = _sc_ctx_arith(hs, vs)
            mqs, sbit = mq_decode(mqs, sc, became)
            mark_sig(y, x, sbit ^ xr, bp, became)
            row_set(vis_ref, y, x, jnp.ones((1, LANES), jnp.int32), coded,
                    False)
            return mqs

        def mrp_step(col, dy, bp, mqs):
            x = col % W
            yr = (col // W) * 4 + dy
            k_lane = nbps - 1 - bp
            act = (k_lane >= 1) & (3 * k_lane - 1 < npass) & \
                (x < wv) & (yr < hv)
            y = jnp.minimum(yr, H - 1)
            cur_sig = sigc(y, x) != 0
            visv = vis_ref[y, pl.ds(x, 1), :] != 0
            coded = act & cur_sig & ~visv
            v2 = val2_ref[y, pl.ds(x, 1), :]
            was_ref = v2 >= (jnp.int32(8) << bp)
            h, v, d = counts(y, x)
            mr = jnp.where(was_ref, 16, jnp.where(h + v + d > 0, 15, 14))
            mqs, bit = mq_decode(mqs, mr, coded)
            # val2 += (b-1)*2^(bp+1) + 2^bp  (b in {0,1}; avoid negative
            # left shifts)
            nv = v2 + (bit << (bp + 1)) - (jnp.int32(1) << (bp + 1)) \
                + (jnp.int32(1) << bp)
            row_set(val2_ref, y, x, nv, coded, False)
            return mqs

        def cln_step(col, j, bp, carry):
            mqs, rl_mode, has, r, became = carry
            x = col % W
            y0 = (col // W) * 4
            dy = min(max((j - 3) // 2, 0), 3)
            y = jnp.minimum(y0 + dy, H - 1)
            k_lane = nbps - 1 - bp
            act = (k_lane >= 0) & (3 * k_lane < npass)
            is_rl = j == 0
            is_uni = (j == 1) | (j == 2)
            is_zc = (j >= 3) & ((j - 3) % 2 == 0)
            is_sc = (j >= 3) & ((j - 3) % 2 == 1)

            ys = jnp.minimum(y0, H - 4)
            seg = (sig_ref[pl.ds(ys, 6), pl.ds(x, 3), :] != 0)
            nosig = jnp.sum(jnp.sum(seg.astype(jnp.int32), axis=0),
                            axis=0, keepdims=True) == 0       # (1, LANES)
            visc = vis_ref[pl.ds(ys, 4), pl.ds(x, 1), :]
            novis = jnp.sum(jnp.sum(visc, axis=0), axis=0,
                            keepdims=True) == 0
            full = (y0 + 4 <= hv) & (x < wv)
            rl_now = act & full & nosig & novis

            cur_sig = sigc(y, x) != 0
            visv = vis_ref[y, pl.ds(x, 1), :] != 0
            ok = act & (x < wv) & (y < hv)
            in_rl_skip = (rl_mode == 1) & ((has == 0)
                                           | ((has == 1) & (r >= dy)))
            h, v, d = counts(y, x)
            zc = _zc_ctx_arith(ori, h, v, d)
            hs, vs = signs(y, x)
            sc, xr = _sc_ctx_arith(hs, vs)
            normal = is_zc & ok & ~cur_sig & ~visv & ~in_rl_skip
            first = is_sc & (has == 1) & (r == dy)

            cx = jnp.where(is_rl, CTX_RL,
                           jnp.where(is_uni, CTX_UNI,
                                     jnp.where(is_zc, zc, sc)))
            rl_i = rl_now.astype(jnp.int32)
            norm_i = normal.astype(jnp.int32)
            bf_i = ((became == 1) | first).astype(jnp.int32)
            act_i = jnp.where(is_rl, rl_i,
                              jnp.where(is_uni, has,
                                        jnp.where(is_zc, norm_i, bf_i)))
            mqs, bit = mq_decode(mqs, cx, act_i == 1)

            rl_mode = jnp.where(is_rl, rl_i, rl_mode)
            has = jnp.where(is_rl, rl_i * bit, has)
            r = jnp.where(j == 1, bit << 1, jnp.where(j == 2, r | bit, r))
            new_became = norm_i * bit
            setm = is_sc & ((became == 1) | first)
            mark_sig(y, x, bit ^ xr, bp, setm)
            became = jnp.where(is_sc, 0,
                               jnp.where(is_zc, new_became, became))
            return (mqs, rl_mode, has, r, became)

        def plane_body(bp, mqs):
            def spp_col(col, mqs):
                mqs = refresh(mqs)
                for dy in range(4):
                    mqs = spp_step(col, dy, bp, mqs)
                return mqs
            mqs = jax.lax.fori_loop(0, n_stripes * W, spp_col, mqs)

            def mrp_col(col, mqs):
                mqs = refresh(mqs)
                for dy in range(4):
                    mqs = mrp_step(col, dy, bp, mqs)
                return mqs
            mqs = jax.lax.fori_loop(0, n_stripes * W, mrp_col, mqs)

            zi = jnp.zeros((1, LANES), jnp.int32)

            def cln_col(col, carry):
                # 11 slots/column; refresh twice to stay under the
                # 31-byte staged-window budget (<=3 bytes per decision)
                mqs, rl_mode, has, r, became = carry
                carry = (refresh(mqs), rl_mode, has, r, became)
                for j in range(6):
                    carry = cln_step(col, j, bp, carry)
                mqs, rl_mode, has, r, became = carry
                carry = (refresh(mqs), rl_mode, has, r, became)
                for j in range(6, 11):
                    carry = cln_step(col, j, bp, carry)
                return carry
            carry = jax.lax.fori_loop(0, n_stripes * W, cln_col,
                                      (mqs, zi, zi, zi, zi))
            mqs = carry[0]
            vis_ref[...] = jnp.zeros((H, W, LANES), jnp.int32)
            return mqs

        # plane loop unrolled in Python: Mosaic crashes on the nested
        # fori_loop (layout check), and a constant bp folds the shifts
        mqs = mqs0
        for bp_static in range(maxbp - 1, -1, -1):
            mqs = plane_body(bp_static, mqs)
        mag2_ref[...] = val2_ref[...]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((H, W, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((H, W, LANES), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2, LANES), jnp.int32),
            pltpu.VMEM((H, W, LANES), jnp.int32),
            pltpu.VMEM((H, W, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(data, numpasses, numbps, orient, wh, mq_tbl)
    return out


def pack_for_pallas(blocks: list[dict], L: int | None = None):
    """Arrange block descriptors for pallas_t1_decode.

    Returns (data (G,32,LANES) i32, numpasses, numbps, orient (1,LANES),
    wh (2,LANES), count).  Pads the lane dim to LANES and codewords with
    0xFF (the C.3.4 end-of-data byte).
    """
    B = len(blocks)
    assert B <= LANES
    maxlen = max((len(b["data"]) for b in blocks), default=1)
    if L is None:
        # two spare 0xFF granules past the longest codeword so the staged
        # window (granules g, g+1) never reads outside the buffer
        L = max(96, -(-(maxlen + 40) // 32) * 32)
    raw = np.full((LANES, L + 1), 0xFF, dtype=np.uint8)
    npass = np.zeros((1, LANES), np.int32)
    nbps = np.zeros((1, LANES), np.int32)
    ori = np.zeros((1, LANES), np.int32)
    wh = np.ones((2, LANES), np.int32)
    for j, b in enumerate(blocks):
        d = b["data"]
        raw[j, :len(d)] = np.frombuffer(d, dtype=np.uint8)
        npass[0, j] = b["numpasses"]
        nbps[0, j] = b["numbps"]
        ori[0, j] = b["orient"]
        wh[0, j] = b["w"]
        wh[1, j] = b["h"]
    pairs = (raw[:, :L].astype(np.int32) << 8) | raw[:, 1:L + 1]
    data = np.ascontiguousarray(
        pairs.T.reshape(L // 32, 32, LANES)).astype(np.int32)
    return data, npass, nbps, ori, wh, B


def decode_bucket_pallas(blocks: list[dict], W: int, H: int):
    """decode_blocks-compatible adapter: one pallas launch per <=LANES
    blocks of a (W, H) bucket.  Returns [(mag2 int64 (h, w), neg bool)].
    Enable via GROK_T1_PALLAS=1 (TPU backends; the XLA kernel remains
    the default device path)."""
    import jax

    data, npass, nbps, ori, wh, B = pack_for_pallas(blocks)
    maxbp = -(-int(nbps.max()) // 4) * 4 if B else 4
    mag2, neg = pallas_t1_decode(
        jnp.asarray(data), jnp.asarray(npass), jnp.asarray(nbps),
        jnp.asarray(ori), jnp.asarray(wh), W, H, maxbp,
        data.shape[0] * 32, False)
    mag2 = np.asarray(mag2)
    neg = np.asarray(neg)
    return [(mag2[:b["h"], :b["w"], j].astype(np.int64),
             neg[:b["h"], :b["w"], j].astype(bool))
            for j, b in enumerate(blocks)]
