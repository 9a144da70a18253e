"""Bisect the Mosaic relayout failure in pallas_ht_enc (TPU compile probe)."""
import sys
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LEVEL = int(sys.argv[1])   # how much of the kernel to include

def build(W, H, LMS, LMEL, LVLC):
    GH, GW = (H+1)//2, (W+1)//2
    arr_tail = (LANES,)
    nd = 1
    lane_sh = (1, LANES)

    def iota_for(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n,)+(1,)*nd, 0)

    def kernel(mneg_ref, p_ref, wh_ref, valid_ref,
               ms_ref, mel_ref, vlc_ref, msb_ref, melb_ref, vlcb_ref,
               rho_ref, ms_st, mel_st, vlc_st):
        p_l = p_ref[...]
        val_l = valid_ref[...]
        wv = wh_ref[0:1]; hv = wh_ref[1:2]
        gw_l = (wv+1)>>1; gh_l = (hv+1)>>1
        for ref, Lb in ((ms_ref, LMS), (mel_ref, LMEL), (vlc_ref, LVLC)):
            ref[...] = jnp.zeros((Lb//32, 32)+arr_tail, jnp.int32)
        rho_ref[...] = jnp.zeros((GH+1, GW+2)+arr_tail, jnp.int32)
        for st in (ms_st, mel_st, vlc_st):
            st[...] = jnp.zeros((64,)+arr_tail, jnp.int32)
        siota = iota_for(64)
        qiota = iota_for(GW+2)
        giotas = {G: jax.lax.broadcasted_iota(jnp.int32, (G,)+(1,)*(nd+1), 0)
                  for G in {LMS//32, LMEL//32, LVLC//32}}
        one = jnp.int32(1)

        def restage(out_ref, st_ref, base, bp):
            G = out_ref.shape[0]
            giota = giotas[G]
            d = out_ref[...]
            if LEVEL != 32:
                g_old = base >> 5
                sel0 = (giota == g_old[None]).astype(jnp.int32)
                sel1 = (giota == (g_old+1)[None]).astype(jnp.int32)
                lo = st_ref[0:32]; hi = st_ref[32:64]
                d = jnp.where(sel0 == 1, lo[None], d)
                d = jnp.where(sel1 == 1, hi[None], d)
                out_ref[...] = d
            g_new = bp >> 5
            s0 = (giota == g_new[None]).astype(jnp.int32)
            s1 = (giota == (g_new+1)[None]).astype(jnp.int32)
            lo2 = jnp.sum(d*s0, axis=0); hi2 = jnp.sum(d*s1, axis=0)
            st_ref[...] = jnp.concatenate([lo2, hi2], axis=0)
            return g_new << 5

        def or_bits(st_ref, base, bitpos, w, mask):
            q = (bitpos >> 3) - base
            sh = bitpos & 7
            lo = (w << sh)
            st = st_ref[...]
            zero = jnp.zeros_like(st)
            for k in range(4):
                byte = (lo >> (8*k)) & 0xFF
                sel = (siota == q + k) & mask
                st = st | jnp.where(sel, byte, zero)
            st_ref[...] = st

        def rho_read(gi, qi):
            return rho_ref[gi, pl.ds(qi, 1)]

        def sample(y, x):
            return mneg_ref[y, pl.ds(x, 1)]

        def bitlen(x):
            n = jnp.zeros_like(x); v = x
            big = v >= (1 << 16)
            n = n + jnp.where(big, 16, 0); v = jnp.where(big, v >> 16, v)
            for kbit in (8, 4, 2, 1):
                big = v >= (1 << kbit)
                n = n + jnp.where(big, kbit, 0); v = jnp.where(big, v >> kbit, v)
            return n + jnp.where(v >= 1, 1, 0)

        def quad_body(t, carry):
            (ms_bp, mel_bp, vlc_bp, ms_base, mel_base, vlc_base, k, run) = carry
            g = t // GW; qx = t - g*GW
            act = (val_l == 1) & (g < gh_l) & (qx < gw_l)
            ms_base = restage(ms_ref, ms_st, ms_base, ms_bp >> 3)
            mel_base = restage(mel_ref, mel_st, mel_base, mel_bp >> 3)
            vlc_base = restage(vlc_ref, vlc_st, vlc_base, vlc_bp >> 3)
            y0 = 2*g; y1 = jnp.minimum(2*g+1, H-1)
            x0 = 2*qx; x1 = jnp.minimum(2*qx+1, W-1)
            in_y1 = (2*g+1) < hv; in_x1 = (2*qx+1) < wv
            raw = [sample(y0, x0), sample(y1, x0), sample(y0, x1), sample(y1, x1)]
            inb = [act, act & in_y1, act & in_x1, act & in_y1 & in_x1]
            vs, sg, sig = [], [], []
            for i in range(4):
                mag = raw[i] >> 1
                v = jnp.where(inb[i], mag >> p_l, 0)
                vs.append(v); sg.append(raw[i] & 1)
                sig.append((v > 0).astype(jnp.int32))
            rho = sig[0] | (sig[1] << 1) | (sig[2] << 2) | (sig[3] << 3)
            if LEVEL >= 2:
                left = rho_read(g+1, qx); top = rho_read(g, qx+1); topr = rho_read(g, qx+2)
                c = (left != 0).astype(jnp.int32) | ((top != 0).astype(jnp.int32) << 1) | \
                    ((topr != 0).astype(jnp.int32) << 2)
            else:
                c = rho * 0
            is_c0 = c == 0
            if LEVEL >= 3 or LEVEL in (30, 31, 32):   # MEL
                mel_mask = act & is_c0
                e = jnp.where(k >= 12, 5, jnp.where(k >= 11, 4, jnp.where(k >= 9, 3,
                    jnp.where(k >= 6, 2, jnp.where(k >= 3, 1, 0)))))
                ev1 = mel_mask & (rho != 0); ev0 = mel_mask & (rho == 0)
                run_n = jnp.where(ev0, run + 1, run)
                full = ev0 & (run_n == (one << e))
                w_mel = jnp.where(ev1, 1 | (run << 1), 0)
                n_mel = jnp.where(ev1, 1 + e, jnp.where(full, 1, 0))
                if LEVEL not in (30, 31, 32):
                    or_bits(mel_st, mel_base, mel_bp, w_mel, ev1)
                mel_bp = mel_bp + n_mel
                if LEVEL not in (31, 32):
                    k = jnp.where(full, jnp.minimum(k+1, 12), jnp.where(ev1, jnp.maximum(k-1, 0), k))
                    run = jnp.where(full | ev1, 0, run_n)
            if LEVEL >= 4:   # VLC + UVLC
                c0_sig = act & is_c0 & (rho != 0)
                cn = act & ~is_c0
                w_vlc = jnp.where(c0_sig, rho, jnp.where(cn, (rho << 1) | (rho != 0).astype(jnp.int32), 0))
                n_vlc = jnp.where(c0_sig, 4, jnp.where(cn, jnp.where(rho != 0, 5, 1), 0))
                or_bits(vlc_st, vlc_base, vlc_bp, w_vlc, act & (w_vlc != 0))
                vlc_bp = vlc_bp + n_vlc
                umask = act & (rho != 0)
                U = jnp.maximum(jnp.maximum(bitlen(vs[0]), bitlen(vs[1])),
                                jnp.maximum(bitlen(vs[2]), bitlen(vs[3])))
                u = U - 1
                w_u = jnp.where(u == 0, 0, jnp.where(u == 1, 0b01, jnp.where(u == 2, 0b011, 7 | ((u-3) << 3))))
                n_u = jnp.where(u == 0, 1, jnp.where(u == 1, 2, jnp.where(u == 2, 3, 8)))
                or_bits(vlc_st, vlc_base, vlc_bp, w_u, umask & (w_u != 0))
                vlc_bp = vlc_bp + jnp.where(umask, n_u, 0)
            else:
                umask = act & (rho != 0)
                U = rho * 0 + 5
            if LEVEL >= 5:   # MagSgn
                umax = (one << U) - 1
                for i in range(4):
                    m_i = umask & (sig[i] == 1)
                    w = ((vs[i] - 1) & umax) | (sg[i] << U)
                    or_bits(ms_st, ms_base, ms_bp, w, m_i & (w != 0))
                    ms_bp = ms_bp + jnp.where(m_i, U + 1, 0)
            if LEVEL >= 2:
                rowr = rho_ref[g + 1]
                rho_ref[g + 1] = jnp.where((qiota == qx + 1) & act, rho, rowr)
            return (ms_bp, mel_bp, vlc_bp, ms_base, mel_base, vlc_base, k, run)

        zi = jnp.zeros(lane_sh, jnp.int32)
        carry = jax.lax.fori_loop(0, GH*GW, quad_body, (zi,)*8)
        ms_bp, mel_bp, vlc_bp, ms_base, mel_base, vlc_base, _, _ = carry
        restage(ms_ref, ms_st, ms_base, ms_bp >> 3)
        restage(mel_ref, mel_st, mel_base, mel_bp >> 3)
        restage(vlc_ref, vlc_st, vlc_base, vlc_bp >> 3)
        msb_ref[...] = ms_bp; melb_ref[...] = mel_bp; vlcb_ref[...] = vlc_bp

    return kernel, GH, GW, arr_tail, lane_sh

W = H = 32
LMS, LMEL, LVLC = 1696, 224, 480
kernel, GH, GW, arr_tail, lane_sh = build(W, H, LMS, LMEL, LVLC)
out = pl.pallas_call(
    kernel,
    out_shape=(jax.ShapeDtypeStruct((LMS//32, 32)+arr_tail, jnp.int32),
               jax.ShapeDtypeStruct((LMEL//32, 32)+arr_tail, jnp.int32),
               jax.ShapeDtypeStruct((LVLC//32, 32)+arr_tail, jnp.int32),
               jax.ShapeDtypeStruct(lane_sh, jnp.int32),
               jax.ShapeDtypeStruct(lane_sh, jnp.int32),
               jax.ShapeDtypeStruct(lane_sh, jnp.int32)),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*4,
    out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)]*6),
    scratch_shapes=[pltpu.VMEM((GH+1, GW+2)+arr_tail, jnp.int32)] +
                   [pltpu.VMEM((64,)+arr_tail, jnp.int32)]*3,
)(jnp.zeros((H, W, LANES), jnp.int32), jnp.zeros((1, LANES), jnp.int32),
  jnp.ones((2, LANES), jnp.int32), jnp.ones((1, LANES), jnp.int32))
jax.block_until_ready(out)
print(f"LEVEL {LEVEL}: compiled and ran OK")
