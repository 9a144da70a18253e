"""Pallas TPU kernel: batched HTJ2K cleanup-pass ENCODE.

The encode mirror of ops/pallas_ht.py: one fori iteration codes a whole
2x2 quad per the ISO 15444-15 structure — rho + sample-level context
from the rho scratch, the MEL event (carried k/run registers, spec
polarity, MSB-first run fields), the CxtVLC (rho, u_off) symbol via a
bit-sliced LUT generated from t1ht.tables.VLC_ENC at trace time, UVLC
of u = U - kappa (vertical exponent predictor from an ebot scratch
row), and up to four MagSgn fields of U bits each.  All three
sub-streams are emitted as *clean* LSB-first bit streams, append-only
into zero-initialized buffers, so every write is a pure OR of a <=
25-bit word across four staged bytes (no read-modify-clear); the host
then stuffs/interleaves them into the wire segment with the shared
assembler (t1ht.scalar.assemble_cleanup or its C mirror) — all
backends byte-identical.

EMB (round 5): when installed tables code eps_k != 0 symbols
(tables_have_ek()), the kernel computes per-sample eps bits (E_i ==
U_q), tries the (eps_k, u_off, rho) LUT entry with fallback to the
always-present eps_k = 0 entry, and suppresses the known MSB from each
sample's MagSgn field — the scalar coder's exact rule, so streams stay
byte-identical.  Two table families (initial vs non-initial quad rows)
and the UVLC prefix polarity knob are likewise trace-time state from
t1ht.tables (vlc_enc_state, keyed on tables.VERSION).

Output staging is hierarchical so the full (G, 8, lanes) buffers are
never touched per quad (the round-2 rework: the original flush+rebase
of all three full buffers every quad made the encoder ~15x slower than
the decoder):

  - 64-byte windows (16 staged words) take every or_bits write;
  - the MagSgn window (<= 12.5 B/quad advance) flushes into a 10-granule
    `mid` scratch per quad (O(10) selects) and `mid` flushes into the
    full buffer with an append-only OR once per K=16 quads;
  - MEL (<= 6 bits/quad) and VLC (<= 13 bits/quad) windows fit 16 quads
    of growth exactly, so they restage against their full buffers only
    at the outer-loop boundary.

Host wrapper (encode_ht_blocks) packs mag/sign (sign in bit 0), runs
the kernel, downloads the byte streams as packed int32 words (the axon
runtime hangs on uint8 D2H — CLAUDE.md), and assembles the cleanup
segment exactly like t1ht.scalar.ht_encode_block: byte-identical
output, same PassInfo distortions (computed host-side from mag).

Reference parity: device batch analog of the reference's HT block
encoder [grok: src/lib/core/t1/t1_ht/ht_block_encoding.cpp]
(SURVEY.md §2 row 8, §7 phase 7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def _vlc_enc_planes():
    """Bit-sliced CxtVLC encode LUT: entry = code | (len << 7) for
    idx = ((fam*N_CTX + ctx) << symb) | sym, sym = [eps_k<<5 |]
    u_off<<4 | rho (symb = 9 when any family codes EMB symbols, else
    5); 10 bit planes of nfam*N_CTX*2^symb/32 constant words each,
    indexed hi = idx >> 5 with the bit at lo = idx & 31.  fam 0 =
    non-initial row family, fam 1 = initial-row family
    (tables.two_families()).  Rebuilt from the CURRENT t1ht.tables
    state per tables.VERSION (vlc_enc_state); entry 0 = symbol absent
    (every real code has len >= 1, so entry >= 1 << 7) — the in-kernel
    EMB lookup falls back to the always-present eps_k = 0 entry, the
    same rule as the scalar coder."""
    from grok_tpu.t1ht import tables as _t
    fams = [_t.VLC_ENC]
    if _t.two_families():
        fams.append(_t.VLC_ENC_INIT)
    nfam = len(fams)
    n_ctx = _t.N_CTX
    has_ek = _t.tables_have_ek()
    symb = 9 if has_ek else 5
    ent = np.zeros(nfam * n_ctx << symb, np.int64)
    for f, enc in enumerate(fams):
        for c in range(n_ctx):
            for sym, (ln, code) in enc[c].items():
                if sym < (1 << symb):
                    ent[((f * n_ctx + c) << symb) | sym] = \
                        code | (ln << 7)
    nw = (nfam * n_ctx << symb) // 32
    planes = np.zeros((10, nw), np.int64)
    idx = np.arange(nfam * n_ctx << symb)
    hi, lo = idx >> 5, idx & 31
    for j in range(10):
        np.bitwise_or.at(planes[j], hi, ((ent >> j) & 1) << lo)
    planes_i32 = (planes & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    return planes_i32, symb, has_ek, nfam, _t.UVLC_PXOR & 7


_ENC_STATE_CACHE: dict = {}


def vlc_enc_state():
    """(table_version, (planes, symb, has_ek, nfam, pxor)) for the
    CURRENT t1ht.tables state; memoized per tables.VERSION."""
    from grok_tpu.t1ht import tables as _t
    tv = _t.VERSION
    got = _ENC_STATE_CACHE.get(tv)
    if got is None:
        _ENC_STATE_CACHE.clear()
        got = _vlc_enc_planes()
        _ENC_STATE_CACHE[tv] = got
    return tv, got


def pallas_ht_encode(mneg, pv, wh, valid,
                     W: int, H: int, S: int,
                     LMS: int, LMEL: int, LVLC: int,
                     interpret: bool = False,
                     refine: bool = False):
    tv, _ = vlc_enc_state()
    return _ht_encode_jit(mneg, pv, wh, valid, W, H, S,
                          LMS, LMEL, LVLC, interpret, refine, tv)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _ht_encode_jit(mneg, pv, wh, valid,
                   W: int, H: int, S: int,
                   LMS: int, LMEL: int, LVLC: int,
                   interpret: bool = False,
                   refine: bool = False,
                   table_version: int = 0):
    """Encode a batch of S*128 HT cleanup blocks with one Pallas kernel.

    mneg: (H, W, [S,] LANES) int32 = (mag << 1) | neg.
    pv/valid: (1|S, LANES); wh: (2, [S,] LANES).
    LMS/LMEL/LVLC: per-lane output byte capacities (multiples of 32).
    Returns (ms, mel, vlc byte buffers as (G, 32, [S,] LANES) int32 with
    one byte per entry, and bits (3, [S,] LANES) int32 bit counts).

    refine=True (the ht_planes mode): lanes with p > 0 additionally emit
    HT SigProp + HT MagRef clean bit streams for plane p-1 (raw stuffed
    wire form is applied host-side, t1ht.scalar._finish_raw) — returns
    two more byte buffers, a (5, ...) bits array, and the (H, W, ...)
    SigProp new-significance grid (for host distortion bookkeeping)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # trace-time table state (table_version in the jit key retraces on
    # install_tables): LUT planes, symbol width, EMB, families, polarity
    _, (ENC_PLANES, SYMB, HAS_EK, NFAM, PXOR) = vlc_enc_state()
    NW = ENC_PLANES.shape[1]

    GH, GW = (H + 1) // 2, (W + 1) // 2
    arr_tail = (S, LANES) if S > 1 else (LANES,)
    nd = len(arr_tail)
    lane_sh = (S, LANES) if S > 1 else (1, LANES)
    kd = S == 1

    def iota_for(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * nd, 0)

    # refine output capacities (clean bits: SigProp <= 2 bits/sample,
    # MagRef <= 1), static from the bucket dims
    LSP = _cap_bytes(W * H * 2 // 8 + 16)
    LMR = _cap_bytes(W * H // 8 + 16)
    GWP = max(GW // 2, 1)     # quad PAIRS per row (GW == 1: lone quads)
    HAS2 = GW >= 2            # static: a second quad exists in the pair
    NQP = GH * GWP
    K = min(8, NQP)           # pairs per inner block = 16 quads: the
                              # staging budgets match the pre-pair kernel
    assert NQP % K == 0, (W, H)  # callers bucket W/H to powers of two
    NO = NQP // K
    MIDG = 10                 # MagSgn mid granules: 31 B skew + 8 pairs
                              # * 25 B + 2-granule window <= 10 * 32 B

    def kernel(*refs):
        if refine:
            (mneg_ref, p_ref, wh_ref, valid_ref, lut_ref,
             ms_ref, mel_ref, vlc_ref,
             msb_ref, melb_ref, vlcb_ref,
             sp_ref, mr_ref, spb_ref, mrb_ref, ns_ref,
             rho_ref, ms_st, mel_st, vlc_st,
             ms_ba, mel_ba, vlc_ba, ms_mid, ms_mba,
             sig_ref, rf_st, rf_ba) = refs
        else:
            (mneg_ref, p_ref, wh_ref, valid_ref, lut_ref,
             ms_ref, mel_ref, vlc_ref,
             msb_ref, melb_ref, vlcb_ref,
             rho_ref, ms_st, mel_st, vlc_st,
             ms_ba, mel_ba, vlc_ba, ms_mid, ms_mba) = refs
        if S == 1:
            p_l = p_ref[...]
            val_l = valid_ref[...]
            wv = wh_ref[0:1]
            hv = wh_ref[1:2]
        else:
            p_l = p_ref[...]
            val_l = valid_ref[...]
            wv = wh_ref[0]
            hv = wh_ref[1]
        gw_l = (wv + 1) >> 1
        gh_l = (hv + 1) >> 1

        outz = [(ms_ref, LMS), (mel_ref, LMEL), (vlc_ref, LVLC)]
        if refine:
            outz += [(sp_ref, LSP), (mr_ref, LMR)]
        for ref, Lb in outz:
            ref[...] = jnp.zeros((Lb // 32, 8) + arr_tail, jnp.int32)
        # one scratch grid holds BOTH per-quad states packed as
        # (ebot << 4) | rho (rho <= 15, ebot <= 25): zero extra VMEM,
        # and the quad-above read serves context and kappa at once
        rho_ref[...] = jnp.zeros((GH + 1, GW + 2) + arr_tail, jnp.int32)
        for st in (ms_st, mel_st):
            st[...] = jnp.zeros((16,) + arr_tail, jnp.int32)
        vlc_st[...] = jnp.zeros((24,) + arr_tail, jnp.int32)
        for ba in (ms_ba, mel_ba, vlc_ba, ms_mba):
            ba[...] = jnp.zeros(lane_sh, jnp.int32)
        ms_mid[...] = jnp.zeros((MIDG, 8) + arr_tail, jnp.int32)

        siotas = {16: iota_for(16), 24: iota_for(24)}
        hiota8 = jax.lax.broadcasted_iota(jnp.int32, (NW, 1, 1), 0)
        lut = [lut_ref[j] for j in range(ENC_PLANES.shape[0])]
        qiota = iota_for(GW + 2)
        gset = {LMS // 32, LMEL // 32, LVLC // 32}
        if refine:
            gset |= {LSP // 32, LMR // 32}
        giotas = {G: jax.lax.broadcasted_iota(
            jnp.int32, (G,) + (1,) * (nd + 1), 0)
            for G in gset}
        miota = jax.lax.broadcasted_iota(
            jnp.int32, (MIDG,) + (1,) * (nd + 1), 0)
        one = jnp.int32(1)

        def restage(out_ref, st_ref, ba_ref, bp):
            """Flush the staged window at ba_ref's base, rebase to bp's
            granule.  Append-only streams: flush is a pure scatter (bytes
            past the write head are still zero).  The base lives in a
            VMEM scratch ref, NOT the loop carry: a carried base feeding
            the [None]-broadcast granule compare trips Mosaic's
            replicated-relayout crash (found by bisection; the MQ
            encoder uses the same discipline)."""
            G = out_ref.shape[0]
            giota = giotas[G]
            g_old = ba_ref[...] >> 5
            sel0 = (giota == g_old[None]).astype(jnp.int32)
            sel1 = (giota == (g_old + 1)[None]).astype(jnp.int32)
            d = out_ref[...]
            lo = st_ref[0:8]
            hi = st_ref[8:16]
            d = jnp.where(sel0 == 1, lo[None], d)
            d = jnp.where(sel1 == 1, hi[None], d)
            out_ref[...] = d
            g_new = bp >> 5
            s0 = (giota == g_new[None]).astype(jnp.int32)
            s1 = (giota == (g_new + 1)[None]).astype(jnp.int32)
            lo2 = jnp.sum(d * s0, axis=0)
            hi2 = jnp.sum(d * s1, axis=0)
            st_ref[...] = jnp.concatenate([lo2, hi2], axis=0)
            ba_ref[...] = g_new << 5

        def restage3(out_ref, st_ref, ba_ref, bp):
            """3-granule (96-byte) variant for the VLC window: the VLC
            stream can advance 15 bits/quad (7-bit CxtVLC + 8-bit
            UVLC) — 30 bytes per K=16 inner quads, past what a 64-byte
            window staged at a 32-aligned base can absorb."""
            G = out_ref.shape[0]
            giota = giotas[G]
            g_old = ba_ref[...] >> 5
            d = out_ref[...]
            for j in range(3):
                selj = (giota == (g_old + j)[None]).astype(jnp.int32)
                d = jnp.where(selj == 1, st_ref[8 * j:8 * j + 8][None], d)
            out_ref[...] = d
            g_new = bp >> 5
            parts = []
            for j in range(3):
                selj = (giota == (g_new + j)[None]).astype(jnp.int32)
                parts.append(jnp.sum(d * selj, axis=0))
            st_ref[...] = jnp.concatenate(parts, axis=0)
            ba_ref[...] = g_new << 5

        def ms_win_to_mid():
            """Scatter the MagSgn window into the mid scratch (O(MIDG)).
            Append-only streams: a plain replace of the two granules the
            window covers (mid held their previous content)."""
            rel = (ms_ba[...] >> 5) - (ms_mba[...] >> 5)   # 0..MIDG-2
            d = ms_mid[...]
            sel0 = (miota == rel[None]).astype(jnp.int32)
            sel1 = (miota == (rel + 1)[None]).astype(jnp.int32)
            d = jnp.where(sel0 == 1, ms_st[0:8][None], d)
            d = jnp.where(sel1 == 1, ms_st[8:16][None], d)
            ms_mid[...] = d

        def ms_win_rebase(bp_bytes):
            """Reload the window from mid around bp (O(MIDG))."""
            rel = (bp_bytes >> 5) - (ms_mba[...] >> 5)
            d = ms_mid[...]
            s0 = (miota == rel[None]).astype(jnp.int32)
            s1 = (miota == (rel + 1)[None]).astype(jnp.int32)
            lo2 = jnp.sum(d * s0, axis=0)
            hi2 = jnp.sum(d * s1, axis=0)
            ms_st[...] = jnp.concatenate([lo2, hi2], axis=0)
            ms_ba[...] = (bp_bytes >> 5) << 5

        def ms_mid_to_full():
            """OR mid's granules into the full buffer at [mg, mg+MIDG).
            Append-only: bits never change once written, so OR-ing a
            granule's complete content over an earlier partial flush is
            exact, and untouched granules OR with zero."""
            G = ms_ref.shape[0]
            giota = giotas[G]
            mg = ms_mba[...] >> 5
            mid = ms_mid[...]
            d = ms_ref[...]
            acc = jnp.zeros_like(d)
            zero = jnp.zeros_like(d)
            for j in range(MIDG):
                selj = (giota == (mg + j)[None]).astype(jnp.int32)
                acc = acc | jnp.where(selj == 1, mid[j][None], zero)
            ms_ref[...] = d | acc

        def ms_mid_shift(bp_bytes):
            """Slide mid so its base is bp's granule: a MIDG^2 one-hot
            gather from mid itself (granules that slide in from above
            mid's old range are past the write head, i.e. zero)."""
            mg_new = bp_bytes >> 5
            dg = mg_new - (ms_mba[...] >> 5)               # 0..8
            mid = ms_mid[...]
            parts = []
            for j in range(MIDG):
                sj = (miota == (dg + j)[None]).astype(jnp.int32)
                parts.append(jnp.sum(mid * sj, axis=0))
            ms_mid[...] = jnp.stack(parts, axis=0)
            ms_mba[...] = mg_new << 5

        def or_bits(st_ref, ba_ref, bitpos, w, mask):
            """OR the <= 25-bit word w at bit position bitpos (LSB-first)
            into the word-staged window: the field straddles at most two
            32-bit window words, so two selects.  Lane values broadcast
            through `where` (a direct (16,L)|(1,L) OR hits Mosaic's
            replicated-relayout crash)."""
            q = (bitpos >> 3) - ba_ref[...]       # byte offset 0..59
            full = w << (bitpos & 7)              # <= 32 significant bits
            wi = q >> 2
            s8 = (q & 3) << 3
            lo_part = full << s8                  # int32 wrap keeps low
            # logical high part: arithmetic shift then mask to s8 bits
            hi_part = jnp.where(
                s8 == 0, 0, (full >> (32 - s8)) & ((one << s8) - 1))
            st = st_ref[...]
            siota = siotas[st.shape[0]]
            zero = jnp.zeros_like(st)
            st = st | jnp.where((siota == wi) & mask, lo_part, zero)
            st = st | jnp.where((siota == wi + 1) & mask, hi_part, zero)
            st_ref[...] = st

        def or_bits128(st_ref, ba_ref, bitpos, ws, anymask):
            """OR up to four consecutive 32-bit words (a <= 128-bit
            field) at bit position bitpos into the staged window: ONE
            window read-modify-write instead of four (the or_bits RMW
            per write was the encoder's dominant cost).  ws values with
            no bits contribute zero, so per-word masks are not
            needed."""
            off = bitpos - (ba_ref[...] << 3)
            w0 = off >> 5
            b = off & 31
            bs = (32 - b) & 31
            st = st_ref[...]
            siota = siotas[st.shape[0]]
            zero = jnp.zeros_like(st)
            prev = jnp.zeros_like(bitpos)
            for k2 in range(5):
                cur = ws[k2] if k2 < 4 else jnp.zeros_like(bitpos)
                val = (cur << b) | jnp.where(
                    b == 0, 0, (prev >> bs) & ((one << b) - 1))
                st = st | jnp.where((siota == w0 + k2) & anymask,
                                    val, zero)
                prev = cur
            st_ref[...] = st

        def rho_read(gi, qi):
            v = rho_ref[gi, pl.ds(qi, 1)]
            if S == 1:
                return v
            return jnp.sum(v, axis=0)

        def sample(y, x):
            v = mneg_ref[y, pl.ds(x, 1)]
            if S == 1:
                return v
            return jnp.sum(v, axis=0)

        def bitlen(x):
            n = jnp.zeros_like(x)
            v = x
            big = v >= (1 << 16)
            n = n + jnp.where(big, 16, 0)
            v = jnp.where(big, v >> 16, v)
            for kbit in (8, 4, 2, 1):
                big = v >= (1 << kbit)
                n = n + jnp.where(big, kbit, 0)
                v = jnp.where(big, v >> kbit, v)
            return n + jnp.where(v >= 1, 1, 0)

        def mel_emit(ev1, ev0, k, run, word, nb):
            """Append one MEL event to a fused bit word.  ev1: event-1
            lanes; ev0: zero-event lanes (disjoint).  Spec polarity: a
            completed full run emits a 1-bit; a miss emits a 0-bit + e
            MSB-first partial-run bits."""
            e = jnp.where(k >= 12, 5,
                          jnp.where(k >= 11, 4,
                                    jnp.where(k >= 9, 3,
                                              jnp.where(k >= 6, 2,
                                                        jnp.where(k >= 3, 1,
                                                                  0)))))
            run_n = jnp.where(ev0, run + 1, run)
            full = ev0 & (run_n == (one << e))
            r5 = ((run & 1) << 4) | ((run & 2) << 2) | (run & 4) | \
                ((run & 8) >> 2) | ((run >> 4) & 1)
            w_ev = jnp.where(ev1, (r5 >> (5 - e)) << 1,
                             jnp.where(full, 1, 0))
            n_ev = jnp.where(ev1, 1 + e, jnp.where(full, 1, 0))
            word = word | (w_ev << nb)
            nb = nb + n_ev
            k = jnp.where(full, jnp.minimum(k + 1, 12),
                          jnp.where(ev1, jnp.maximum(k - 1, 0), k))
            run = jnp.where(full | ev1, 0, run_n)
            return k, run, word, nb

        def quad_stats(g, qx, act):
            """Sample gather + significance/exponent state of one quad:
            (rho, vbits, sig, Es, U, u, ebot)."""
            y0 = 2 * g
            y1 = jnp.minimum(2 * g + 1, H - 1)
            x0 = 2 * qx
            x1 = jnp.minimum(2 * qx + 1, W - 1)
            in_y1 = (2 * g + 1) < hv
            in_x1 = (2 * qx + 1) < wv
            raw = [sample(y0, x0), sample(y1, x0),
                   sample(y0, x1), sample(y1, x1)]
            inb = [act, act & in_y1, act & in_x1, act & in_y1 & in_x1]
            vs, sg, sig = [], [], []
            for i in range(4):
                mag = raw[i] >> 1
                v = jnp.where(inb[i], mag >> p_l, 0)
                vs.append(v)
                sg.append(raw[i] & 1)
                sig.append((v > 0).astype(jnp.int32))
            rho = sig[0] | (sig[1] << 1) | (sig[2] << 2) | (sig[3] << 3)
            # v_n = ((mu-1) << 1) | sign for significant samples
            vbits = []
            for i in range(4):
                vbits.append(jnp.where(sig[i] == 1,
                                       ((vs[i] - 1) << 1) | sg[i], 0))
            Es = [bitlen(v) for v in vbits]
            Emax = jnp.maximum(jnp.maximum(Es[0], Es[1]),
                               jnp.maximum(Es[2], Es[3]))
            top_p = rho_read(g, qx + 1)
            eb_above = top_p >> 4
            multi = (rho & (rho - 1)) != 0
            kappa = jnp.where(multi, jnp.maximum(1, eb_above - 1), 1)
            U = jnp.maximum(kappa, Emax)
            u = U - kappa
            ebot = jnp.maximum(
                jnp.where(sig[1] == 1, Es[1], 0),
                jnp.where(sig[3] == 1, Es[3], 0))
            return rho, vbits, sig, Es, U, u, ebot

        def lut_lookup(idx):
            hi = idx >> 5
            lo = idx & 31
            sel8 = (hiota8 == hi[None]).astype(jnp.int32)
            entry = jnp.zeros_like(idx)
            for j, cj in enumerate(lut):
                word = jnp.sum(cj * sel8, axis=0)
                entry = entry | (((word >> lo) & 1) << j)
            return entry

        def cxt_entry(fam8, c, u_off, rho, ek):
            """CxtVLC codeword via the bit-sliced LUT: (bits, len,
            ek_used).  fam8 = 8 on the initial quad-row pair when two
            table families are installed (else 0).  When the tables
            code EMB symbols (HAS_EK), the (eps_k, u_off, rho) entry is
            tried first and falls back to the always-present eps_k = 0
            entry — the scalar coder's rule, so streams stay
            byte-identical."""
            sym = (u_off << 4) | rho
            base = ((fam8 + c) << SYMB) | sym
            entry = lut_lookup(base)
            ekq = jnp.zeros_like(rho)
            if HAS_EK:
                e_ent = lut_lookup(base | (ek << 5))
                use = (ek > 0) & (e_ent != 0)
                entry = jnp.where(use, e_ent, entry)
                ekq = jnp.where(use, ek, 0)
            return entry & 0x7F, (entry >> 7) & 7, ekq

        def ctx_of(left, g, qx):
            top = rho_read(g, qx + 1) & 0xF
            topr = rho_read(g, qx + 2) & 0xF
            return ((left & 0b1100) != 0).astype(jnp.int32) | \
                (((top & 0b1010) != 0).astype(jnp.int32) << 1) | \
                (((topr & 0b0010) != 0).astype(jnp.int32) << 2)

        def uparts(u):
            """Vectorized tables.uvlc_parts (no escape: numbps <= 24 on
            the device path keeps u <= 24): (pfx_len, pfx_bits, sfx_len,
            sfx_bits)."""
            pl_ = jnp.where(u == 1, 1, jnp.where(u == 2, 2, 3))
            pb = jnp.where(u == 1, 0,
                           jnp.where(u == 2, 0b01,
                                     jnp.where(u <= 4, 0b011, 0b111)))
            sl = jnp.where(u <= 2, 0, jnp.where(u <= 4, 1, 5))
            sb = jnp.where(u <= 2, 0,
                           jnp.where(u <= 4, u - 3, u - 5))
            if PXOR:
                pb = pb ^ (PXOR & ((one << pl_) - 1))
            return pl_, pb, sl, sb

        def magsgn_emit(rho, vbits, sig, U, act, ek, ms_bp):
            """The quad's four MagSgn fields (<= 100 bits) packed into
            four 32-bit words and written with ONE window RMW.  ek:
            per-sample EMB bits — sample i emits U - ek_i bits (its
            known MSB at bit U-1 is suppressed; the decoder restores
            it)."""
            words = [jnp.zeros_like(U) for _ in range(4)]
            total = jnp.zeros_like(U)
            for i in range(4):
                m_i = act & (sig[i] == 1)
                if HAS_EK:
                    mlen = U - ((ek >> i) & 1)
                    vi = jnp.where(m_i,
                                   vbits[i] & ((one << mlen) - 1), 0)
                else:
                    mlen = U
                    vi = jnp.where(m_i, vbits[i], 0)
                wi = total >> 5
                sft = total & 31
                bs = (32 - sft) & 31
                lo = vi << sft
                hi = jnp.where(sft == 0, 0,
                               (vi >> bs) & ((one << sft) - 1))
                for j in range(4):
                    zj = jnp.zeros_like(U)
                    words[j] = words[j] | jnp.where(wi == j, lo, zj) \
                        | jnp.where(wi + 1 == j, hi, zj)
                total = total + jnp.where(m_i, mlen, 0)
            or_bits128(ms_st, ms_ba, ms_bp, words, act & (rho != 0))
            return ms_bp + total

        def pair_body(t, carry):
            (ms_bp, mel_bp, vlc_bp, k, run) = carry
            g = t // GWP
            qp = t - g * GWP
            qx0 = 2 * qp
            qx1 = 2 * qp + 1
            initial = g == 0
            act0 = (val_l == 1) & (g < gh_l) & (qx0 < gw_l)
            act1 = (val_l == 1) & (g < gh_l) & (qx1 < gw_l)

            # MagSgn window slides up to 25 B/pair: flush + rebase it
            # against the mid scratch (O(MIDG)); MEL/VLC windows absorb
            # a full inner block of K pairs and restage at outer level.
            ms_win_to_mid()
            ms_win_rebase(ms_bp >> 3)

            rho0, vb0, sig0, Es0, U0, u0, eb0 = quad_stats(g, qx0,
                                                           act0)
            left0 = rho_read(g + 1, qx0) & 0xF
            c0 = ctx_of(left0, g, qx0)
            uoff0 = act0 & (u0 > 0)
            # per-sample EMB bits: significant samples attaining the
            # exponent bound (E_i == U) have a known MSB
            if HAS_EK:
                ek0 = jnp.zeros_like(rho0)
                for i in range(4):
                    ek0 = ek0 | jnp.where((sig0[i] == 1)
                                          & (Es0[i] == U0), 1 << i, 0)
            else:
                ek0 = jnp.zeros_like(rho0)
            fam8 = jnp.where(initial, 8, 0) if NFAM == 2 else 0
            if HAS2:
                rho1, vb1, sig1, Es1, U1, u1, eb1 = quad_stats(g, qx1,
                                                               act1)
                c1 = ctx_of(rho0, g, qx1)
                uoff1 = act1 & (u1 > 0)
                if HAS_EK:
                    ek1 = jnp.zeros_like(rho1)
                    for i in range(4):
                        ek1 = ek1 | jnp.where((sig1[i] == 1)
                                              & (Es1[i] == U1),
                                              1 << i, 0)
                else:
                    ek1 = jnp.zeros_like(rho1)
            else:
                rho1 = jnp.zeros_like(rho0)
                uoff1 = act1 & False

            # -- MEL events (sig q0, sig q1, initial-pair u event) fused
            # into ONE window write --------------------------------------
            m0 = act0 & (c0 == 0)
            wm = jnp.zeros_like(rho0)
            nm = jnp.zeros_like(rho0)
            k, run, wm, nm = mel_emit(m0 & (rho0 != 0), m0 & (rho0 == 0),
                                      k, run, wm, nm)
            if HAS2:
                m1 = act1 & (c1 == 0)
                k, run, wm, nm = mel_emit(m1 & (rho1 != 0),
                                          m1 & (rho1 == 0), k, run, wm, nm)
                both = uoff0 & uoff1
                mu = act0 & initial & both
                big = mu & (u0 > 2) & (u1 > 2)
                k, run, wm, nm = mel_emit(big, mu & ~big, k, run, wm, nm)
            else:
                both = uoff0 & False
                big = both
            or_bits(mel_st, mel_ba, mel_bp, wm, nm > 0)
            mel_bp = mel_bp + nm

            # -- CxtVLC codewords of both quads, ONE window write ---------
            vw0 = (m0 & (rho0 != 0)) | (act0 & (c0 != 0))
            w_v0, n_v0, ekq0 = cxt_entry(fam8, c0,
                                         (u0 > 0).astype(jnp.int32),
                                         rho0, ek0)
            en0 = jnp.where(vw0, n_v0, 0)
            wv = jnp.where(vw0, w_v0, 0)
            if HAS2:
                vw1 = (m1 & (rho1 != 0)) | (act1 & (c1 != 0))
                w_v1, n_v1, ekq1 = cxt_entry(fam8, c1,
                                             (u1 > 0)
                                             .astype(jnp.int32),
                                             rho1, ek1)
                en1 = jnp.where(vw1, n_v1, 0)
                wv = wv | (jnp.where(vw1, w_v1, 0) << en0)
            else:
                en1 = jnp.zeros_like(en0)
                ekq1 = en1
            or_bits(vlc_st, vlc_ba, vlc_bp, wv, wv != 0)
            vlc_bp = vlc_bp + en0 + en1

            # -- pair-coupled UVLC (t1ht.scalar._emit_u_pair), ONE write --
            cu0 = u0 - jnp.where(big, 2, 0)
            pl0, pb0, sl0, sb0 = uparts(cu0)
            el0 = jnp.where(uoff0, pl0, 0)
            epb0 = jnp.where(uoff0, pb0, 0)
            esl0 = jnp.where(uoff0, sl0, 0)
            esb0 = jnp.where(uoff0, sb0, 0)
            if HAS2:
                cu1 = u1 - jnp.where(big, 2, 0)
                quirk = mu & ~big & (cu0 >= 3)
                pl1, pb1, sl1, sb1 = uparts(cu1)
                pl1 = jnp.where(quirk, 1, pl1)
                pb1 = jnp.where(quirk, cu1 - 1, pb1)
                sl1 = jnp.where(quirk, 0, sl1)
                sb1 = jnp.where(quirk, 0, sb1)
                el1 = jnp.where(uoff1, pl1, 0)
                epb1 = jnp.where(uoff1, pb1, 0)
                esl1 = jnp.where(uoff1, sl1, 0)
                esb1 = jnp.where(uoff1, sb1, 0)
            else:
                el1 = esl1 = jnp.zeros_like(el0)
                epb1 = esb1 = el1
            wu = epb0 | (epb1 << el0) | (esb0 << (el0 + el1)) | \
                (esb1 << (el0 + el1 + esl0))
            nu = el0 + el1 + esl0 + esl1
            or_bits(vlc_st, vlc_ba, vlc_bp, wu, wu != 0)
            vlc_bp = vlc_bp + nu

            # -- MagSgn + the packed (ebot << 4) | rho state row ----------
            ms_bp = magsgn_emit(rho0, vb0, sig0, U0, act0, ekq0,
                                ms_bp)
            rowr = rho_ref[g + 1]
            rowr = jnp.where((qiota == qx0 + 1) & act0,
                             rho0 | (eb0 << 4), rowr)
            if HAS2:
                ms_bp = magsgn_emit(rho1, vb1, sig1, U1, act1, ekq1,
                                    ms_bp)
                rowr = jnp.where((qiota == qx1 + 1) & act1,
                                 rho1 | (eb1 << 4), rowr)
            rho_ref[g + 1] = rowr
            return (ms_bp, mel_bp, vlc_bp, k, run)

        def outer_body(o, carry):
            carry = jax.lax.fori_loop(o * K, o * K + K, pair_body, carry)
            (ms_bp, mel_bp, vlc_bp, _, _) = carry
            # retire mid into the full buffer, slide it to bp's granule,
            # and re-aim all three windows for the next K quads
            ms_win_to_mid()
            ms_mid_to_full()
            ms_mid_shift(ms_bp >> 3)
            ms_win_rebase(ms_bp >> 3)
            restage(mel_ref, mel_st, mel_ba, mel_bp >> 3)
            restage3(vlc_ref, vlc_st, vlc_ba, vlc_bp >> 3)
            return carry

        zi = jnp.zeros(lane_sh, jnp.int32)
        carry = jax.lax.fori_loop(
            0, NO, outer_body, (zi, zi, zi, zi, zi))
        ms_bp, mel_bp, vlc_bp, _, run = carry
        # MEL termination: a pending partial run is claimed as a full
        # run (one 1-bit) so the decoder serves every remaining
        # zero-event from real bits (mel.MELEncoder.finish).  The
        # windows are already flushed — OR the bit straight into the
        # full buffer with a granule+word one-hot.
        pendm = run > 0
        mg = mel_bp >> 8                       # granule (32 bytes)
        wi = (mel_bp >> 5) & 7                 # word within granule
        bit = one << (mel_bp & 31)
        gsel = (giotas[LMEL // 32] == mg[None])
        w8iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, 8) + (1,) * nd, 1)
        d = mel_ref[...]
        mel_ref[...] = d | jnp.where(
            gsel & (w8iota == wi[None]) & pendm[None],
            bit[None], jnp.zeros_like(d))
        mel_bp = mel_bp + pendm.astype(jnp.int32)
        # one lane-shaped output per stream: a (3, L) ref would need a
        # sub-8-sublane store (Mosaic's replicated-relayout crash path)
        msb_ref[...] = ms_bp
        melb_ref[...] = mel_bp
        vlcb_ref[...] = vlc_bp

        if refine:
            # ---- HT SigProp + HT MagRef ENCODE (plane p-1, 4-row
            # stripe scan, clean bits; the raw stuffed wire form is
            # applied host-side) — mirrors t1ht.scalar._encode_sigprop
            # / _encode_magref and the decode REFINE variant's loops --
            rmask = (val_l == 1) & (p_l > 0)
            bp_l = jnp.maximum(p_l - 1, 0)
            w2iota = iota_for(W + 2)
            sig_ref[...] = jnp.zeros((H + 2, W + 2) + arr_tail, jnp.int32)
            # state: 0 none, 1 cleanup-significant, 2 SigProp-new
            vq0 = (mneg_ref[...] >> 1) >> p_l
            sig_ref[1:H + 1, 1:W + 1] = (vq0 > 0).astype(jnp.int32)
            rf_st[...] = jnp.zeros((16,) + arr_tail, jnp.int32)
            rf_ba[...] = jnp.zeros(lane_sh, jnp.int32)

            def sigc(r, x1):
                v = sig_ref[r, pl.ds(x1, 1)]
                return v if S == 1 else jnp.sum(v, axis=0)

            def sig3(r, x):
                v = (sig_ref[r, pl.ds(x, 3)] != 0).astype(jnp.int32)
                return jnp.sum(v, axis=0, keepdims=kd) if S == 1 \
                    else jnp.sum(v.reshape(3, S, LANES), axis=0)

            NC2 = max(H // 4, 1) * W
            K2 = 16
            while NC2 % K2:
                K2 //= 2

            def sp_col(col, bp):
                x = col % W
                y0 = (col // W) * 4
                for dy in range(4):
                    y = y0 + dy          # H is pow2 >= 4: stripes exact
                    act = rmask & (x < wv) & (y < hv)
                    ctr = sigc(y + 1, x + 1)
                    n9 = sig3(y, x) + sig3(y + 1, x) + sig3(y + 2, x)
                    cand = act & (ctr == 0) & (n9 > 0)
                    s = sample(y, x)
                    bit = ((s >> 1) >> bp_l) & 1
                    ng = s & 1
                    newsig = cand & (bit == 1)
                    or_bits(rf_st, rf_ba, bp,
                            jnp.where(newsig, 1 | (ng << 1), 0), newsig)
                    bp = bp + jnp.where(newsig, 2,
                                        jnp.where(cand, 1, 0))
                    rowg = sig_ref[y + 1]
                    sig_ref[y + 1] = jnp.where(
                        (w2iota == x + 1) & newsig, 2, rowg)
                return bp

            def sp_group(o, bp):
                restage(sp_ref, rf_st, rf_ba, bp >> 3)
                return jax.lax.fori_loop(o * K2, o * K2 + K2, sp_col, bp)

            zb = jnp.zeros(lane_sh, jnp.int32)
            sp_bp = jax.lax.fori_loop(0, NC2 // K2, sp_group, zb)
            restage(sp_ref, rf_st, rf_ba, sp_bp >> 3)   # final flush
            spb_ref[...] = sp_bp

            rf_st[...] = jnp.zeros((16,) + arr_tail, jnp.int32)
            rf_ba[...] = jnp.zeros(lane_sh, jnp.int32)

            def mr_col(col, bp):
                x = col % W
                y0 = (col // W) * 4
                for dy in range(4):
                    y = y0 + dy
                    act = rmask & (x < wv) & (y < hv)
                    cond = act & (sigc(y + 1, x + 1) == 1)
                    s = sample(y, x)
                    bit = ((s >> 1) >> bp_l) & 1
                    or_bits(rf_st, rf_ba, bp, jnp.where(cond, bit, 0),
                            cond & (bit == 1))
                    bp = bp + cond.astype(jnp.int32)
                return bp

            def mr_group(o, bp):
                restage(mr_ref, rf_st, rf_ba, bp >> 3)
                return jax.lax.fori_loop(o * K2, o * K2 + K2, mr_col, bp)

            mr_bp = jax.lax.fori_loop(0, NC2 // K2, mr_group, zb)
            restage(mr_ref, rf_st, rf_ba, mr_bp >> 3)
            mrb_ref[...] = mr_bp
            ns_ref[...] = (sig_ref[1:H + 1, 1:W + 1] == 2) \
                .astype(jnp.int32)

    lut_in = jnp.asarray(ENC_PLANES.reshape(
        (ENC_PLANES.shape[0], NW, 1, 1)))
    out_shape = [
        jax.ShapeDtypeStruct((LMS // 32, 8) + arr_tail, jnp.int32),
        jax.ShapeDtypeStruct((LMEL // 32, 8) + arr_tail, jnp.int32),
        jax.ShapeDtypeStruct((LVLC // 32, 8) + arr_tail, jnp.int32),
        jax.ShapeDtypeStruct(lane_sh, jnp.int32),
        jax.ShapeDtypeStruct(lane_sh, jnp.int32),
        jax.ShapeDtypeStruct(lane_sh, jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((GH + 1, GW + 2) + arr_tail, jnp.int32),  # rho+eb
        pltpu.VMEM((16,) + arr_tail, jnp.int32),             # ms stage
        pltpu.VMEM((16,) + arr_tail, jnp.int32),             # mel stage
        pltpu.VMEM((24,) + arr_tail, jnp.int32),             # vlc stage
        pltpu.VMEM(lane_sh, jnp.int32),                      # ms base
        pltpu.VMEM(lane_sh, jnp.int32),                      # mel base
        pltpu.VMEM(lane_sh, jnp.int32),                      # vlc base
        pltpu.VMEM((MIDG, 8) + arr_tail, jnp.int32),         # ms mid
        pltpu.VMEM(lane_sh, jnp.int32),                      # mid base
    ]
    if refine:
        out_shape += [
            jax.ShapeDtypeStruct((LSP // 32, 8) + arr_tail, jnp.int32),
            jax.ShapeDtypeStruct((LMR // 32, 8) + arr_tail, jnp.int32),
            jax.ShapeDtypeStruct(lane_sh, jnp.int32),
            jax.ShapeDtypeStruct(lane_sh, jnp.int32),
            jax.ShapeDtypeStruct((H, W) + arr_tail, jnp.int32),
        ]
        scratch += [
            pltpu.VMEM((H + 2, W + 2) + arr_tail, jnp.int32),  # sig grid
            pltpu.VMEM((16,) + arr_tail, jnp.int32),           # rf win
            pltpu.VMEM(lane_sh, jnp.int32),                    # rf base
        ]
    # refine outputs are ordered before the scratch slots in the
    # kernel's ref list: (ms mel vlc msb melb vlcb [sp mr spb mrb ns])
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)]
                        * len(out_shape)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(mneg, pv, wh, valid, lut_in)
    ms_b, mel_b, vlc_b, msb, melb, vlcb = outs[:6]
    streams = [msb.reshape(lane_sh), melb.reshape(lane_sh),
               vlcb.reshape(lane_sh)]

    # outputs are packed little-endian words already (word staging) —
    # flatten granules to one word axis for the host
    def flat_words(b):
        return b.reshape((b.shape[0] * 8,) + arr_tail)

    if refine:
        sp_b, mr_b, spb, mrb, ns = outs[6:]
        streams += [spb.reshape(lane_sh), mrb.reshape(lane_sh)]
        bits = jnp.stack(streams, axis=0)
        if S == 1:
            bits = bits.reshape(5, LANES)
        return (flat_words(ms_b), flat_words(mel_b), flat_words(vlc_b),
                flat_words(sp_b), flat_words(mr_b), bits, ns)
    bits = jnp.stack(streams, axis=0)
    if S == 1:
        bits = bits.reshape(3, LANES)
    return flat_words(ms_b), flat_words(mel_b), flat_words(vlc_b), bits


def encode_ht_blocks(blocks: list[dict], interpret: bool = False,
                     ht_planes: int = 0):
    """Batched device HT encode; returns per-block EncodedBlock,
    byte-identical to t1ht.scalar.ht_encode_block.

    ht_planes > 0: per-block cleanup plane min(ht_planes, numbps-1);
    blocks with an effective p > 0 run the REFINE kernel variant and
    emit cleanup + HT SigProp + HT MagRef (3 passes), like the scalar
    coder's p > 0 mode.

    blocks: {mag, neg, orient, w, h}; blocks whose streams exceed the
    staged-window bound (numbps > 24) or with numbps == 0 are handled
    by the caller / scalar path."""
    from grok_tpu.t1.t1_scalar import EncodedBlock, PassInfo

    results: list = [None] * len(blocks)
    buckets: dict[tuple, list[int]] = {}
    nbps_all = []
    p_all = []
    for i, b in enumerate(blocks):
        nbps = int(np.max(np.abs(b["mag"]))).bit_length()
        nbps_all.append(nbps)
        p_eff = min(ht_planes, nbps - 1) if nbps > 1 else 0
        p_all.append(p_eff)
        if nbps == 0:
            results[i] = EncodedBlock()
            continue
        W = H = 4
        while W < b["w"]:
            W <<= 1
        while H < b["h"]:
            H <<= 1
        buckets.setdefault((W, H, p_eff > 0), []).append(i)

    for (W, H, refine), idxs in buckets.items():
        mx = max(nbps_all[i] for i in idxs)
        # capacity from the batch's real dynamic range; staging degrades
        # (and Mosaic compiles blow up) past ~128 granules per lane
        LMS = _cap_bytes(W * H * (mx + 2) // 8 + 16)
        if mx > 24 or LMS > 128 * 32:
            from grok_tpu.t1ht.scalar import ht_encode_block
            for i in idxs:
                b = blocks[i]
                results[i] = ht_encode_block(b["mag"], b["neg"],
                                             b["orient"], p=ht_planes)
            continue
        if refine:
            _encode_refine_bucket(blocks, idxs, nbps_all, p_all, W, H,
                                  results, interpret)
            continue
        # ENCODE S stays strictly in {1, 8}: intermediate sublane counts
        # cost 20-40+ min of Mosaic compile on this kernel (CLAUDE.md).
        S = sublanes_for_ht_enc(W, H, LMS)
        if len(idxs) <= LANES:
            S = 1
        step = S * LANES
        for kc in range(0, len(idxs), step):
            chunk = idxs[kc:kc + step]
            NL = S * LANES
            mneg = np.zeros((H, W, NL), np.int32)
            pv = np.zeros((NL,), np.int32)
            wh = np.ones((2, NL), np.int32)
            valid = np.zeros((NL,), np.int32)
            for j, i in enumerate(chunk):
                b = blocks[i]
                h, w = b["mag"].shape
                mneg[:h, :w, j] = (np.asarray(b["mag"], np.int32) << 1) \
                    | np.asarray(b["neg"], np.int32)
                wh[0, j] = w
                wh[1, j] = h
                valid[j] = 1
            # MEL worst case: 2 sig events + 1 initial-pair u event per
            # pair, <= 6 bits each -> 9 bits/quad
            LMEL = _cap_bytes(((W * H // 4) * 9) // 8 + 16)
            LVLC = _cap_bytes(((W * H // 4) * 15) // 8 + 16)
            if S > 1:
                mneg_a = mneg.reshape(H, W, S, LANES)
                pv_a = pv.reshape(S, LANES)
                wh_a = wh.reshape(2, S, LANES)
                valid_a = valid.reshape(S, LANES)
            else:
                mneg_a = mneg
                pv_a = pv.reshape(1, LANES)
                wh_a = wh.reshape(2, LANES)
                valid_a = valid.reshape(1, LANES)
            ms_w, mel_w, vlc_w, bits = pallas_ht_encode(
                jnp.asarray(mneg_a), jnp.asarray(pv_a), jnp.asarray(wh_a),
                jnp.asarray(valid_a), W, H, S, LMS, LMEL, LVLC, interpret)
            ms_w = np.asarray(ms_w)
            mel_w = np.asarray(mel_w)
            vlc_w = np.asarray(vlc_w)
            bits = np.asarray(bits)

            def lane_bytes(wbuf, j, nbytes):
                if S > 1:
                    col = wbuf[:, j // LANES, j % LANES]
                else:
                    col = wbuf[:, j]
                by = np.empty(len(col) * 4, np.uint8)
                by[0::4] = col & 0xFF
                by[1::4] = (col >> 8) & 0xFF
                by[2::4] = (col >> 16) & 0xFF
                by[3::4] = (col >> 24) & 0xFF
                return by[:nbytes].tobytes()

            # wire assembly: C batch assembler when built (the Python
            # per-bit stuffing costs ~1.7 s per 1024-block launch on
            # the 1-vCPU host), byte-identical by test either way
            from grok_tpu import native
            use_c = native.available()
            if use_c:
                nb = len(chunk)
                parts, offs, bcnts = [], np.zeros((3, nb), np.int64), \
                    np.zeros((3, nb), np.int64)
                pos = 0
                for j in range(nb):
                    if S > 1:
                        bl = bits[:, j // LANES, j % LANES]
                    else:
                        bl = bits[:, j]
                    for si, wbuf in enumerate((ms_w, mel_w, vlc_w)):
                        by = lane_bytes(wbuf, j, -(-int(bl[si]) // 8))
                        parts.append(by)
                        offs[si, j] = pos
                        bcnts[si, j] = int(bl[si])
                        pos += len(by)
                buf = np.frombuffer(b"".join(parts) + b"\0", np.uint8)
                res = native.ht_assemble_batch(
                    buf, offs[0], bcnts[0], offs[1], bcnts[1],
                    offs[2], bcnts[2], np.zeros(nb, np.int32))
                if res is None:
                    # assembler capacity overflow (unreachable for
                    # in-cap blocks): fall through to the scalar
                    # assembler rather than crash on the unpack
                    use_c = False
                    from grok_tpu.t1ht.scalar import assemble_cleanup
                else:
                    out_b, olens = res
                    opos = np.cumsum(olens) - olens
                    segs = [bytes(out_b[int(o):int(o + l)])
                            for o, l in zip(opos, olens)]
            else:
                from grok_tpu.t1ht.scalar import assemble_cleanup
            for j, i in enumerate(chunk):
                b = blocks[i]
                if use_c:
                    cleanup = segs[j]
                else:
                    if S > 1:
                        ms_bits, mel_bits, vlc_bits = bits[:, j // LANES,
                                                           j % LANES]
                    else:
                        ms_bits, mel_bits, vlc_bits = bits[:, j]
                    ms = lane_bytes(ms_w, j, -(-int(ms_bits) // 8))
                    mel = lane_bytes(mel_w, j, -(-int(mel_bits) // 8))
                    vlc = lane_bytes(vlc_w, j, -(-int(vlc_bits) // 8))
                    cleanup = assemble_cleanup(
                        (ms, int(ms_bits)), (mel, int(mel_bits)),
                        (vlc, int(vlc_bits)))
                mag = np.asarray(b["mag"], np.int64)
                numbps = nbps_all[i]
                sig = mag > 0
                m = mag.astype(np.float64)
                rec = np.where(sig, m + 0.5, 0.0)
                d_total = float((m ** 2).sum())
                d_clean = d_total - float(((m - rec) ** 2).sum())
                results[i] = EncodedBlock(
                    data=cleanup, numbps=numbps,
                    passes=[PassInfo(rate=len(cleanup), dist=d_clean,
                                     term=True)],
                    seg_lens=[len(cleanup)], seg_passes=[1])
    return results


def _lane_bytes_of(wbuf, j, nbytes, S):
    if S > 1:
        col = wbuf[:, j // LANES, j % LANES]
    else:
        col = wbuf[:, j]
    by = np.empty(len(col) * 4, np.uint8)
    by[0::4] = col & 0xFF
    by[1::4] = (col >> 8) & 0xFF
    by[2::4] = (col >> 16) & 0xFF
    by[3::4] = (col >> 24) & 0xFF
    return by[:nbytes].tobytes()


def _encode_refine_bucket(blocks, idxs, nbps_all, p_all, W, H,
                          results, interpret):
    """REFINE-variant launches for one (W, H) bucket: cleanup + HT
    SigProp + HT MagRef on device, byte-identical to the scalar coder's
    p > 0 mode (pass metadata computed host-side from mag + the
    kernel's new-significance grid)."""
    from grok_tpu import native
    from grok_tpu.t1.t1_scalar import EncodedBlock, PassInfo
    from grok_tpu.t1ht.scalar import _stuff_fwd_lsb, assemble_cleanup

    def raw_wire(clean: bytes, nbits: int) -> bytes:
        out = _stuff_fwd_lsb(clean, nbits)
        if out and out[-1] == 0xFF:
            out.append(0x00)
        return bytes(out)

    mx = max(nbps_all[i] for i in idxs)
    LMS = _cap_bytes(W * H * (mx + 2) // 8 + 16)
    LMEL = _cap_bytes(((W * H // 4) * 9) // 8 + 16)
    LVLC = _cap_bytes(((W * H // 4) * 15) // 8 + 16)
    S = 1
    for kc in range(0, len(idxs), LANES):
        chunk = idxs[kc:kc + LANES]
        mneg = np.zeros((H, W, LANES), np.int32)
        pv = np.zeros((LANES,), np.int32)
        wh = np.ones((2, LANES), np.int32)
        valid = np.zeros((LANES,), np.int32)
        for j, i in enumerate(chunk):
            b = blocks[i]
            h, w = b["mag"].shape
            mneg[:h, :w, j] = (np.asarray(b["mag"], np.int32) << 1) \
                | np.asarray(b["neg"], np.int32)
            wh[0, j] = w
            wh[1, j] = h
            valid[j] = 1
            pv[j] = p_all[i]
        import jax.numpy as jnp
        ms_w, mel_w, vlc_w, sp_w, mr_w, bits, ns = pallas_ht_encode(
            jnp.asarray(mneg), jnp.asarray(pv.reshape(1, LANES)),
            jnp.asarray(wh), jnp.asarray(valid.reshape(1, LANES)),
            W, H, 1, LMS, LMEL, LVLC, interpret, True)
        ms_w = np.asarray(ms_w)
        mel_w = np.asarray(mel_w)
        vlc_w = np.asarray(vlc_w)
        sp_w = np.asarray(sp_w)
        mr_w = np.asarray(mr_w)
        bits = np.asarray(bits)
        ns = np.asarray(ns)
        use_c = native.available()
        for j, i in enumerate(chunk):
            b = blocks[i]
            p = p_all[i]
            bl = bits[:, j]
            ms = _lane_bytes_of(ms_w, j, -(-int(bl[0]) // 8), S)
            mel = _lane_bytes_of(mel_w, j, -(-int(bl[1]) // 8), S)
            vlc = _lane_bytes_of(vlc_w, j, -(-int(bl[2]) // 8), S)
            if use_c:
                cleanup = native.ht_assemble(ms, int(bl[0]), mel,
                                             int(bl[1]), vlc, int(bl[2]))
            else:
                cleanup = assemble_cleanup((ms, int(bl[0])),
                                           (mel, int(bl[1])),
                                           (vlc, int(bl[2])))
            sp_b = raw_wire(_lane_bytes_of(sp_w, j, -(-int(bl[3]) // 8),
                                           S), int(bl[3]))
            mr_b = raw_wire(_lane_bytes_of(mr_w, j, -(-int(bl[4]) // 8),
                                           S), int(bl[4]))
            h, w = b["mag"].shape
            mag = np.asarray(b["mag"], np.int64)
            new_sig = ns[:h, :w, j].astype(bool)
            # pass metadata: exactly t1ht.scalar.ht_encode_block's model
            vq = mag >> p
            sig = vq > 0
            m = mag.astype(np.float64)
            rec = np.where(sig, (vq << p).astype(np.float64)
                           + 0.5 * (1 << p), 0.0)
            d_total = float((m ** 2).sum())
            d_clean = d_total - float(((m - rec) ** 2).sum())
            bp = p - 1
            v1 = mag >> bp
            rec_sp = rec.copy()
            rec_sp[new_sig] = 1.5 * (1 << bp)
            d_sp = d_total - float(((m - rec_sp) ** 2).sum())
            rec_mr = rec_sp.copy()
            rec_mr[sig] = (v1[sig] << bp).astype(np.float64) \
                + 0.5 * (1 << bp)
            d_mr = d_total - float(((m - rec_mr) ** 2).sum())
            passes = [
                PassInfo(rate=len(cleanup), dist=d_clean, term=True),
                PassInfo(rate=len(cleanup) + len(sp_b), dist=d_sp,
                         term=True),
                PassInfo(rate=len(cleanup) + len(sp_b) + len(mr_b),
                         dist=d_mr, term=True),
            ]
            results[i] = EncodedBlock(
                data=cleanup + sp_b + mr_b, numbps=nbps_all[i],
                passes=passes,
                seg_lens=[len(cleanup), len(sp_b), len(mr_b)],
                seg_passes=[1, 1, 1])


def _cap_bytes(n: int) -> int:
    return max(64, -(-(n + 8) // 32) * 32)


def sublanes_for_ht_enc(W: int, H: int, LMS: int) -> int:
    GH, GW = (H + 1) // 2, (W + 1) // 2
    # word-packed outputs: Lb bytes cost Lb/4 int32 words per lane
    words = H * W + (GH + 1) * (GW + 2) + LMS // 4 + 512
    return 8 if words * 8 * 128 * 4 <= 11 * 2 ** 20 else 1
