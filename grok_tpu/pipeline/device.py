"""Fused on-device tile decode: one upload, one download.

Host T2 parses packets and assembles per-block codewords; the device then
runs, in a single jitted program per tile geometry: batched T1 block decode
-> dequantization -> band assembly -> multi-level inverse DWT -> inverse
MCT -> DC unshift/clip.  Only the codeword buffers go up and only the final
pixels come down — critical on hosts where the device link is slow, and the
right shape everywhere (north star: "device does the bitplane math, host
does the bytes").

The jitted program is cached per geometry signature (image/tile dims,
resolutions, block layout, deltas, reduce, MCT) — geometry is
compile-time-ish state (SURVEY.md §7).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from grok_tpu.core.geometry import BAND_LL, Rect


def _pow2_at_least(v: int, lo: int = 4, hi: int = 64) -> int:
    p = lo
    while p < v and p < hi:
        p *= 2
    return p


def _make_word_stager(jnp, jax, body_d, NL):
    """Per-lane byte-window stager over the raw uploaded body, gathering
    int32 WORDS instead of bytes (4x fewer gather elements — profiled as
    the fused serving program's dominant cost) and realigning to byte
    windows with four static slices + select_n (pure vector ops).

    stage(start, ln, L, rev) -> (NL, L+1) int32 byte values, zeroed at
    and beyond each lane's length ln:
      forward: body[start + k]            for k in 0..L
      rev:     body[start + ln - 1 - k]   (VLC segments read backwards)
    """
    b = body_d.astype(jnp.int32)
    nwords = body_d.shape[0] // 4
    bw = b.reshape(nwords, 4)
    body_w = (bw[:, 0] | (bw[:, 1] << 8) | (bw[:, 2] << 16)
              | (bw[:, 3] << 24))
    wmax = nwords - 1

    def stage(start, ln, L, rev):
        nw = L // 4 + 2
        aw = jax.lax.broadcasted_iota(jnp.int32, (NL, nw), 1)
        ar = jax.lax.broadcasted_iota(jnp.int32, (NL, L + 1), 1)
        if rev:
            # k-th byte = body[r - k], r = start+ln-1.  Words descend
            # from r>>2; within a word bytes emit high-pos-first, so
            # column(k) = k + 3 - (r & 3).
            r = start + ln - 1
            w = body_w[jnp.clip((r >> 2)[:, None] - aw, 0, wmax)]
            shifts = (24, 16, 8, 0)
            c0 = 3 - (r & 3)
        else:
            # column(k) = k + (start & 3), words ascend from start>>2
            w = body_w[jnp.clip((start >> 2)[:, None] + aw, 0, wmax)]
            shifts = (0, 8, 16, 24)
            c0 = start & 3
        full = jnp.stack([(w >> s) & 0xFF for s in shifts],
                         axis=-1).reshape(NL, 4 * nw)
        cands = [full[:, a:a + L + 1] for a in range(4)]
        g = jax.lax.select_n(
            jnp.broadcast_to(c0[:, None], (NL, L + 1)), *cands)
        return jnp.where(ar < ln[:, None], g, 0)

    return stage


def _unstuff_suffix(jnp, jax, suf_f, suf_r, Dm: int):
    """Un-stuff the raw HT cleanup suffix ON DEVICE: (mel_clean,
    vlc_clean) as (NL, L+1) int32 byte arrays.

    The suffix crosses the host link exactly once (raw); both its
    readings are recovered here because the stuffing capacity rules are
    pointwise in the known wire bytes (t1ht/wire.py's vectorized host
    splitters, as XLA vector ops): MEL reads suf_f forward MSB-first
    with 7 payload bits after 0xFF; VLC reads suf_r (the word stager's
    REVERSED view, starting at the nibble byte ln-2) with the
    0x7F-after->0x8F rule.  GATHER-FREE by design (TPU gathers were
    measured to cost more than the upload saving): un-stuffing only
    DELETES bits, so clean byte j comes from source bytes j+d for a
    small d; Dm bounds d statically from the C scan's stuffing-event
    counts (typically 1), and each candidate is a STATIC slice + a
    masked select."""
    NL, L1 = suf_f.shape
    L = L1 - 1

    def rev8(x):
        x = ((x & 0x55) << 1) | ((x >> 1) & 0x55)
        x = ((x & 0x33) << 2) | ((x >> 2) & 0x33)
        return ((x & 0x0F) << 4) | ((x >> 4) & 0x0F)

    def repack(pv, nb):
        # clean byte j draws bits [8j, 8j+8) from source bytes k, k+1
        # where P[k] <= 8j < P[k+1], P = exclusive prefix sum of nb.
        # k = j + d with d in [0, Dm]; capacities >= 4 guarantee the
        # two bytes k, k+1 always cover the 8 output bits.
        pad = Dm + 2
        pvp = jnp.pad(pv, ((0, 0), (0, pad)))
        nbp = jnp.pad(nb, ((0, 0), (0, pad)), constant_values=8)
        P = jnp.cumsum(nbp, axis=1) - nbp
        j8 = 8 * jnp.arange(L)[None]
        out = jnp.zeros((NL, L), jnp.int32)
        for d in range(Dm + 1):
            off = j8 - P[:, d:d + L]
            nbd = nbp[:, d:d + L]
            cond = (off >= 0) & (off < nbd)
            offc = jnp.clip(off, 0, 7)
            val = ((pvp[:, d:d + L] >> offc)
                   | (pvp[:, d + 1:d + 1 + L] << (nbd - offc))) & 0xFF
            out = jnp.where(cond, val, out)
        return out

    # --- MEL: forward MSB-first ------------------------------------------
    prevff = jnp.concatenate(
        [jnp.zeros((NL, 1), jnp.int32), (suf_f[:, :-1] == 0xFF)
         .astype(jnp.int32)], axis=1)
    pv_mel = jnp.where(prevff == 1, rev8(suf_f & 0x7F) >> 1, rev8(suf_f))
    nb_mel = 8 - prevff
    mel = repack(pv_mel, nb_mel)

    # --- VLC: backward; suf_r[0] is the nibble byte ln-2 ------------------
    m0 = jnp.concatenate(
        [jnp.ones((NL, 1), jnp.int32), jnp.zeros((NL, L1 - 1), jnp.int32)],
        axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((NL, 1), jnp.int32), suf_r[:, :-1]], axis=1)
    is7 = (m0 == 0) & (prev > 0x8F) & (suf_r == 0x7F)
    pv_vlc = jnp.where(m0 == 1, suf_r >> 4,
                       jnp.where(is7, suf_r & 0x7F, suf_r))
    nb_vlc = jnp.where(m0 == 1, 4, jnp.where(is7, 7, 8))
    vlc = repack(pv_vlc, nb_vlc)

    pad1 = jnp.zeros((NL, 1), jnp.int32)
    return (jnp.concatenate([mel, pad1], axis=1),
            jnp.concatenate([vlc, pad1], axis=1))


@lru_cache(maxsize=64)
def _build_decode_fn(sig):
    """Compile the fused decode program for one geometry signature.

    sig is a nested tuple:
      (ncomps, mct_mode(0/1/2: none/rct/ict), reduce_r_lim..., per-comp:
        (rect, numres, r_lim, prec, sgnd, irrev,
         bands: ((r, orient, brect, delta), ...)),
       buckets: ((coder, W, H, maxbp_or_S, count,
                  blocks: ((lane, comp, r, orient, y0off, x0off, bh, bw,
                            delta, irrev), ...)), ...))
    coder "mq" runs the XLA EBCOT batch; "ht" runs the Pallas HT kernel
    (TPU backends only — gated by the caller).
    """
    import jax
    import jax.numpy as jnp

    from grok_tpu.ops import dwt as jdwt
    from grok_tpu.ops import mct as jmct
    from grok_tpu.ops.t1_dec import t1_decode_batch

    meta_tail = False
    if len(sig) == 7 and sig[6] == "mtail":
        # round 5: per-bucket meta arrays ride the TAIL of the body
        # upload (one transfer); shapes are static per sig, offsets
        # derive from the traced body shape
        (ncomps, mct_mode, fold, comps_sig, buckets_sig, group,
         _m) = sig
        meta_tail = True
    elif len(sig) == 6:
        # batched serving: comps_sig holds N streams' components
        # back-to-back; `group` components form one stream (MCT groups)
        (ncomps, mct_mode, fold, comps_sig, buckets_sig, group) = sig
    else:
        (ncomps, mct_mode, fold, comps_sig, buckets_sig) = sig
        group = ncomps

    @jax.jit
    def run(bucket_arrays, body_d=None):
        if meta_tail:
            mshapes = []
            for bs in buckets_sig:
                coder, _W, _H, extra, cnt = bs[:5]
                if coder == "mq3":
                    mshapes.append((-(-cnt // 128) * 128, 4))
                else:                       # "ht3"
                    mshapes.append((extra[0] * 128, 5))
            mtotal = sum(a * b * 4 for a, b in mshapes)
            off = body_d.shape[0] - mtotal
            rebuilt = []
            for (a, b) in mshapes:
                nb = a * b * 4
                sl = jax.lax.slice_in_dim(body_d, off, off + nb)
                meta = jax.lax.bitcast_convert_type(
                    sl.reshape(a, b, 4), jnp.int32)
                rebuilt.append((meta,))
                off += nb
            bucket_arrays = tuple(rebuilt)
        # 1. batched T1 per bucket
        bucket_out = []
        for (bs, arrs) in zip(buckets_sig, bucket_arrays):
            (coder, W, H, maxbp, _count, _blocks) = bs
            if coder == "ht3":
                # serving layout: the digest (clean MagSgn + raw
                # suffix per block) is uploaded once (body_d) and the
                # per-lane sub-stream windows are staged ON DEVICE by
                # gathers — no zero-padded staging buffers cross the
                # host link.  arrs = one (NL, 5) int32 array:
                # [ms_start, ms_len, suf_start, suf_len, p] per lane;
                # wh/valid are constants from the static block sig.
                # The gather runs at int32-WORD
                # granularity (4x fewer gather elements than per-byte —
                # the per-byte gather was the fused program's dominant
                # cost); bytes are realigned with four static slices and
                # a select_n on start&3, all vector ops.
                from grok_tpu.ops.pallas_ht import (LANES, _ht_interpret,
                                                    pallas_ht_decode)
                (S, Lms, Lsuf, Dm) = maxbp
                (meta,) = arrs
                NL = S * LANES
                stage = _make_word_stager(jnp, jax, body_d, NL)

                # the upload is the C scan's digest (serve.py): the
                # MagSgn stream already clean, plus the RAW suffix
                # (uploaded once); MEL and VLC are un-stuffed from it
                # here on device (forward view + a reversed view that
                # starts at the nibble byte ln-2)
                ms_raw = stage(meta[:, 0], meta[:, 1], Lms, False)
                suf_f = stage(meta[:, 2], meta[:, 3], Lsuf, False)
                suf_r = stage(meta[:, 2], meta[:, 3] - 1, Lsuf, True)
                mel_raw, vlc_raw = _unstuff_suffix(jnp, jax, suf_f,
                                                   suf_r, Dm)
                whc = np.ones((2, NL), np.int32)
                vld = np.zeros((NL,), np.int32)
                for (lane, _ci, _r, _o, _yo, _xo, bh, bw, _d,
                     _ir) in _blocks:
                    whc[0, lane] = bw
                    whc[1, lane] = bh
                    vld[lane] = 1
                pvl = meta[:, 4]
                if S > 1:
                    whv = jnp.asarray(whc.reshape(2, S, LANES))
                    valid = jnp.asarray(vld.reshape(S, LANES))
                    pv = pvl.reshape(S, LANES)
                else:
                    whv = jnp.asarray(whc)
                    valid = jnp.asarray(vld.reshape(1, LANES))
                    pv = pvl.reshape(1, LANES)
                out = pallas_ht_decode(ms_raw, mel_raw, vlc_raw, pv, whv,
                                       valid, W, H, S, _ht_interpret())
                if S > 1:
                    m = out.transpose(2, 3, 0, 1).reshape(S * 128, H, W)
                else:
                    m = out.transpose(2, 0, 1)
                bucket_out.append((jnp.abs(m), m < 0))
                continue
            if coder == "mq3":
                # serving layout for Part-1 streams: raw body gathers
                # feed the lockstep MQ batch decoder.  arrs = one
                # (B, 4) int32 array [start, dlen, npass, nbps]; orient
                # and (w, h) are constants from the static block sig.
                # On TPU backends the Pallas kernel decodes (13.2
                # MP/s/core at 64x64, past the host C coder); interpret
                # mode / CPU keeps the XLA kernel (a minutes-long
                # interpret trace is not a serving path).
                (L, mbp) = maxbp
                (meta,) = arrs
                B = meta.shape[0]
                oric = np.zeros((B,), np.int32)
                whc = np.ones((B, 2), np.int32)
                for (lane, _ci, _r, orient, _yo, _xo, bh, bw, _d,
                     _ir) in _blocks:
                    oric[lane] = orient
                    whc[lane] = (bw, bh)
                from grok_tpu.ops.pallas_ht import _ht_interpret
                from grok_tpu.ops.pallas_t1 import t1_pallas_enabled
                if (t1_pallas_enabled() and not _ht_interpret()
                        and W <= 64 and H <= 64):
                    from grok_tpu.ops.pallas_t1 import pallas_t1_decode
                    # quad entries at every byte position (one staged
                    # read per renorm in-kernel) + >= 2 spare granules
                    Lp = max(96, -(-(L + 72) // 32) * 32)
                    bby = _make_word_stager(jnp, jax, body_d, B)(
                        meta[:, 0], meta[:, 1], Lp + 4, False)
                    quad = (bby[:, :Lp] | (bby[:, 1:Lp + 1] << 8)
                            | (bby[:, 2:Lp + 2] << 16)
                            | (bby[:, 3:Lp + 3] << 24))
                    G = Lp // 32
                    P8 = max(8, -(-(3 * mbp) // 8) * 8)
                    mags, negs = [], []
                    for k0 in range(0, B, 128):
                        q = quad[k0:k0 + 128]
                        dl = meta[k0:k0 + 128, 1]
                        npz = meta[k0:k0 + 128, 2]
                        nbz = meta[k0:k0 + 128, 3]
                        data = q.reshape(128, G, 32).transpose(1, 2, 0)
                        # default-style single segment [0, dlen) opens
                        # at pass 0; every later pass continues
                        ptbl = jnp.full((3, P8, 128), -1, jnp.int32)
                        ptbl = ptbl.at[0, 1:].set(-1).at[1].set(0) \
                            .at[2].set(0)
                        ptbl = ptbl.at[0, 0].set(0)
                        ptbl = ptbl.at[1, 0].set(dl)
                        out = pallas_t1_decode(
                            data, npz.reshape(1, 128),
                            nbz.reshape(1, 128),
                            jnp.asarray(oric[k0:k0 + 128]
                                        .reshape(1, 128)),
                            jnp.asarray(whc[k0:k0 + 128].T.copy()),
                            ptbl,
                            jnp.zeros((1, 128), jnp.int32),
                            W, H, mbp, 1, False)
                        m = out.transpose(2, 0, 1)
                        mags.append(jnp.abs(m))
                        negs.append(m < 0)
                    bucket_out.append((jnp.concatenate(mags, axis=0),
                                       jnp.concatenate(negs, axis=0)))
                    continue
                bby = _make_word_stager(jnp, jax, body_d, B)(
                    meta[:, 0], meta[:, 1], L, False)
                data16 = (bby[:, :L] << 8) | bby[:, 1:]
                mag2, neg = t1_decode_batch(
                    data16, meta[:, 1], meta[:, 2], meta[:, 3],
                    jnp.asarray(oric), jnp.asarray(whc), W, H, mbp, fold)
                bucket_out.append((mag2, neg))
                continue
            if coder == "ht":
                from grok_tpu.ops.pallas_ht import (_ht_interpret,
                                                    pallas_ht_decode)
                S = maxbp
                ms_d, mel_d, vlc_d, pv, whv, valid = arrs
                out = pallas_ht_decode(ms_d, mel_d, vlc_d, pv, whv, valid,
                                       W, H, S, _ht_interpret())
                if S > 1:
                    m = out.transpose(2, 3, 0, 1).reshape(S * 128, H, W)
                else:
                    m = out.transpose(2, 0, 1)
                bucket_out.append((jnp.abs(m), m < 0))
                continue
            data16, dlen, npass, nbps, ori, wh = arrs
            mag2, neg = t1_decode_batch(data16, dlen, npass, nbps, ori, wh,
                                        W, H, maxbp, fold)
            bucket_out.append((mag2, neg))

        # 2. dequantize + scatter into band arrays (static placements)
        band_arrays = {}
        for ci, comp_sig in enumerate(comps_sig):
            (_rect, numres, r_lim, _prec, _sgnd, irrev, bands) = comp_sig
            for (r, orient, brect, _delta) in bands:
                bh = brect[3] - brect[1]
                bw = brect[2] - brect[0]
                dt = jnp.float32 if irrev else jnp.int32
                band_arrays[(ci, r, orient)] = jnp.zeros((bh, bw), dtype=dt)
        for (bs, (mag2, neg)) in zip(buckets_sig, bucket_out):
            (_coder, _W, _H, _maxbp, _count, blocks) = bs
            for (lane, ci, r, orient, yoff, xoff, bh, bw, delta,
                 irrev) in blocks:
                m2 = mag2[lane, :bh, :bw]
                ng = neg[lane, :bh, :bw]
                if irrev:
                    sign = jnp.where(ng, -1.0, 1.0)
                    vals = (sign * m2.astype(jnp.float32)
                            * jnp.float32(delta * 0.5))
                else:
                    vals = jnp.where(ng, -(m2 >> 1), m2 >> 1)
                key = (ci, r, orient)
                band_arrays[key] = jax.lax.dynamic_update_slice(
                    band_arrays[key], vals.astype(band_arrays[key].dtype),
                    (yoff, xoff))

        # 3. inverse DWT per component
        outs = []
        for ci, comp_sig in enumerate(comps_sig):
            (rect_t, numres, r_lim, prec, sgnd, irrev, bands) = comp_sig
            rect = Rect(*rect_t)
            bands_list = [band_arrays[(ci, 0, BAND_LL)]]
            for r in range(1, r_lim):
                bands_list.append((band_arrays[(ci, r, 1)],
                                   band_arrays[(ci, r, 2)],
                                   band_arrays[(ci, r, 3)]))
            cur = bands_list[0]
            nl = numres - 1
            for r in range(1, r_lim):
                s = 1 << (nl - r)
                rrect = rect.ceil_scale(s, s)
                hl, lh, hh = bands_list[r]
                cur = jdwt.inv_2d_level(cur, hl, lh, hh, rrect, irrev)
            outs.append(cur)

        # 4. inverse MCT + DC unshift/clip (per stream group when batched)
        if mct_mode and group >= 3:
            for g0 in range(0, ncomps, group):
                if mct_mode == 2:    # ICT
                    r_, g_, b_ = jmct.ict_inv(outs[g0], outs[g0 + 1],
                                              outs[g0 + 2])
                else:                # RCT
                    r_, g_, b_ = jmct.rct_inv(outs[g0], outs[g0 + 1],
                                              outs[g0 + 2])
                outs[g0], outs[g0 + 1], outs[g0 + 2] = r_, g_, b_
        final = []
        for ci, comp_sig in enumerate(comps_sig):
            (_rect, _numres, _r_lim, prec, sgnd, irrev, _bands) = comp_sig
            arr = outs[ci]
            if irrev or (mct_mode == 2 and (ci % group) < 3):
                arr = jnp.rint(arr).astype(jnp.int32)
            final.append(jmct.dc_shift_inv(arr.astype(jnp.int32), prec,
                                           sgnd))
        return tuple(final)

    return run


def decode_tile_device(jobs, geo, dp) -> list[np.ndarray]:
    """Run the fused device decode for one tile.

    jobs: block descriptors from pipeline.tile (data/seg_lens/numpasses/
    numbps/orient/w/h/comp/res/band_i/rect); all must be default-style,
    single-segment.  Returns per-component pixel arrays (int32).
    """
    import jax.numpy as jnp

    from grok_tpu.core.params import CBLK_HT
    from grok_tpu.ops.t1_dec import pack_pairs

    # bucket blocks by (coder, padded shape)
    buckets: dict[tuple[str, int, int], list[int]] = {}
    for i, j in enumerate(jobs):
        coder = "ht" if j["style"] & CBLK_HT else "mq"
        key = (coder, _pow2_at_least(j["w"]), _pow2_at_least(j["h"]))
        buckets.setdefault(key, []).append(i)

    def block_sig(lane, j):
        c = j["comp"]
        r = j["res"]
        bg_rect = geo.tcgs[c].resolutions[r].bands[j["band_i"]].rect
        return (lane, c, r, j["orient"] if r > 0 else BAND_LL,
                j["rect"].y0 - bg_rect.y0, j["rect"].x0 - bg_rect.x0,
                j["rect"].h, j["rect"].w,
                float(geo.quants[c].delta(r, j["orient"])),
                bool(geo.styles[c].irreversible))

    bucket_sigs = []
    bucket_arrays = []
    for (coder, W, H), idxs in sorted(buckets.items()):
        B = len(idxs)
        if coder == "ht":
            from grok_tpu.ops.pallas_ht import (LANES, pack_ht_for_pallas,
                                                parse_ht_header,
                                                sublanes_for_count,
                                                sublanes_for_ht)
            mx = 1
            for i in idxs:
                j = jobs[i]
                if "_ht_hdr" not in j:
                    j["_ht_hdr"] = parse_ht_header(
                        j["data"], j.get("seg_lens") or [len(j["data"])])
                mx = max(mx, max(len(s) for s in j["_ht_hdr"][:3]))
            S = sublanes_for_count(B, sublanes_for_ht(W, H, mx))
            # one HT launch per S*LANES chunk of the bucket
            for k in range(0, B, S * LANES):
                chunk = idxs[k:k + S * LANES]
                packed = pack_ht_for_pallas([jobs[i] for i in chunk], S)
                blocks_sig = tuple(block_sig(lane, jobs[i])
                                   for lane, i in enumerate(chunk))
                bucket_sigs.append(("ht", W, H, S, len(chunk), blocks_sig))
                bucket_arrays.append(tuple(jnp.asarray(a) for a in packed))
            continue
        maxlen = max(len(jobs[i]["data"]) for i in idxs)
        L = max(8, -(-maxlen // 64) * 64)
        data = np.zeros((B, L), dtype=np.uint8)
        dlen = np.zeros((B,), dtype=np.int32)
        npass = np.zeros((B,), dtype=np.int32)
        nbps = np.zeros((B,), dtype=np.int32)
        ori = np.zeros((B,), dtype=np.int32)
        wh = np.zeros((B, 2), dtype=np.int32)
        blocks_sig = []
        for lane, i in enumerate(idxs):
            j = jobs[i]
            d = j["data"]
            data[lane, :len(d)] = np.frombuffer(d, dtype=np.uint8)
            dlen[lane] = len(d)
            npass[lane] = j["numpasses"]
            nbps[lane] = j["numbps"]
            ori[lane] = j["orient"]
            wh[lane] = (j["w"], j["h"])
            blocks_sig.append(block_sig(lane, j))
        maxbp = -(-int(nbps.max()) // 4) * 4 if B else 4
        bucket_sigs.append(("mq", W, H, maxbp, B, tuple(blocks_sig)))
        bucket_arrays.append((jnp.asarray(pack_pairs(data)),
                              jnp.asarray(dlen), jnp.asarray(npass),
                              jnp.asarray(nbps), jnp.asarray(ori),
                              jnp.asarray(wh)))

    comps_sig = []
    for c, tcg in enumerate(geo.tcgs):
        cs = geo.styles[c]
        numres = cs.num_resolutions
        r_lim = max(numres - dp.reduce, 1) if dp.reduce else numres
        bands = []
        for rg in tcg.resolutions:
            if rg.r >= r_lim:
                continue
            for bg in rg.bands:
                bands.append((rg.r, bg.orient,
                              (bg.rect.x0, bg.rect.y0, bg.rect.x1,
                               bg.rect.y1),
                              float(geo.quants[c].delta(rg.r, bg.orient))))
        rect = geo.comp_rects[c]
        # prec for DC shift comes from the image component
        comps_sig.append((
            (rect.x0, rect.y0, rect.x1, rect.y1), numres, r_lim,
            None, None, bool(cs.irreversible), tuple(bands)))

    return comps_sig, bucket_sigs, bucket_arrays


def run_device_decode(jobs, geo, hdr, dp, keep_device: bool = False):
    """Fused decode; keep_device=True returns device-resident jnp arrays
    (no host download — the serving path: pixels stay in HBM for the
    consumer)."""
    comps_sig, bucket_sigs, bucket_arrays = decode_tile_device(jobs, geo, dp)
    # fill in prec/sgnd from the main header
    comps_sig = [
        (cs[0], cs[1], cs[2], hdr.comps[ci].prec, hdr.comps[ci].sgnd,
         cs[5], cs[6])
        for ci, cs in enumerate(comps_sig)]
    from grok_tpu.ops.t1_dec import default_fold
    mct_mode = 0
    if geo.cod.mct and len(comps_sig) >= 3:
        mct_mode = 2 if geo.styles[0].irreversible else 1
    sig = (len(comps_sig), mct_mode, default_fold(), tuple(comps_sig),
           tuple(bucket_sigs))
    fn = _build_decode_fn(sig)
    out = fn(tuple(bucket_arrays))
    if keep_device:
        return list(out)
    return [np.asarray(a) for a in out]
