"""Batched Tier-1 (EBCOT/MQ) block ENCODER for the device — JAX.

Mirror of ops/t1_dec.py: B code-blocks encode in lockstep, one lane per
block, branch-free MQ coder with masked lanes.  Default code-block style,
single codeword segment (the host scalar coder handles special styles).

Device outputs: codeword bytes, per-pass byte watermarks (the PCRD rate
points), and a significance-type map (SPP vs CLN, at the magnitude MSB
plane) from which the host reconstructs the exact per-pass distortion that
the scalar encoder logs — so PCRD sees identical (R, D) envelopes.

[grok: src/lib/core/t1/t1_part1/ encoder; ISO 15444-1 C.2/D.4]
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from grok_tpu.ops.t1_dec import (_SC_CTX, _SC_XOR, _counts, _get2d, _nbhd,
                                 _sc_ctx, _set2d, _set_center, _zc_ctx)
from grok_tpu.t1.mq import MQ_NLPS, MQ_NMPS, MQ_QE, MQ_SWITCH
from grok_tpu.t1.t1_scalar import EncodedBlock, PassInfo, pass_schedule

N_CTX = 19
CTX_RL = 17
CTX_UNI = 18

_QE = jnp.asarray(MQ_QE, dtype=jnp.uint32)
_NMPS = jnp.asarray(MQ_NMPS, dtype=jnp.int32)
_NLPS = jnp.asarray(MQ_NLPS, dtype=jnp.int32)
_SWITCH = jnp.asarray(MQ_SWITCH, dtype=jnp.int32)

SIG_NONE, SIG_SPP, SIG_CLN = 0, 1, 2


def _initial_ctx(b: int):
    st = np.zeros((b, N_CTX), dtype=np.int32)
    st[:, CTX_UNI] = 46
    st[:, CTX_RL] = 3
    st[:, 0] = 4
    return jnp.asarray(st)


# ---------------------------------------------------------------------------
# Vector MQ encoder
# ---------------------------------------------------------------------------
# enc state: (a, c, ct, bp, out) — out (B, L) uint8 with carry sentinel at
# index 0; bp indexes the last written byte ("B" of C.2.6).

def _out_get(out, bp):
    idx = jnp.clip(bp, 0, out.shape[1] - 1)
    return jnp.take_along_axis(out, idx[:, None].astype(jnp.int32),
                               axis=1)[:, 0].astype(jnp.uint32)


def _out_set(out, bp, val, m):
    idx = jnp.clip(bp, 0, out.shape[1] - 1)
    cur = _out_get(out, bp)
    new = jnp.where(m, val & 0xFF, cur).astype(jnp.uint8)
    return jnp.put_along_axis(out, idx[:, None].astype(jnp.int32),
                              new[:, None], axis=1, inplace=False)


def _byteout(st, m):
    """Masked BYTEOUT (C.2.6)."""
    a, c, ct, bp, out = st
    cur = _out_get(out, bp)
    is_ff = cur == 0xFF
    nocarry = c < 0x8000000
    # carry branch: out[bp] += 1 (may become 0xFF)
    carry = m & ~is_ff & ~nocarry
    out = _out_set(out, bp, cur + 1, carry)
    cur2 = jnp.where(carry, cur + 1, cur)
    now_ff = cur2 == 0xFF
    # emit-7 (after 0xFF): write c>>20, keep low 20 bits, ct=7
    emit7 = m & (is_ff | (~nocarry & now_ff))
    # emit-8: write c>>19, keep low 19 bits, ct=8
    emit8 = m & ~emit7
    c_pre = jnp.where(m & ~is_ff & ~nocarry & now_ff, c & 0x7FFFFFF, c)
    bp2 = jnp.where(m, bp + 1, bp)
    val = jnp.where(emit7, c_pre >> 20, c_pre >> 19)
    out = _out_set(out, bp2, val, m)
    c2 = jnp.where(emit7, c_pre & 0xFFFFF, c_pre & 0x7FFFF)
    c3 = jnp.where(m, c2, c)
    ct2 = jnp.where(emit7, 7, 8)
    ct3 = jnp.where(m, ct2, ct)
    return (a, c3, ct3, bp2, out)


def _enc_renorm(st, need):
    """C.2.8 RENORME as a bounded 3-chunk unroll (see t1_dec._renorm: the
    TPU compiler cannot handle while_loops inside the scan nest).

    Shift-first do-while: shift in chunks bounded by CT, firing BYTEOUT
    when CT reaches 0 (BYTEOUT restores CT >= 7; n <= 15, encoder CT <= 13,
    so three chunks suffice).
    """
    a, c, ct, bp, out = st
    bl = (jnp.floor(jnp.log2(jnp.maximum(a, 1).astype(jnp.float32)))
          .astype(jnp.int32) + 1)
    n = jnp.where(need, 16 - bl, 0)
    for _ in range(3):
        m = n > 0
        s = jnp.minimum(n, ct).astype(jnp.uint32)
        a = jnp.where(m, (a << s) & 0xFFFF, a)
        c = jnp.where(m, (c << s) & 0xFFFFFFF, c)
        ct = jnp.where(m, ct - s.astype(jnp.int32), ct)
        n = n - s.astype(jnp.int32)
        fire = m & (ct == 0)
        a, c, ct, bp, out = _byteout((a, c, ct, bp, out), fire)
    return (a, c, ct, bp, out)


def mq_encode(state, d, cx, active):
    """Masked MQ ENCODE (C.2.5).  d: (B,) bit, cx: (B,) context ids."""
    enc, ctx_state, ctx_mps = state
    a, c, ct, bp, out = enc

    onehot = (jnp.arange(N_CTX)[None, :] == cx[:, None])
    i = jnp.sum(jnp.where(onehot, ctx_state, 0), axis=1)
    mps = jnp.sum(jnp.where(onehot, ctx_mps, 0), axis=1)

    qe = jnp.take(_QE, i)
    a1 = a - qe
    msb = (a1 & 0x8000) != 0
    small = a1 < qe
    is_mps = d == mps

    # c and a updates
    add_c = jnp.where(is_mps, msb | ~small, small)
    c2 = jnp.where(active & add_c, c + qe, c)
    set_a_qe = jnp.where(is_mps, ~msb & small, ~small)
    a2 = jnp.where(active, jnp.where(set_a_qe, qe, a1), a)
    a2 = jnp.where(active & is_mps & msb, a1, a2)

    renorm_needed = jnp.where(is_mps, ~msb, jnp.ones_like(msb))
    upd = active & renorm_needed
    new_i = jnp.where(is_mps, jnp.take(_NMPS, i), jnp.take(_NLPS, i))
    flip = ~is_mps & (jnp.take(_SWITCH, i) == 1)
    new_mps = jnp.where(flip, 1 - mps, mps)
    ctx_state = jnp.where(onehot & upd[:, None], new_i[:, None], ctx_state)
    ctx_mps = jnp.where(onehot & upd[:, None], new_mps[:, None], ctx_mps)

    enc = _enc_renorm((a2, c2, ct, bp, out), upd)
    return (enc, ctx_state, ctx_mps)


def mq_flush(enc, active):
    """C.2.9 FLUSH.  Returns (enc, final_len (B,)) — sentinel excluded."""
    a, c, ct, bp, out = enc
    tempc = c + a
    c1 = c | 0xFFFF
    c1 = jnp.where(c1 >= tempc, c1 - 0x8000, c1)
    c1 = jnp.where(active, c1, c)
    enc = (a, (c1 << ct) & 0xFFFFFFF, ct, bp, out)
    enc = _byteout(enc, active)
    a, c2, ct2, bp2, out = enc
    enc = (a, (c2 << ct2) & 0xFFFFFFF, ct2, bp2, out)
    enc = _byteout(enc, active)
    a, c3, ct3, bp3, out = enc
    last = _out_get(out, bp3)
    bp4 = jnp.where(active & (last != 0xFF), bp3 + 1, bp3)
    return (a, c3, ct3, bp4, out), jnp.maximum(bp4 - 1, 0)


# ---------------------------------------------------------------------------
# Encode passes
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(5, 6, 7, 8))
def t1_encode_batch(mag, neg, orient, numbps, msbmap,
                    W: int, H: int, maxbp: int, L: int):
    """Encode B code-blocks in lockstep.

    mag: (B, H, W) int32 magnitudes; neg: (B, H, W) bool; orient: (B,);
    numbps: (B,) per-lane magnitude bitplane counts (host-exact);
    msbmap: (B, H, W) int32 per-position MSB plane (-1 where mag == 0).
    Blocks are bucketed by their EXACT (w, h) — no padding, because padded
    positions would be entropy-coded as insignificant samples.
    Returns (out (B,L) uint8 [sentinel at 0], lengths (B,),
             rates (B, 3*maxbp) int32 conservative per-pass watermarks,
             sigtype (B, H, W) int8).
    """
    B = mag.shape[0]

    enc0 = (jnp.full((B,), 0x8000, jnp.uint32),
            jnp.zeros((B,), jnp.uint32),
            jnp.full((B,), 12, jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, L), jnp.uint8))
    mqs = (enc0, _initial_ctx(B), jnp.zeros((B, N_CTX), jnp.int32))

    sig = jnp.zeros((B, H + 2, W + 2), dtype=jnp.int32)
    sgn = jnp.zeros((B, H + 2, W + 2), dtype=jnp.int32)
    visited = jnp.zeros((B, H, W), dtype=jnp.int32)
    sigtype = jnp.zeros((B, H, W), dtype=jnp.int8)
    rates = jnp.zeros((B, 3 * maxbp), dtype=jnp.int32)

    n_stripes = (H + 3) // 4
    npass_max = 3 * maxbp

    def magbit(y, x, bp):
        v = jax.lax.dynamic_slice(mag, (0, y, x), (B, 1, 1))[:, 0, 0]
        return ((v >> bp) & 1).astype(jnp.int32)

    def negbit(y, x):
        v = jax.lax.dynamic_slice(neg, (0, y, x), (B, 1, 1))[:, 0, 0]
        return v.astype(jnp.int32)

    def mark_sig(sig, sgn, sigtype, y, x, nb, stype, m):
        sig = _set_center(sig, y, x, jnp.ones((B,), jnp.int32), m)
        sgn = _set_center(sgn, y, x, jnp.where(nb == 1, -1, 1), m)
        sigtype = _set2d(sigtype, y, x,
                         jnp.full((B,), stype, jnp.int8), m)
        return sig, sgn, sigtype

    def plane_body(pi, state):
        mqs, sig, sgn, visited, sigtype, rates = state
        bp = maxbp - 1 - pi
        k_lane = numbps - 1 - bp
        act_spp = k_lane >= 1
        act_mrp = k_lane >= 1
        act_cln = k_lane >= 0

        def record(rates, passno_lane, mqs, act):
            # conservative per-pass rate watermark: bytes so far + 5 slack
            bp_bytes = mqs[0][3]            # enc bp index == numbytes
            val = bp_bytes + 5
            oh = (jnp.arange(npass_max)[None, :] == passno_lane[:, None])
            return jnp.where(oh & act[:, None], val[:, None], rates)

        # -- significance propagation: one position per iteration ----------
        def spp_step(i, carry):
            mqs, sig, sgn, visited, sigtype = carry
            dy = i % 4
            col = i // 4
            x = col % W
            y = (col // W) * 4 + dy
            cur_sig = _get2d(sig, y + 1, x + 1) != 0
            vis = _get2d(visited, y, x) != 0
            zc = _zc_ctx(sig, y, x, orient)
            coded = act_spp & ~cur_sig & ~vis & (zc != 0)
            bit = magbit(y, x, bp)
            mqs = mq_encode(mqs, bit, zc, coded)
            became = coded & (bit == 1)
            sc, xr = _sc_ctx(sgn, y, x)
            nb = negbit(y, x)
            mqs = mq_encode(mqs, nb ^ xr, sc, became)
            sig, sgn, sigtype = mark_sig(sig, sgn, sigtype, y, x, nb,
                                         SIG_SPP, became)
            visited = _set2d(visited, y, x, jnp.ones((B,), jnp.int32),
                             coded)
            return (mqs, sig, sgn, visited, sigtype)

        # -- magnitude refinement: one position per iteration --------------
        def mrp_step(i, carry):
            mqs, sig, visited, sigtype = carry
            dy = i % 4
            col = i // 4
            x = col % W
            y = (col // W) * 4 + dy
            cur_sig = _get2d(sig, y + 1, x + 1) != 0
            vis = _get2d(visited, y, x) != 0
            coded = act_mrp & cur_sig & ~vis
            # refined-before: first MRP happens one plane below the MSB
            msb = _get2d(msbmap, y, x)
            ref_before = msb > bp + 1
            h, vv, d = _counts(sig, y, x)
            mr = jnp.where(ref_before, 16,
                           jnp.where(h + vv + d > 0, 15, 14))
            bit = magbit(y, x, bp)
            mqs = mq_encode(mqs, bit, mr, coded)
            return (mqs, sig, visited, sigtype)

        # -- cleanup: 11 slots per stripe-column, one decision each --------
        def cln_step(i, carry):
            mqs, sig, sgn, visited, sigtype, regs = carry
            rl_mode, has, r, became = regs
            j = i % 11
            col = i // 11
            x = col % W
            y0 = (col // W) * 4
            dy = jnp.clip((j - 3) // 2, 0, 3)
            y = y0 + dy
            is_rl = j == 0
            is_uni = (j == 1) | (j == 2)
            is_zc = (j >= 3) & ((j - 3) % 2 == 0)
            is_sc = (j >= 3) & ((j - 3) % 2 == 1)

            # run-length eligibility (see t1_dec.cln_step)
            seg = jax.lax.dynamic_slice(sig, (0, y0, x), (B, 6, 3))
            nosig = jnp.sum(seg, axis=(1, 2)) == 0
            visc = jax.lax.dynamic_slice(visited, (0, y0, x), (B, 4, 1))
            novis = jnp.sum(visc, axis=(1, 2)) == 0
            full = jnp.full((B,), True) if H % 4 == 0 else \
                jnp.full((B,), y0 + 4 <= H)
            rl_now = act_cln & full & nosig & novis

            # the column's 4 magnitude bits (for rl decision and r)
            mcol = jax.lax.dynamic_slice(mag, (0, y0, x), (B, 4, 1))[:, :, 0]
            bits4 = (mcol >> bp) & 1
            any1 = jnp.sum(bits4, axis=1) > 0
            rfirst = jnp.argmax(bits4, axis=1).astype(jnp.int32)

            cur_sig = _get2d(sig, y + 1, x + 1) != 0
            vis = _get2d(visited, y, x) != 0
            in_rl_skip = rl_mode & (~has | (has & (r >= dy)))
            normal = is_zc & act_cln & ~cur_sig & ~vis & ~in_rl_skip
            first = is_sc & has & (r == dy)

            zc = _zc_ctx(sig, y, x, orient)
            sc, xr = _sc_ctx(sgn, y, x)
            bit_zc = magbit(y, x, bp)
            nb = negbit(y, x)

            cx = jnp.where(is_rl, CTX_RL,
                           jnp.where(is_uni, CTX_UNI,
                                     jnp.where(is_zc, zc, sc)))
            setm = is_sc & (became | first)
            d_bit = jnp.where(is_rl, jnp.where(any1, 1, 0),
                              jnp.where(j == 1, (r >> 1) & 1,
                                        jnp.where(j == 2, r & 1,
                                                  jnp.where(is_zc, bit_zc,
                                                            nb ^ xr))))
            active = jnp.where(is_rl, rl_now,
                               jnp.where(is_uni, has,
                                         jnp.where(is_zc, normal, setm)))
            mqs = mq_encode(mqs, d_bit, cx, active)

            # register updates
            rl_mode = jnp.where(is_rl, rl_now, rl_mode)
            has = jnp.where(is_rl, rl_now & any1, has)
            r = jnp.where(is_rl, rfirst, r)
            new_became = normal & (bit_zc == 1)

            sig, sgn, sigtype = mark_sig(sig, sgn, sigtype, y, x, nb,
                                         SIG_CLN, setm)
            became = jnp.where(is_sc, jnp.zeros_like(became), new_became)
            return (mqs, sig, sgn, visited, sigtype,
                    (rl_mode, has, r, became))

        carry = (mqs, sig, sgn, visited, sigtype)
        carry = jax.lax.fori_loop(0, n_stripes * W * 4, spp_step, carry)
        mqs, sig, sgn, visited, sigtype = carry
        rates = record(rates, 3 * k_lane - 2, mqs, act_spp)
        carry = (mqs, sig, visited, sigtype)
        carry = jax.lax.fori_loop(0, n_stripes * W * 4, mrp_step, carry)
        mqs, sig, visited, sigtype = carry
        rates = record(rates, 3 * k_lane - 1, mqs, act_mrp)
        zerosb = jnp.zeros((B,), dtype=bool)
        regs = (zerosb, zerosb, jnp.zeros((B,), jnp.int32), zerosb)
        carry = (mqs, sig, sgn, visited, sigtype, regs)
        carry = jax.lax.fori_loop(0, n_stripes * W * 11, cln_step, carry)
        mqs, sig, sgn, visited, sigtype, _ = carry
        rates = record(rates, 3 * k_lane, mqs, act_cln)
        visited = jnp.zeros_like(visited)
        return (mqs, sig, sgn, visited, sigtype, rates)

    state = (mqs, sig, sgn, visited, sigtype, rates)
    state = jax.lax.fori_loop(0, maxbp, plane_body, state)
    mqs, sig, sgn, visited, sigtype, rates = state
    enc, _, _ = mqs
    enc, final_len = mq_flush(enc, numbps > 0)
    return enc[4], final_len, rates, sigtype


# ---------------------------------------------------------------------------
# Host wrapper: exact distortion reconstruction + EncodedBlock assembly
# ---------------------------------------------------------------------------

def _pass_distortions(mag: np.ndarray, sigtype: np.ndarray,
                      numbps: int,
                      frac: np.ndarray | None = None) -> np.ndarray:
    """Exact per-pass distortion deltas, matching t1_scalar's upd_dist.

    frac: optional irreversible sub-step residual (core.quant.
    quantize_frac) — the model then measures against the TRUE value
    mag + frac (PCRD only; codewords unaffected)."""
    npasses = len(pass_schedule(numbps))
    dist = np.zeros(npasses, dtype=np.float64)
    m = mag.astype(np.float64)
    if frac is not None:
        m = m + frac
    pos = mag > 0
    msb = np.zeros_like(mag)
    msb[pos] = np.floor(np.log2(mag[pos])).astype(mag.dtype)
    rec = np.zeros_like(m)
    for passno, (ptype, bp) in enumerate(pass_schedule(numbps)):
        if ptype == 0:      # SPP
            sel = pos & (msb == bp) & (sigtype == SIG_SPP)
        elif ptype == 2:    # CLN
            sel = pos & (msb == bp) & (sigtype == SIG_CLN)
        else:               # MRP: refine positions significant at a higher bp
            sel = pos & (msb > bp)
        if not sel.any():
            continue
        if ptype == 1:
            new = (np.floor_divide(mag[sel], 1 << bp) * (1 << bp)
                   + 0.5 * (1 << bp))
        else:
            new = 1.5 * (1 << bp)
        old = rec[sel]
        dist[passno] = np.sum((m[sel] - old) ** 2 - (m[sel] - new) ** 2)
        rec[sel] = new
    return np.cumsum(dist)


_SHARDED_ENC_CACHE: dict = {}


def _sharded_encode_fn(mesh, w: int, h: int, maxbp: int, L: int):
    """Jitted shard_map wrapper around t1_encode_batch: lane axis split
    over the 1-D "tiles" mesh (encode-side block DP)."""
    key = (id(mesh), w, h, maxbp, L)
    fn = _SHARDED_ENC_CACHE.get(key)
    if fn is not None:
        return fn
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def body(mag, neg, ori, nbps, msb):
        return t1_encode_batch(mag, neg, ori, nbps, msb, w, h, maxbp, L)

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P("tiles", None, None), P("tiles", None, None),
                  P("tiles"), P("tiles"), P("tiles", None, None)),
        out_specs=(P("tiles", None), P("tiles"),
                   P("tiles", None), P("tiles", None, None)),
        check_vma=False))   # no collectives in the body (pure lane DP)
    _SHARDED_ENC_CACHE[key] = fn
    return fn


def encode_blocks(blocks: list[dict], mesh=None) -> list[EncodedBlock]:
    """Encode block descriptors {mag, neg, orient, w, h} on the device.

    Groups by exact (w, h) — blocks are NOT padded into larger buckets
    because insignificant padding would be entropy-coded.

    mesh: shard each batch's lane axis across the 1-D "tiles" mesh (the
    encode-side block DP; batches pad to a mesh multiple with copies of
    lane 0, results discarded).  Byte-identical to the unsharded path.
    """
    results: list = [None] * len(blocks)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, b in enumerate(blocks):
        if int(np.max(b["mag"])) == 0:
            results[i] = EncodedBlock()
            continue
        buckets.setdefault((b["w"], b["h"]), []).append(i)

    import os
    use_pallas = mesh is None and \
        bool(os.environ.get("GROK_T1_PALLAS")) and \
        jax.default_backend() in ("tpu", "axon")
    for (w, h), idxs in buckets.items():
        if use_pallas and h >= 4:
            from grok_tpu.ops.pallas_t1_enc import (LANES,
                                                    encode_bucket_pallas)
            for k in range(0, len(idxs), LANES):
                chunk = idxs[k:k + LANES]
                for i, res in zip(chunk, encode_bucket_pallas(
                        [blocks[i] for i in chunk])):
                    results[i] = res
            continue
        B = len(idxs)
        Bp = B if mesh is None else -(-B // mesh.devices.size) * \
            mesh.devices.size
        mag = np.zeros((Bp, h, w), dtype=np.int32)
        neg = np.zeros((Bp, h, w), dtype=bool)
        ori = np.zeros((Bp,), dtype=np.int32)
        any_frac = any(blocks[i].get("frac") is not None for i in idxs)
        fracs = np.zeros((Bp, h, w), dtype=np.float64) if any_frac \
            else None
        for j, i in enumerate(idxs):
            b = blocks[i]
            mag[j] = b["mag"]
            neg[j] = b["neg"]
            ori[j] = b["orient"]
            if any_frac and b.get("frac") is not None:
                fracs[j] = b["frac"]
        for j in range(B, Bp):          # pad lanes: copies of lane 0
            mag[j] = mag[0]
            neg[j] = neg[0]
            ori[j] = ori[0]
        nbps = np.array([int(m).bit_length()
                         for m in mag.reshape(Bp, -1).max(axis=1)],
                        dtype=np.int32)
        msbmap = np.full((Bp, h, w), -1, dtype=np.int32)
        pos = mag > 0
        msbmap[pos] = np.floor(np.log2(mag[pos])).astype(np.int32)
        maxbp = -(-int(nbps.max()) // 4) * 4
        L = 2 * w * h + 128
        if mesh is not None:
            # shard_map, not GSPMD partitioning: the encode program is
            # large and pure lane-DP, so each shard compiles the
            # single-device body once (the partitioner does not converge
            # on programs this size) and no collectives are inserted
            fn = _sharded_encode_fn(mesh, w, h, maxbp, L)
            out, lens, rates, sigtype = fn(mag, neg, ori, nbps, msbmap)
        else:
            out, lens, rates, sigtype = t1_encode_batch(
                jnp.asarray(mag), jnp.asarray(neg), jnp.asarray(ori),
                jnp.asarray(nbps), jnp.asarray(msbmap), w, h, maxbp, L)
        out = np.asarray(out)
        lens = np.asarray(lens)
        rates = np.asarray(rates)
        sigtype = np.asarray(sigtype)
        for j, i in enumerate(idxs):
            numbps = int(nbps[j])
            total = int(lens[j])
            data = bytes(out[j, 1:1 + total])
            sched = pass_schedule(numbps)
            npasses = len(sched)
            dists = _pass_distortions(mag[j], sigtype[j], numbps,
                                      fracs[j] if fracs is not None
                                      else None)
            # per-pass rates: recorded watermarks for this lane's passes are
            # at indices offset by (maxbp - numbps) planes
            lane_rates = []
            for passno, (ptype, bp) in enumerate(sched):
                k = numbps - 1 - bp
                idx = 3 * k + (ptype - 2 if ptype != 2 else 0)
                lane_rates.append(int(rates[j, idx]))
            lane_rates = [min(rr, total) for rr in lane_rates]
            for t in range(1, npasses):
                lane_rates[t] = max(lane_rates[t], lane_rates[t - 1])
            lane_rates[-1] = total
            passes = [PassInfo(rate=lane_rates[t], dist=float(dists[t]),
                               term=(t == npasses - 1))
                      for t in range(npasses)]
            results[i] = EncodedBlock(data=data, numbps=numbps,
                                      passes=passes, seg_lens=[total],
                                      seg_passes=[npasses])
    return results
