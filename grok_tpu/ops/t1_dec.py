"""Batched Tier-1 (EBCOT/MQ) block DECODER for the device — JAX.

One lane per code-block: B blocks decode in lockstep.  Every MQ decision is
a branch-free vector step (selects instead of branches); divergence between
blocks (different sizes, bitplane counts, truncation points) is handled with
per-lane masks.

Shape discipline, tuned for the TPU compiler (measured on the axon backend):
- NO while_loops anywhere (the TPU compiler hangs on them inside scan
  nests): MQ renormalization is a bounded 3-chunk unroll with computed
  shift counts.
- Small fori_loop bodies (compile time grows superlinearly with body size):
  the significance and refinement passes run one scan position per
  iteration; the cleanup pass runs as an 11-slot-per-column "slot machine"
  with exactly one MQ decision per iteration.
- Single gather per BYTEIN: codeword bytes are packed host-side into
  (byte, next_byte) uint16 pairs.

Supported here: default code-block style (no BYPASS/RESET/VSC/TERMALL/
SEGSYM — those route to the scalar host coder via pipeline fallback) and
single codeword segment per block, which is exactly what default streams
use.

This is the TPU replacement for the reference's per-block thread-pool T1
[grok: src/lib/core/t1/t1_part1/, plugin batch API] — the batch axis plays
the role of the thread pool, the VPU lanes the role of the cores.
Bit-exactness vs grok_tpu/t1/t1_scalar.py is enforced by
tests/test_t1_vec.py.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from grok_tpu.t1.luts import build_sc_lut, build_zc_lut
from grok_tpu.t1.mq import MQ_NLPS, MQ_NMPS, MQ_QE, MQ_SWITCH

N_CTX = 19
CTX_RL = 17
CTX_UNI = 18

_QE = jnp.asarray(MQ_QE, dtype=jnp.uint32)
_NMPS = jnp.asarray(MQ_NMPS, dtype=jnp.int32)
_NLPS = jnp.asarray(MQ_NLPS, dtype=jnp.int32)
_SWITCH = jnp.asarray(MQ_SWITCH, dtype=jnp.int32)

_ZC_LUT = jnp.asarray(build_zc_lut().reshape(-1), dtype=jnp.int32)  # [o,h,v,d]
_SC_CTX, _SC_XOR = (jnp.asarray(t.reshape(-1), dtype=jnp.int32)
                    for t in build_sc_lut())                        # [hs+1,vs+1]


def _initial_ctx(b: int):
    st = np.zeros((b, N_CTX), dtype=np.int32)
    st[:, CTX_UNI] = 46
    st[:, CTX_RL] = 3
    st[:, 0] = 4
    return jnp.asarray(st)


def pack_pairs(data: np.ndarray) -> np.ndarray:
    """(B, L) uint8 -> (B, L) int32 of (byte << 8) | next_byte."""
    nxt = np.zeros_like(data)
    nxt[:, :-1] = data[:, 1:]
    return (data.astype(np.int32) << 8) | nxt.astype(np.int32)


# ---------------------------------------------------------------------------
# Vector MQ decoder
# mq state: (a, c, ct, bp, data16, dlen)
# ---------------------------------------------------------------------------

def _byte_pair(data16, dlen, i):
    """One gather -> (data[i], data[i+1]) with 0xFF beyond dlen (C.3.4)."""
    idx = jnp.clip(i, 0, data16.shape[1] - 1)
    v = jnp.take_along_axis(data16, idx[:, None].astype(jnp.int32),
                            axis=1)[:, 0]
    cur = jnp.where(i < dlen, (v >> 8) & 0xFF, 0xFF).astype(jnp.uint32)
    nxt = jnp.where(i + 1 < dlen, v & 0xFF, 0xFF).astype(jnp.uint32)
    return cur, nxt


def _bytein(mq, m):
    """Masked BYTEIN on lanes m."""
    a, c, ct, bp, data16, dlen = mq
    cur, nxt = _byte_pair(data16, dlen, bp)
    is_ff = cur == 0xFF
    stop = is_ff & (nxt > 0x8F)
    c_new = jnp.where(stop, c + 0xFF00,
                      jnp.where(is_ff, c + (nxt << 9), c + (nxt << 8)))
    ct_new = jnp.where(is_ff & ~stop, 7, 8)
    bp_new = jnp.where(stop, bp, bp + 1)
    return (a,
            jnp.where(m, c_new, c),   # uint32 wraps mod 2^32
            jnp.where(m, ct_new, ct),
            jnp.where(m, bp_new, bp), data16, dlen)


def mq_init(data16, dlen):
    b = data16.shape[0]
    a = jnp.full((b,), 0x8000, dtype=jnp.uint32)
    bp = jnp.zeros((b,), dtype=jnp.int32)
    cur, _ = _byte_pair(data16, dlen, bp)
    c = cur << 16
    ct = jnp.zeros((b,), dtype=jnp.int32)
    mq = (a, c, ct, bp, data16, dlen)
    mq = _bytein(mq, jnp.ones((b,), dtype=bool))
    a, c, ct, bp, data16, dlen = mq
    c = c << 7
    ct = ct - 7
    return (a, c, ct, bp, data16, dlen)


def _nbits_to_msb(a):
    """Shifts to bring bit 15 up: 16 - bit_length(a), a in [1, 0xFFFF].
    f32 log2 is exact for 16-bit integers."""
    bl = (jnp.floor(jnp.log2(jnp.maximum(a, 1).astype(jnp.float32)))
          .astype(jnp.int32) + 1)
    return 16 - bl


def _renorm(mq, need):
    """C.3.3 RENORMD as a bounded 3-chunk unroll (no while_loop)."""
    a, c, ct, bp, data16, dlen = mq
    n = jnp.where(need, _nbits_to_msb(a), 0)
    for _ in range(3):
        m = n > 0
        feed = m & (ct == 0)
        a, c, ct, bp, _, _ = _bytein((a, c, ct, bp, data16, dlen), feed)
        s = jnp.minimum(n, jnp.where(ct > 0, ct, 0)).astype(jnp.uint32)
        a = jnp.where(m, (a << s) & 0xFFFF, a)
        c = jnp.where(m, c << s, c)
        ct = jnp.where(m, ct - s.astype(jnp.int32), ct)
        n = n - s.astype(jnp.int32)
    return (a, c, ct, bp, data16, dlen)


def mq_decode(state, cx, active):
    """One masked MQ decision per lane.  cx: (B,) context ids.

    state = (mq, ctx_state, ctx_mps); returns (state, bit (B,) int32).
    """
    mq, ctx_state, ctx_mps = state
    a, c, ct, bp, data16, dlen = mq

    onehot = (jnp.arange(N_CTX)[None, :] == cx[:, None])
    i = jnp.sum(jnp.where(onehot, ctx_state, 0), axis=1)
    mps = jnp.sum(jnp.where(onehot, ctx_mps, 0), axis=1)

    qe = jnp.take(_QE, i)
    a1 = a - qe
    lps = (c >> 16) < qe
    small = a1 < qe
    msb = (a1 & 0x8000) != 0

    renorm_needed = lps | ~msb
    is_mps = jnp.where(lps, small, msb | ~small)
    bit = jnp.where(is_mps, mps, 1 - mps)
    use_nmps = jnp.where(lps, small, ~small)
    new_i = jnp.where(use_nmps, jnp.take(_NMPS, i), jnp.take(_NLPS, i))
    flip = ~use_nmps & (jnp.take(_SWITCH, i) == 1)
    new_mps = jnp.where(flip, 1 - mps, mps)

    upd = active & renorm_needed
    a = jnp.where(active, jnp.where(lps, qe, a1), a)
    c = jnp.where(active & ~lps, c - (qe << 16), c)

    ctx_state = jnp.where(onehot & upd[:, None], new_i[:, None], ctx_state)
    ctx_mps = jnp.where(onehot & upd[:, None], new_mps[:, None], ctx_mps)

    mq = _renorm((a, c, ct, bp, data16, dlen), upd)
    bit = jnp.where(active, bit, 0).astype(jnp.int32)
    return (mq, ctx_state, ctx_mps), bit


# ---------------------------------------------------------------------------
# Flag helpers (shared scan position across lanes)
# ---------------------------------------------------------------------------

def _nbhd(arr, y, x):
    """(B,3,3) neighborhood of center (y, x); arr has a 1-cell border."""
    return jax.lax.dynamic_slice(arr, (0, y, x), (arr.shape[0], 3, 3))


def _counts(sig, y, x):
    n = _nbhd(sig, y, x)
    h = n[:, 1, 0] + n[:, 1, 2]
    v = n[:, 0, 1] + n[:, 2, 1]
    d = n[:, 0, 0] + n[:, 0, 2] + n[:, 2, 0] + n[:, 2, 2]
    return h, v, d


def _zc_ctx(sig, y, x, orient):
    h, v, d = _counts(sig, y, x)
    idx = ((orient * 3 + h) * 3 + v) * 5 + d
    return jnp.take(_ZC_LUT, idx)


def _sc_ctx(sgn, y, x):
    n = _nbhd(sgn, y, x)
    hs = jnp.clip(n[:, 1, 0] + n[:, 1, 2], -1, 1)
    vs = jnp.clip(n[:, 0, 1] + n[:, 2, 1], -1, 1)
    idx = (hs + 1) * 3 + (vs + 1)
    return jnp.take(_SC_CTX, idx), jnp.take(_SC_XOR, idx)


def _set_center(arr, y, x, vals, m):
    """Masked write of (B,) vals at border-offset center (y+1, x+1)."""
    cur = jax.lax.dynamic_slice(arr, (0, y + 1, x + 1), (arr.shape[0], 1, 1))
    new = jnp.where(m[:, None, None], vals[:, None, None], cur)
    return jax.lax.dynamic_update_slice(arr, new.astype(arr.dtype),
                                        (0, y + 1, x + 1))


def _get2d(arr, y, x):
    return jax.lax.dynamic_slice(arr, (0, y, x),
                                 (arr.shape[0], 1, 1))[:, 0, 0]


def _set2d(arr, y, x, vals, m):
    cur = _get2d(arr, y, x)
    new = jnp.where(m, vals, cur)
    return jax.lax.dynamic_update_slice(
        arr, new[:, None, None].astype(arr.dtype), (0, y, x))


# ---------------------------------------------------------------------------
# Decode passes
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(6, 7, 8, 9))
def t1_decode_batch(data16, dlen, numpasses, numbps, orient, wh,
                    W: int, H: int, maxbp: int, fold: int = 1):
    """Decode B code-blocks in lockstep.

    data16: (B, L) int32 packed byte pairs (pack_pairs); single codeword
    segment per block.  dlen/numpasses/numbps/orient: (B,) int32;
    wh: (B, 2) int32 valid (w, h).
    fold: slot-steps unrolled per loop iteration.  The axon TPU runtime has
    a ~12us floor per fori_loop iteration regardless of body size, so the
    TPU path folds 8-16 steps per iteration; CPU (tests) keeps fold=1
    because XLA:CPU compile time grows superlinearly with body size.
    Returns (mag2 (B,H,W) int32, neg (B,H,W) bool).
    """
    B = data16.shape[0]
    wv = wh[:, 0]
    hv = wh[:, 1]

    mqs = (mq_init(data16, dlen), _initial_ctx(B),
           jnp.zeros((B, N_CTX), dtype=jnp.int32))

    sig = jnp.zeros((B, H + 2, W + 2), dtype=jnp.int32)
    sgn = jnp.zeros((B, H + 2, W + 2), dtype=jnp.int32)
    visited = jnp.zeros((B, H, W), dtype=jnp.int32)
    vknown = jnp.zeros((B, H, W), dtype=jnp.int32)
    lastp = jnp.full((B, H, W), -1, dtype=jnp.int32)

    n_stripes = (H + 3) // 4
    ones = jnp.ones((B,), jnp.int32)

    def pos_valid(y, x):
        return (jnp.int32(x) < wv) & (jnp.int32(y) < hv)

    def mark_sig(sig, sgn, vknown, lastp, y, x, neg_bit, bp, m):
        sig = _set_center(sig, y, x, ones, m)
        sgn = _set_center(sgn, y, x, jnp.where(neg_bit == 1, -1, 1), m)
        vknown = _set2d(vknown, y, x, jnp.int32(1) << bp, m)
        lastp = _set2d(lastp, y, x, jnp.full((B,), bp, jnp.int32), m)
        return sig, sgn, vknown, lastp

    def plane_body(pi, state):
        mqs, sig, sgn, visited, vknown, lastp = state
        bp = maxbp - 1 - pi
        k_lane = numbps - 1 - bp
        act_spp = (k_lane >= 1) & (3 * k_lane - 2 < numpasses)
        act_mrp = (k_lane >= 1) & (3 * k_lane - 1 < numpasses)
        act_cln = (k_lane >= 0) & (3 * k_lane < numpasses)

        # -- significance propagation: one position per iteration ----------
        def spp_step(i, carry):
            mqs, sig, sgn, visited, vknown, lastp = carry
            dy = i % 4
            col = i // 4
            x = col % W
            y = (col // W) * 4 + dy
            ok = act_spp & pos_valid(y, x)
            cur_sig = _get2d(sig, y + 1, x + 1) != 0
            vis = _get2d(visited, y, x) != 0
            zc = _zc_ctx(sig, y, x, orient)
            coded = ok & ~cur_sig & ~vis & (zc != 0)
            mqs, bit = mq_decode(mqs, zc, coded)
            became = coded & (bit == 1)
            sc, xr = _sc_ctx(sgn, y, x)
            mqs, sbit = mq_decode(mqs, sc, became)
            sig, sgn, vknown, lastp = mark_sig(
                sig, sgn, vknown, lastp, y, x, sbit ^ xr, bp, became)
            visited = _set2d(visited, y, x, ones, coded)
            return (mqs, sig, sgn, visited, vknown, lastp)

        # -- magnitude refinement: one position per iteration --------------
        def mrp_step(i, carry):
            mqs, sig, visited, vknown, lastp = carry
            dy = i % 4
            col = i // 4
            x = col % W
            y = (col // W) * 4 + dy
            ok = act_mrp & pos_valid(y, x)
            cur_sig = _get2d(sig, y + 1, x + 1) != 0
            vis = _get2d(visited, y, x) != 0
            coded = ok & cur_sig & ~vis
            # refined before iff the significance plane (top bit of vknown)
            # is above bp+1: first refinement happens one plane below it
            was_ref = _get2d(vknown, y, x) >= (jnp.int32(4) << bp)
            h, v, d = _counts(sig, y, x)
            mr = jnp.where(was_ref, 16, jnp.where(h + v + d > 0, 15, 14))
            mqs, bit = mq_decode(mqs, mr, coded)
            vknown = _set2d(vknown, y, x,
                            _get2d(vknown, y, x) | (bit << bp), coded)
            lastp = _set2d(lastp, y, x, jnp.full((B,), bp, jnp.int32), coded)
            return (mqs, sig, visited, vknown, lastp)

        # -- cleanup: 11 slots per stripe-column, one decision each --------
        # slot 0: run-length; 1,2: UNIFORM r bits; 3+2t: zc at row t;
        # 4+2t: sign at row t (also the run-length first position's sign)
        def cln_step(i, carry):
            mqs, sig, sgn, visited, vknown, lastp, regs = carry
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

            # run-length eligibility: 6x3 sig neighborhood of the stripe
            # column all insignificant (equivalent to zc==0 for all 4 rows)
            # and nothing visited
            seg = jax.lax.dynamic_slice(sig, (0, y0, x), (B, 6, 3))
            nosig = jnp.sum(seg, axis=(1, 2)) == 0
            visc = jax.lax.dynamic_slice(visited, (0, y0, x), (B, 4, 1))
            novis = jnp.sum(visc, axis=(1, 2)) == 0
            full = (jnp.int32(y0) + 4 <= hv) & (jnp.int32(x) < wv)
            rl_now = act_cln & full & nosig & novis

            cur_sig = _get2d(sig, y + 1, x + 1) != 0
            vis = _get2d(visited, y, x) != 0
            ok = act_cln & pos_valid(y, x)
            in_rl_skip = rl_mode & (~has | (has & (r >= dy)))
            normal = is_zc & ok & ~cur_sig & ~vis & ~in_rl_skip
            first = is_sc & has & (r == dy)

            zc = _zc_ctx(sig, y, x, orient)
            sc, xr = _sc_ctx(sgn, y, x)
            cx = jnp.where(is_rl, CTX_RL,
                           jnp.where(is_uni, CTX_UNI,
                                     jnp.where(is_zc, zc, sc)))
            active = jnp.where(is_rl, rl_now,
                               jnp.where(is_uni, has,
                                         jnp.where(is_zc, normal,
                                                   became | first)))
            mqs, bit = mq_decode(mqs, cx, active)

            # register updates
            rl_mode = jnp.where(is_rl, rl_now, rl_mode)
            has = jnp.where(is_rl, rl_now & (bit == 1), has)
            r = jnp.where(j == 1, bit << 1, jnp.where(j == 2, r | bit, r))
            new_became = normal & (bit == 1)

            # significance updates on sign slots
            setm = is_sc & (became | first)
            sig, sgn, vknown, lastp = mark_sig(
                sig, sgn, vknown, lastp, y, x, bit ^ xr, bp, setm)
            became = jnp.where(is_sc, jnp.zeros_like(became), new_became)
            return (mqs, sig, sgn, visited, vknown, lastp,
                    (rl_mode, has, r, became))

        def folded(step):
            def body(i, carry):
                for k in range(fold):
                    carry = step(i * fold + k, carry)
                return carry
            return body

        def run_loop(step, total, carry):
            return jax.lax.fori_loop(0, -(-total // fold), folded(step),
                                     carry)

        carry = (mqs, sig, sgn, visited, vknown, lastp)
        carry = run_loop(spp_step, n_stripes * W * 4, carry)
        mqs, sig, sgn, visited, vknown, lastp = carry
        carry = (mqs, sig, visited, vknown, lastp)
        carry = run_loop(mrp_step, n_stripes * W * 4, carry)
        mqs, sig, visited, vknown, lastp = carry
        zerosb = jnp.zeros((B,), dtype=bool)
        regs = (zerosb, zerosb, jnp.zeros((B,), jnp.int32), zerosb)
        carry = (mqs, sig, sgn, visited, vknown, lastp, regs)
        carry = run_loop(cln_step, n_stripes * W * 11, carry)
        mqs, sig, sgn, visited, vknown, lastp, _ = carry
        visited = jnp.zeros_like(visited)
        return (mqs, sig, sgn, visited, vknown, lastp)

    state = (mqs, sig, sgn, visited, vknown, lastp)
    state = jax.lax.fori_loop(0, maxbp, plane_body, state)
    _, sig, sgn, _, vknown, lastp = state

    sig_mask = lastp >= 0
    mag2 = jnp.where(sig_mask,
                     vknown * 2 + (jnp.int32(1) << jnp.maximum(lastp, 0)), 0)
    neg = sgn[:, 1:H + 1, 1:W + 1] < 0
    return mag2, neg


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

def _pow2_at_least(v: int, lo: int = 4, hi: int = 1024) -> int:
    """Bucket dimension for a block extent.  The XLA kernel is
    shape-generic, so the cap is the standard's own max code-block
    extent (2^10); the Pallas route keeps its 64-px VMEM bound and
    larger buckets take the XLA kernel."""
    p = lo
    while p < v and p < hi:
        p *= 2
    return p


def default_fold() -> int:
    """Loop fold factor: 1 on CPU (compile cost), 16 on TPU (the axon
    runtime's ~12us/iteration floor dominates otherwise).  Override with
    GROK_T1_FOLD."""
    import os
    v = os.environ.get("GROK_T1_FOLD")
    if v:
        return int(v)
    return 1 if jax.default_backend() == "cpu" else 16


def decode_blocks(blocks: list[dict], interpret: bool = False):
    """Decode a list of block descriptors on the device, bucketed by shape.

    Each descriptor: {data: bytes, numpasses, numbps, orient, w, h}.
    Returns per-block (mag2, neg) numpy arrays of shape (h, w).
    """
    results: list = [None] * len(blocks)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, b in enumerate(blocks):
        if b["numpasses"] <= 0 or b["numbps"] <= 0:
            results[i] = (np.zeros((b["h"], b["w"]), np.int64),
                          np.zeros((b["h"], b["w"]), bool))
            continue
        key = (_pow2_at_least(b["w"]), _pow2_at_least(b["h"]))
        buckets.setdefault(key, []).append(i)

    from grok_tpu.ops.pallas_t1 import t1_pallas_enabled
    use_pallas = t1_pallas_enabled()
    for (W, H), idxs in buckets.items():
        if use_pallas and W <= 64 and H <= 64:
            from grok_tpu.ops.pallas_t1 import (LANES, decode_bucket_pallas,
                                                sublanes_for)
            step = sublanes_for(W, H) * LANES
            for k in range(0, len(idxs), step):
                chunk = idxs[k:k + step]
                for i, res in zip(chunk, decode_bucket_pallas(
                        [blocks[i] for i in chunk], W, H)):
                    results[i] = res
            continue
        B = len(idxs)
        maxlen = max(len(blocks[i]["data"]) for i in idxs)
        L = max(8, -(-maxlen // 64) * 64)
        data = np.zeros((B, L), dtype=np.uint8)
        dlen = np.zeros((B,), dtype=np.int32)
        npass = np.zeros((B,), dtype=np.int32)
        nbps = np.zeros((B,), dtype=np.int32)
        ori = np.zeros((B,), dtype=np.int32)
        wh = np.zeros((B, 2), dtype=np.int32)
        for j, i in enumerate(idxs):
            b = blocks[i]
            d = b["data"]
            data[j, :len(d)] = np.frombuffer(d, dtype=np.uint8)
            dlen[j] = len(d)
            npass[j] = b["numpasses"]
            nbps[j] = b["numbps"]
            ori[j] = b["orient"]
            wh[j] = (b["w"], b["h"])
        maxbp = -(-int(nbps.max()) // 4) * 4   # round up: stable jit cache
        fn = t1_decode_batch
        if interpret:
            fn = fn.__wrapped__          # un-jitted for debugging
        mag2, neg = fn(jnp.asarray(pack_pairs(data)), jnp.asarray(dlen),
                       jnp.asarray(npass), jnp.asarray(nbps),
                       jnp.asarray(ori), jnp.asarray(wh), W, H, maxbp,
                       default_fold())
        mag2 = np.asarray(mag2)
        neg = np.asarray(neg)
        for j, i in enumerate(idxs):
            b = blocks[i]
            results[i] = (mag2[j, :b["h"], :b["w"]].astype(np.int64),
                          neg[j, :b["h"], :b["w"]])
    return results
