"""Pallas TPU kernel: batched HTJ2K (Part 15) cleanup-pass decode.

The host splits the wire segment into its three sub-streams and
un-stuffs them into *clean* LSB-first bit streams (t1ht/wire.py — a
pointwise, fully vectorized transform), so the lockstep kernel reads
every field as `(word >> shift) & mask` — no per-bit loops.  One fori
iteration decodes a whole 2x2 quad per the ISO 15444-15 structure:

  - sample-level quad context from a (GH+1, GW+2) rho scratch,
  - the MEL event via carried (k, run, pending) registers and a single
    6-bit peek (spec polarity: 1-bit = completed run; MSB-first run
    fields read via a 5-bit reverse),
  - the CxtVLC (rho, u_off, eps_k) symbol via a bit-sliced LUT over
    (context, 7-bit window) — 32 one-hot-selected constant words per
    output bit, generated from t1ht.tables.VLC_DEC at trace time, so
    a normative-table drop-in regenerates the kernel automatically,
  - UVLC (1/2/4/8-bit classes) + the vertical exponent predictor
    kappa_q from an exponent scratch row,
  - four maskable MagSgn reads of U - eps_k bits each (EMB known-MSB
    restore when the tables code eps_k != 0).

That is ~1 serial step per 4 samples versus the MQ kernel's several MQ
decisions per sample per bitplane — the parallel-friendly coder the
Part 15 design intends (SURVEY.md §7 phase 7).

Byte access reuses the staged-window structure of ops/pallas_t1.py (the
one Mosaic lowers cleanly): each stream is packed as little-endian byte
pairs in 32-byte granules; a 25-bit-valid word is read at any bit
position with one one-hot sum over a 64-byte window.  Round-2 rework
(mirrors the encoder's hierarchy): windows live in VMEM scratch; the
MagSgn window (<= 12.5 B/quad advance) reloads per quad from a
10-granule `mid` scratch that is refreshed from the full stream buffer
once per K=16 quads, and the MEL/VLC windows (<= 6 / 13 bits per quad)
refresh only at the outer-loop boundary — the full (G, 32, lanes)
buffers are never scanned per quad.  16-bit pair entries let every
granule fetch ride half the one-hot passes (second granule packed into
the high 16 bits).

Reads past a lane's stream return 0 (zero padding; out-of-range granule
one-hots select nothing), matching the scalar readers' semantics.

Same contract as t1ht.ht_decode_block for single-segment cleanup-only
blocks; bit-exact vs the scalar coder (tests/test_pallas_ht.py).

Reference parity: device batch analog of the reference's HT block
decoder [grok: src/lib/core/t1/t1_ht/ht_block_decoding.cpp]
(SURVEY.md §2 row 8).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def ht_pallas_enabled() -> bool:
    """Device HT decode is the default on TPU backends (the scalar path
    is the only alternative; there is no XLA-loop HT kernel)."""
    env = os.environ.get("GROK_HT_PALLAS")
    if env is not None:
        return env not in ("0", "")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        # backend init can fail outright (e.g. the axon tunnel is held
        # by another process) — treat as "no device", use host paths
        return False


def _ht_interpret() -> bool:
    """Run the HT kernels in Pallas interpret mode (CPU testing of the
    fused/serving decode paths; GROK_PALLAS_INTERPRET=1)."""
    return os.environ.get("GROK_PALLAS_INTERPRET") == "1"


def parse_ht_header(data: bytes, seg_lens):
    """Split a wire cleanup segment into clean (magsgn, mel, vlc)
    LSB-first streams or None if the framing is invalid (the un-stuffed
    mirror of t1ht.scalar.ht_decode_block's readers).  The cleanup
    plane is NOT in the segment — callers derive it from the pass
    count / the ht_planes COM extension (t1ht.scalar.derive_p)."""
    from grok_tpu.t1ht.wire import split_cleanup
    L = seg_lens[0] if seg_lens else len(data)
    if L < 2:
        return None
    return split_cleanup(data, L)


def _vlc_dec_planes():
    """Bit-sliced CxtVLC decode LUT for the kernel.

    entry(idx) = sym | (len << symb) for idx = (fam*N_CTX + ctx)*128 +
    window7 (fam 0 = non-initial row family, fam 1 = initial-row family
    when tables.two_families()); the LUT is evaluated in-kernel as
    `symb+3` bit planes, each plane a 32*nfam-word constant vector
    indexed by hi = idx >> 5 with the bit at position lo = idx & 31.
    Rebuilt from the CURRENT t1ht.tables state per tables.VERSION
    (vlc_dec_state), so installing normative tables re-jits the kernel.
    Invalid windows decode as the benign (rho=0, len=1) — garbage-in
    garbage-out on corrupt streams (the serving path is non-strict)."""
    from grok_tpu.t1ht import tables as _t
    fams = [_t.VLC_DEC]
    if _t.two_families():
        fams.append(_t.VLC_DEC_INIT)
    nfam = len(fams)
    n_ctx = _t.N_CTX
    symmax = 0
    for dec in fams:
        for c in range(n_ctx):
            for sym, _ln in dec[c]:
                symmax = max(symmax, sym)
    symb = max(5, int(symmax).bit_length())
    ent = np.zeros(nfam * n_ctx * 128, np.int64)
    for f, dec in enumerate(fams):
        for c in range(n_ctx):
            for w7, (sym, ln) in enumerate(dec[c]):
                if sym < 0:
                    sym, ln = 0, 1
                ent[(f * n_ctx + c) * 128 + w7] = sym | (ln << symb)
    nplanes = symb + 3
    nw = nfam * n_ctx * 128 // 32
    planes = np.zeros((nplanes, nw), np.int64)
    idx = np.arange(nfam * n_ctx * 128)
    hi, lo = idx >> 5, idx & 31
    for j in range(nplanes):
        np.bitwise_or.at(planes[j], hi, ((ent >> j) & 1) << lo)
    planes_i32 = (planes & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    has_ek = symmax >= 32
    return planes_i32, symb, has_ek, nfam, _t.UVLC_PXOR & 7


_DEC_STATE_CACHE: dict = {}


def vlc_dec_state():
    """(table_version, (planes, symb, has_ek, nfam, pxor)) for the
    CURRENT t1ht.tables state; memoized per tables.VERSION."""
    from grok_tpu.t1ht import tables as _t
    tv = _t.VERSION
    got = _DEC_STATE_CACHE.get(tv)
    if got is None:
        _DEC_STATE_CACHE.clear()     # old versions are dead
        got = _vlc_dec_planes()
        _DEC_STATE_CACHE[tv] = got
    return tv, got


def ht_block_eligible(job: dict) -> bool:
    """Kernel path: valid framing, U+1 <= 25 bits per MagSgn read (the
    staged word guarantees 25 valid bits).  Cleanup-only blocks take
    the fast variant; 2/3-pass blocks (HT SigProp/MagRef refining plane
    p-1, ht_planes encodes) take the REFINE variant — their raw stuffed
    segments are un-stuffed host-side and read in-kernel.  Caches the
    parsed header (+ clean refinement streams) in job["_ht_hdr"] and
    the derived cleanup plane in job["ht_p"]."""
    np_ = job["numpasses"]
    sl = job.get("seg_lens") or [len(job["data"])]
    if np_ not in (1, 2, 3) or len(sl) != np_:
        return False
    if "ht_p" not in job:
        from grok_tpu.t1ht.scalar import derive_p
        job["ht_p"] = derive_p(np_, job["numbps"], None)
    hdr = job.get("_ht_hdr")
    if hdr is None:
        hdr = parse_ht_header(job["data"], sl)
        if hdr is None:
            return False
        if np_ > 1:
            if job["ht_p"] == 0:
                return False           # refinement needs p > 0
            import numpy as _np

            from grok_tpu.t1ht.wire import _unstuff_lsb
            d = job["data"]
            s0, s1 = sl[0], sl[0] + sl[1]
            if s1 > len(d):
                return False
            sp = _unstuff_lsb(_np.frombuffer(d[s0:s1], _np.uint8))
            mr = b""
            if np_ >= 3:
                s2 = s1 + sl[2]
                if s2 > len(d):
                    return False
                mr = _unstuff_lsb(_np.frombuffer(d[s1:s2], _np.uint8))
            hdr = hdr + (sp, mr)
        job["_ht_hdr"] = hdr
    if max(len(x) for x in hdr) > MAX_STREAM:
        return False
    return job["numbps"] - job["ht_p"] <= 24


# Longest per-lane stream the kernel accepts.  Round-2's G > ~128
# Mosaic-compile cliff was the per-quad full-buffer staging; with the
# granule hierarchy (full -> mid -> window) a G=208 dense 64x64 batch
# compiles in ~9 s and runs bit-exact, so the cap now covers dense
# 64x64 lossless streams (~8 KB/lane).  Oversized blocks still fall
# back to the scalar path.
MAX_STREAM = 256 * 32 - 8


def _quant_len(maxlen: int) -> int:
    """Quantize per-lane buffer length (multiples of 256 bytes) so minor
    stream length changes reuse the same compiled kernel (the granule
    count G is a static kernel dimension)."""
    return max(256, -(-(maxlen + 8) // 256) * 256)


def _pack_raw(streams: list[bytes], S: int) -> np.ndarray:
    """(NL, Lb+1) uint8, zero-padded: the host-side format.  Byte-pair
    staging is built ON DEVICE (device_pairs) — uploading raw bytes is 8x
    less tunnel traffic than uploading int32 pair tensors."""
    NL = S * LANES
    maxlen = max((len(s) for s in streams), default=1)
    Lb = _quant_len(maxlen)
    raw = np.zeros((NL, Lb + 1), np.uint8)
    for j, s in enumerate(streams):
        raw[j, :len(s)] = np.frombuffer(s, np.uint8)
    return raw


def device_pairs(raw, S: int):
    """uint8 (NL, Lb+1) -> (G, 32, [S,] LANES) int32 LE byte pairs, on
    device (runs inside the enclosing jit; XLA fuses the upcast/shift)."""
    import jax.numpy as jnp

    Lb = raw.shape[1] - 1
    G = Lb // 32
    a = raw.astype(jnp.int32)
    pairs = a[:, :Lb] | (a[:, 1:] << 8)
    if S > 1:
        return pairs.reshape(S, LANES, G, 32).transpose(2, 3, 0, 1)
    return pairs.reshape(LANES, G, 32).transpose(1, 2, 0)


def pack_ht_for_pallas(blocks: list[dict], S: int):
    """Parse headers and pack the three sub-streams for the kernel.

    Returns (ms, mel, vlc RAW uint8 (NL, Lb+1) buffers; p, wh, valid lane
    arrays).  Callers must pre-filter with ht_block_eligible; a cached
    parse in job["_ht_hdr"] (set by ht_block_eligible) is reused."""
    NL = S * LANES
    assert len(blocks) <= NL
    mss, mels, vlcs = [], [], []
    pv = np.zeros((NL,), np.int32)
    wh = np.ones((2, NL), np.int32)
    valid = np.zeros((NL,), np.int32)
    for j, b in enumerate(blocks):
        hdr = b.get("_ht_hdr")
        if hdr is None:
            sl = b.get("seg_lens") or [len(b["data"])]
            hdr = parse_ht_header(b["data"], sl)
        ms, mel, vlc = hdr[:3]
        mss.append(ms)
        mels.append(mel)
        vlcs.append(vlc)
        pv[j] = b.get("ht_p", 0)
        wh[0, j] = b["w"]
        wh[1, j] = b["h"]
        valid[j] = 1
    ms_d = _pack_raw(mss, S)
    mel_d = _pack_raw(mels, S)
    vlc_d = _pack_raw(vlcs, S)
    if S > 1:
        pv = pv.reshape(S, LANES)
        wh = wh.reshape(2, S, LANES)
        valid = valid.reshape(S, LANES)
    else:
        pv = pv.reshape(1, LANES)
        valid = valid.reshape(1, LANES)
    return ms_d, mel_d, vlc_d, pv, wh, valid


def pallas_ht_decode(ms_raw, mel_raw, vlc_raw, pv, wh, valid,
                     W: int, H: int, S: int, interpret: bool = False):
    """Decode a batch of S*128 HT cleanup blocks with one Pallas kernel.

    ms/mel/vlc_raw: (NL, Lb+1) uint8 per-lane streams (_pack_raw); the
    byte-pair staging tensors are built here on device.  Returns signed
    mag2 (H, W, [S,] LANES) int32 (negative = sign bit), with the Part-1
    half-bit below plane p (matches ht_decode_block)."""
    z = np.zeros((S * LANES, 33), np.uint8)
    tv, _ = vlc_dec_state()
    return _ht_decode_jit(ms_raw, mel_raw, vlc_raw, pv, wh, valid,
                          z, z, valid, W, H, S, interpret, False, tv)


def pallas_ht_decode_refine(ms_raw, mel_raw, vlc_raw, pv, wh, valid,
                            sp_raw, mr_raw, npv,
                            W: int, H: int, S: int,
                            interpret: bool = False):
    """REFINE variant: cleanup + HT SigProp + HT MagRef in one kernel.

    sp/mr_raw: clean (un-stuffed) LSB-first refinement streams per lane
    (_pack_raw); npv: per-lane pass count (1..3).  Lanes with npv < 2
    skip refinement (masked).  p > 0 required for refine lanes
    (ht_block_eligible enforces)."""
    tv, _ = vlc_dec_state()
    return _ht_decode_jit(ms_raw, mel_raw, vlc_raw, pv, wh, valid,
                          sp_raw, mr_raw, npv, W, H, S, interpret, True,
                          tv)


@partial(jax.jit, static_argnums=(9, 10, 11, 12, 13, 14))
def _ht_decode_jit(ms_raw, mel_raw, vlc_raw, pv, wh, valid,
                   sp_raw, mr_raw, npv,
                   W: int, H: int, S: int, interpret: bool,
                   refine: bool, table_version: int = 0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # trace-time table state (table_version in the jit key retraces on
    # install_tables): LUT planes + symbol width + families + polarity
    _, (DEC_PLANES, SYMB, _HAS_EK, NFAM, PXOR) = vlc_dec_state()
    NW = DEC_PLANES.shape[1]

    ms_d = device_pairs(ms_raw, S)
    mel_d = device_pairs(mel_raw, S)
    vlc_d = device_pairs(vlc_raw, S)
    if refine:
        sp_d = device_pairs(sp_raw, S)
        mr_d = device_pairs(mr_raw, S)

    GH, GW = (H + 1) // 2, (W + 1) // 2
    arr_tail = (S, LANES) if S > 1 else (LANES,)
    nd = len(arr_tail)
    lane_sh = (S, LANES) if S > 1 else (1, LANES)
    kd = S == 1
    GWP = max(GW // 2, 1)     # quad PAIRS per row (GW == 1: lone quads)
    HAS2 = GW >= 2            # static: a second quad exists in the pair
    NQP = GH * GWP
    K = min(8, NQP)           # pairs per inner block = 16 quads: the
                              # staging budgets match the pre-pair kernel
    assert NQP % K == 0, (W, H)  # callers bucket W/H to powers of two
    NO = NQP // K
    MIDG = 10                 # MagSgn mid granules: 31 B skew + 8 pairs
                              # * 25 B + 2-granule window <= 10 * 32 B

    def iota_for(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * nd, 0)

    def kernel(*refs):
        if refine:
            (ms_ref, mel_ref, vlc_ref, p_ref, wh_ref, valid_ref,
             lut_ref, sp_ref, mr_ref, np_ref, out_ref, rho_ref,
             ms_st, mel_st, vlc_st, ms_ba, mel_ba, vlc_ba, ms_mid,
             ms_mba, sig_ref, rf_st, rf_ba) = refs
        else:
            (ms_ref, mel_ref, vlc_ref, p_ref, wh_ref, valid_ref,
             lut_ref, out_ref, rho_ref, ms_st, mel_st, vlc_st,
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

        out_ref[...] = jnp.zeros((H, W) + arr_tail, jnp.int32)
        # one scratch row-grid holds BOTH per-quad states packed as
        # (ebot << 4) | rho: rho <= 15, ebot <= 25 — zero extra VMEM
        # and the quad-above read serves context and kappa at once
        rho_ref[...] = jnp.zeros((GH + 1, GW + 2) + arr_tail, jnp.int32)
        for st in (ms_st, mel_st):
            st[...] = jnp.zeros((64,) + arr_tail, jnp.int32)
        vlc_st[...] = jnp.zeros((96,) + arr_tail, jnp.int32)
        for ba in (ms_ba, mel_ba, vlc_ba, ms_mba):
            ba[...] = jnp.zeros(lane_sh, jnp.int32)
        ms_mid[...] = jnp.zeros((MIDG, 32) + arr_tail, jnp.int32)

        siotas = {64: iota_for(64), 96: iota_for(96)}
        # lane values are always 2-D (lane_sh): the LUT one-hot axes are
        # (32,) + (1, 1) regardless of S
        hiota32 = jax.lax.broadcasted_iota(jnp.int32, (NW, 1, 1), 0)
        # bit-sliced CxtVLC decode LUT planes, (NW,)+(1,)*nd each
        lut = [lut_ref[j] for j in range(DEC_PLANES.shape[0])]
        wiota = iota_for(W)
        qiota = iota_for(GW + 2)
        gset = {ms_ref.shape[0], mel_ref.shape[0], vlc_ref.shape[0]}
        if refine:
            gset |= {sp_ref.shape[0], mr_ref.shape[0]}
        giotas = {G: jax.lax.broadcasted_iota(
            jnp.int32, (G,) + (1,) * (nd + 1), 0)
            for G in gset}
        miota = jax.lax.broadcasted_iota(
            jnp.int32, (MIDG,) + (1,) * (nd + 1), 0)

        def stage_load(ref, bytepos):
            """64-byte LE-pair window at the 32-aligned base of bytepos;
            out-of-range granules stage as zeros (safe overrun).  16-bit
            pair entries: both granules ride ONE one-hot sum pass, the
            second packed into the high 16 bits (halves the per-quad
            staging cost, the kernel's hot loop)."""
            G = ref.shape[0]
            g0 = bytepos >> 5
            sel = (giotas[G] == g0[None]).astype(jnp.int32) + \
                ((giotas[G] == (g0 + 1)[None]).astype(jnp.int32) << 16)
            packed = jnp.sum(ref[...] * sel, axis=0)
            lo = packed & 0xFFFF
            hi = (packed >> 16) & 0xFFFF
            return jnp.concatenate([lo, hi], axis=0), (g0 << 5)

        def stage_load3(ref, bytepos):
            """96-byte window (3 granules): the VLC stream can advance up
            to 15 bits/quad (7-bit CxtVLC + 8-bit UVLC), i.e. 30 bytes
            per K=16 inner quads — past what a 64-byte window staged at a
            32-aligned base can guarantee for 25-bit reads."""
            G = ref.shape[0]
            g0 = bytepos >> 5
            sel = (giotas[G] == g0[None]).astype(jnp.int32) + \
                ((giotas[G] == (g0 + 1)[None]).astype(jnp.int32) << 16)
            packed = jnp.sum(ref[...] * sel, axis=0)
            sel2 = (giotas[G] == (g0 + 2)[None]).astype(jnp.int32)
            p2 = jnp.sum(ref[...] * sel2, axis=0)
            return jnp.concatenate([packed & 0xFFFF,
                                    (packed >> 16) & 0xFFFF, p2],
                                   axis=0), (g0 << 5)

        def ms_mid_refresh(bp_bytes):
            """Reload the MagSgn mid scratch (MIDG granules) from the
            full stream buffer around bp — once per K quads; pair
            entries ride two granules per one-hot pass."""
            G = ms_ref.shape[0]
            giota = giotas[G]
            mg = bp_bytes >> 5
            d = ms_ref[...]
            parts = []
            for jj in range(0, MIDG, 2):
                sel = (giota == (mg + jj)[None]).astype(jnp.int32) + \
                    ((giota == (mg + jj + 1)[None])
                     .astype(jnp.int32) << 16)
                packed = jnp.sum(d * sel, axis=0)
                parts.append(packed & 0xFFFF)
                parts.append((packed >> 16) & 0xFFFF)
            ms_mid[...] = jnp.stack(parts, axis=0)
            ms_mba[...] = mg << 5

        def ms_win_refresh(bp_bytes):
            """Reload the MagSgn 64-byte window from mid (O(MIDG))."""
            rel = (bp_bytes >> 5) - (ms_mba[...] >> 5)
            sel = (miota == rel[None]).astype(jnp.int32) + \
                ((miota == (rel + 1)[None]).astype(jnp.int32) << 16)
            packed = jnp.sum(ms_mid[...] * sel, axis=0)
            ms_st[...] = jnp.concatenate(
                [packed & 0xFFFF, (packed >> 16) & 0xFFFF], axis=0)
            ms_ba[...] = (bp_bytes >> 5) << 5

        def bits_at(stage, base, bp):
            """Word with >= 25 valid bits whose bit 0 is stream bit bp."""
            siota = siotas[stage.shape[0]]
            off = (bp >> 3) - base
            sel = (siota == off).astype(jnp.int32) + \
                (siota == off + 2).astype(jnp.int32) * 65536
            w = jnp.sum(stage * sel, axis=0, keepdims=kd)
            return w >> (bp & 7)

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

        def row_read(ref, gi, qi):
            v = ref[gi, pl.ds(qi, 1)]
            if S == 1:
                return v
            return jnp.sum(v, axis=0)

        one = jnp.int32(1)
        half = jnp.where(p_l > 0, one << p_l, 0)
        p1 = p_l + 1
        symmask = (1 << SYMB) - 1

        def mel_event(mask, k, run, pend, mel_bp):
            """One MEL event for `mask` lanes -> (ev, k, run, pend, bp).
            Spec polarity: a 1-bit closes a full run of T zero-events; a
            0-bit is a miss followed by e MSB-first partial-run bits."""
            owed = mask & (run > 0)
            pnd = mask & ~owed & (pend == 1)
            need = mask & ~owed & ~pnd
            e = jnp.where(k >= 12, 5,
                          jnp.where(k >= 11, 4,
                                    jnp.where(k >= 9, 3,
                                              jnp.where(k >= 6, 2,
                                                        jnp.where(k >= 3, 1,
                                                                  0)))))
            w6 = bits_at(mel_st[...], mel_ba[...], mel_bp)
            bit0 = w6 & 1
            x5 = (w6 >> 1) & 31
            r5 = ((x5 & 1) << 4) | ((x5 & 2) << 2) | (x5 & 4) | \
                ((x5 & 8) >> 2) | ((x5 >> 4) & 1)
            rfld = r5 >> (5 - e)
            full_path = need & (bit0 == 1)
            miss_path = need & (bit0 == 0)
            ev = (pnd | (miss_path & (rfld == 0))).astype(jnp.int32)
            mel_bp = mel_bp + jnp.where(need,
                                        jnp.where(bit0 == 0, 1 + e, 1), 0)
            k = jnp.where(full_path, jnp.minimum(k + 1, 12),
                          jnp.where(miss_path, jnp.maximum(k - 1, 0), k))
            run = jnp.where(owed, run - 1,
                            jnp.where(full_path, (one << e) - 1,
                                      jnp.where(miss_path & (rfld > 0),
                                                rfld - 1, run)))
            pend = jnp.where(pnd, 0,
                             jnp.where(miss_path & (rfld > 0), 1, pend))
            return ev, k, run, pend, mel_bp

        def quad_sym(g, qx, act, left, mstate, vlc_bp):
            """MEL significance event (context-0 quads) + CxtVLC symbol
            of one quad.  left: the left-neighbour rho as a VALUE (the
            pair partner's rho is not in the scratch yet).  Returns
            (sym, top_p, mstate, vlc_bp)."""
            k, run, pend, mel_bp = mstate
            top_p = row_read(rho_ref, g, qx + 1)
            top = top_p & 0xF
            topr = row_read(rho_ref, g, qx + 2) & 0xF
            c = ((left & 0b1100) != 0).astype(jnp.int32) | \
                (((top & 0b1010) != 0).astype(jnp.int32) << 1) | \
                (((topr & 0b0010) != 0).astype(jnp.int32) << 2)
            is_c0 = c == 0
            ev, k, run, pend, mel_bp = mel_event(act & is_c0, k, run,
                                                 pend, mel_bp)
            vread = (act & is_c0 & (ev == 1)) | (act & ~is_c0)
            w7 = bits_at(vlc_st[...], vlc_ba[...], vlc_bp) & 0x7F
            if NFAM == 2:
                # family 1 = initial quad-row pair (g == 0)
                fam = jnp.where(g == 0, 8, 0)
                hi = ((fam + c) << 2) | (w7 >> 5)
            else:
                hi = (c << 2) | (w7 >> 5)
            lo = w7 & 31
            sel32 = (hiota32 == hi[None]).astype(jnp.int32)
            entry = jnp.zeros_like(c)
            for j, cj in enumerate(lut):
                word = jnp.sum(cj * sel32, axis=0)
                entry = entry | (((word >> lo) & 1) << j)
            sym = jnp.where(vread, entry & symmask, 0)
            ln = (entry >> SYMB) & 7
            vlc_bp = vlc_bp + jnp.where(vread, ln, 0)
            return sym, top_p, (k, run, pend, mel_bp), vlc_bp

        def pclass(wv):
            """UVLC prefix class at bit 0 of wv: (len, base, sfx_len).
            PXOR (tables.UVLC_PXOR) flips the transmitted prefix bits
            before classification (trace-time constant)."""
            wv = wv ^ PXOR
            b0 = wv & 1
            b1 = (wv >> 1) & 1
            b2 = (wv >> 2) & 1
            ln = jnp.where(b0 == 0, 1, jnp.where(b1 == 0, 2, 3))
            base = jnp.where(b0 == 0, 1,
                             jnp.where(b1 == 0, 2,
                                       jnp.where(b2 == 0, 3, 5)))
            sl = jnp.where(b0 == 0, 0,
                           jnp.where(b1 == 0, 0,
                                     jnp.where(b2 == 0, 1, 5)))
            return ln, base, sl

        def uvlc_pair(initial, evu, off0, off1, vlc_bp):
            """Pair-coupled UVLC (t1ht.scalar._read_u_pair): interleaved
            prefixes then suffixes when both u_off = 1; the initial-row
            MEL event evu adds 2 to both u; when clear, a 3-bit first
            prefix implies u1 <= 2 coded in ONE bit.  Single-u_off modes
            fall out of the same formula with the other side's lengths
            zeroed.  NOTE: omits the 13-bit escape (u >= 36, 5-bit
            suffix == 31, tables.uvlc_parts) — safe ONLY because serving
            eligibility enforces numbps - p <= 24 (so u <= 24):
            ht_block_eligible / serve.py's numbps-p check.  If that
            bound is ever raised past 32, teach both kernels the escape
            or streams with u >= 36 will silently mis-decode."""
            w = bits_at(vlc_st[...], vlc_ba[...], vlc_bp)
            both = off0 & off1
            l0c, base0, sl0c = pclass(w)
            el0 = jnp.where(off0, l0c, 0)
            w1 = w >> el0
            quirk = initial & both & (evu == 0) & (l0c == 3)
            l1c, base1c, sl1c = pclass(w1)
            base1 = jnp.where(quirk, (w1 & 1) + 1, base1c)
            el1 = jnp.where(off1, jnp.where(quirk, 1, l1c), 0)
            esl0 = jnp.where(off0, sl0c, 0)
            esl1 = jnp.where(off1, jnp.where(quirk, 0, sl1c), 0)
            sfx0 = (w >> (el0 + el1)) & ((one << esl0) - 1)
            sfx1 = (w >> (el0 + el1 + esl0)) & ((one << esl1) - 1)
            add = jnp.where(initial & both & (evu == 1), 2, 0)
            u0 = jnp.where(off0, base0 + sfx0 + add, 0)
            u1 = jnp.where(off1, base1 + sfx1 + add, 0)
            return u0, u1, vlc_bp + el0 + el1 + esl0 + esl1

        def magsgn_quad(sym, top_p, u, act_q, ms_bp):
            """Four maskable MagSgn reads of U - eps_k bits; returns
            (svals, smasks, rho|ebot<<4 state word, ms_bp)."""
            rho = sym & 0xF
            eb_above = top_p >> 4
            multi = (rho & (rho - 1)) != 0
            kappa = jnp.where(multi, jnp.maximum(1, eb_above - 1), 1)
            # valid streams have U <= numbps - p + 1 <= 25 (eligibility);
            # the clamp only bounds shift widths on corrupt streams
            U = jnp.minimum(kappa + u, 25)
            ek = sym >> 5
            svals = []
            smasks = []
            ebot = jnp.zeros_like(U)
            for i in range(4):
                m_i = act_q & (((rho >> i) & 1) == 1)
                k_i = (ek >> i) & 1
                m = U - k_i
                w = bits_at(ms_st[...], ms_ba[...], ms_bp)
                full = (w & ((one << m) - 1)) | (k_i << (U - 1))
                ms_bp = ms_bp + jnp.where(m_i, m, 0)
                vi = (full >> 1) + 1
                sg = full & 1
                mag2 = (vi << p1) + half
                svals.append(jnp.where(sg == 1, -mag2, mag2))
                smasks.append(m_i)
                if i & 1:
                    ebot = jnp.maximum(
                        ebot, jnp.where(m_i, bitlen(full), 0))
            return svals, smasks, rho | (ebot << 4), ms_bp

        def write_quad(g, qx, svals, smasks):
            in_y1 = (2 * g + 1) < hv
            in_x1 = (2 * qx + 1) < wv
            # quad scan order n0=(0,0) n1=(1,0) n2=(0,1) n3=(1,1)
            y0 = 2 * g
            row0 = out_ref[y0]
            sel0 = (wiota == 2 * qx) & smasks[0]
            sel2 = (wiota == 2 * qx + 1) & (smasks[2] & in_x1)
            out_ref[y0] = jnp.where(sel0, svals[0],
                                    jnp.where(sel2, svals[2], row0))
            y1 = jnp.minimum(2 * g + 1, H - 1)
            row1 = out_ref[y1]
            sel1 = (wiota == 2 * qx) & (smasks[1] & in_y1)
            sel3 = (wiota == 2 * qx + 1) & (smasks[3] & in_y1 & in_x1)
            out_ref[y1] = jnp.where(sel1, svals[1],
                                    jnp.where(sel3, svals[3], row1))

        def pair_body(t, carry):
            ms_bp, mel_bp, vlc_bp, k, run, pend = carry
            g = t // GWP
            qp = t - g * GWP
            qx0 = 2 * qp
            qx1 = 2 * qp + 1
            initial = g == 0
            act0 = (val_l == 1) & (g < gh_l) & (qx0 < gw_l)
            act1 = (val_l == 1) & (g < gh_l) & (qx1 < gw_l)

            # MagSgn window slides up to 25 B/pair: reload from mid
            # (O(MIDG)); MEL/VLC windows absorb K pairs of growth and
            # refresh at the outer boundary only.
            ms_win_refresh(ms_bp >> 3)

            left0 = row_read(rho_ref, g + 1, qx0) & 0xF
            sym0, top0, mst, vlc_bp = quad_sym(
                g, qx0, act0, left0, (k, run, pend, mel_bp), vlc_bp)
            rho0 = sym0 & 0xF
            if HAS2:
                sym1, top1, mst, vlc_bp = quad_sym(
                    g, qx1, act1, rho0, mst, vlc_bp)
            else:
                sym1 = jnp.zeros_like(sym0)
                top1 = sym1
            off0 = (sym0 & 0x10) != 0
            off1 = (sym1 & 0x10) != 0
            k, run, pend, mel_bp = mst
            if HAS2:
                # initial-row-pair MEL event (both u_off = 1 only)
                evu, k, run, pend, mel_bp = mel_event(
                    act0 & initial & off0 & off1, k, run, pend, mel_bp)
            else:
                evu = jnp.zeros_like(sym0)
            u0, u1, vlc_bp = uvlc_pair(initial, evu, off0, off1, vlc_bp)

            svals0, smasks0, st0, ms_bp = magsgn_quad(sym0, top0, u0,
                                                      act0, ms_bp)
            if HAS2:
                svals1, smasks1, st1, ms_bp = magsgn_quad(sym1, top1, u1,
                                                          act1, ms_bp)

            # -- state + output writes -------------------------------------
            rowr = rho_ref[g + 1]
            rowr = jnp.where((qiota == qx0 + 1) & act0, st0, rowr)
            if HAS2:
                rowr = jnp.where((qiota == qx1 + 1) & act1, st1, rowr)
            rho_ref[g + 1] = rowr
            write_quad(g, qx0, svals0, smasks0)
            if HAS2:
                write_quad(g, qx1, svals1, smasks1)
            return (ms_bp, mel_bp, vlc_bp, k, run, pend)

        def outer_body(o, carry):
            (ms_bp, mel_bp, vlc_bp, _, _, _) = carry
            ms_mid_refresh(ms_bp >> 3)
            st, ba = stage_load(mel_ref, mel_bp >> 3)
            mel_st[...] = st
            mel_ba[...] = ba
            st, ba = stage_load3(vlc_ref, vlc_bp >> 3)
            vlc_st[...] = st
            vlc_ba[...] = ba
            return jax.lax.fori_loop(o * K, o * K + K, pair_body, carry)

        zi = jnp.zeros(lane_sh, jnp.int32)
        jax.lax.fori_loop(0, NO, outer_body,
                          (zi, zi, zi, zi, zi, zi))

        if refine:
            # ---- HT SigProp + HT MagRef (plane p-1, 4-row stripe scan,
            # raw clean bits) — matches t1ht.scalar.ht_decode_block ----
            np_l = np_ref[...]
            bp_l = p_l - 1
            half_bp = jnp.where(bp_l > 0, one << bp_l, 0)
            mag_new = (one << (bp_l + 1)) + half_bp
            w2iota = iota_for(W + 2)
            # state grid: 0 none, 1 cleanup-sig, 2 sigprop-sig (MagRef
            # refines only the cleanup-sig samples)
            sig_ref[...] = jnp.zeros((H + 2, W + 2) + arr_tail, jnp.int32)
            core = out_ref[...]
            sig_ref[1:H + 1, 1:W + 1] = (core != 0).astype(jnp.int32)
            rf_st[...] = jnp.zeros((64,) + arr_tail, jnp.int32)
            rf_ba[...] = jnp.zeros(lane_sh, jnp.int32)

            def sig3(r, x):
                v = (sig_ref[r, pl.ds(x, 3)] != 0).astype(jnp.int32)
                return jnp.sum(v, axis=0, keepdims=kd) if S == 1 \
                    else jnp.sum(v.reshape(3, S, LANES), axis=0)

            def sigc(r, x1):
                v = sig_ref[r, pl.ds(x1, 1)]
                return v if S == 1 else jnp.sum(v, axis=0)

            def vcur(y, x):
                v = out_ref[y, pl.ds(x, 1)]
                return v if S == 1 else jnp.sum(v, axis=0)

            NC2 = max(H // 4, 1) * W
            K2 = 16
            while NC2 % K2:
                K2 //= 2

            def sp_col(col, bp):
                x = col % W
                y0 = (col // W) * 4
                for dy in range(4):
                    y = y0 + dy            # H is pow2 >= 4: stripes exact
                    act = (val_l == 1) & (np_l >= 2) & (x < wv) & \
                        ((y0 + dy) < hv) & (p_l > 0)
                    ctr = sigc(y + 1, x + 1)
                    n9 = sig3(y, x) + sig3(y + 1, x) + sig3(y + 2, x)
                    cand = act & (ctr == 0) & (n9 > 0)
                    w2 = bits_at(rf_st[...], rf_ba[...], bp)
                    bit = w2 & 1
                    sgn = (w2 >> 1) & 1
                    newsig = cand & (bit == 1)
                    bp = bp + jnp.where(newsig, 2,
                                        jnp.where(cand, 1, 0))
                    mv = jnp.where(sgn == 1, -mag_new, mag_new)
                    row = out_ref[y]
                    out_ref[y] = jnp.where((wiota == x) & newsig, mv,
                                           row)
                    rowg = sig_ref[y + 1]
                    sig_ref[y + 1] = jnp.where(
                        (w2iota == x + 1) & newsig, 2, rowg)
                return bp

            def sp_group(o, bp):
                st_, ba_ = stage_load(sp_ref, bp >> 3)
                rf_st[...] = st_
                rf_ba[...] = ba_
                return jax.lax.fori_loop(o * K2, o * K2 + K2, sp_col, bp)

            jax.lax.fori_loop(0, NC2 // K2, sp_group,
                              jnp.zeros(lane_sh, jnp.int32))

            def mr_col(col, bp):
                x = col % W
                y0 = (col // W) * 4
                for dy in range(4):
                    y = y0 + dy
                    act = (val_l == 1) & (np_l >= 3) & (x < wv) & \
                        ((y0 + dy) < hv) & (p_l > 0)
                    cond = act & (sigc(y + 1, x + 1) == 1)
                    w2 = bits_at(rf_st[...], rf_ba[...], bp)
                    bit = w2 & 1
                    bp = bp + cond.astype(jnp.int32)
                    cur = vcur(y, x)
                    av = jnp.abs(cur)
                    vq = (av - half) >> p1
                    nm = ((vq << 1) | bit) << p_l
                    nm = nm + half_bp
                    nm = jnp.where(cur < 0, -nm, nm)
                    row = out_ref[y]
                    out_ref[y] = jnp.where((wiota == x) & cond, nm, row)
                return bp

            def mr_group(o, bp):
                st_, ba_ = stage_load(mr_ref, bp >> 3)
                rf_st[...] = st_
                rf_ba[...] = ba_
                return jax.lax.fori_loop(o * K2, o * K2 + K2, mr_col, bp)

            jax.lax.fori_loop(0, NC2 // K2, mr_group,
                              jnp.zeros(lane_sh, jnp.int32))

    lut_in = jnp.asarray(DEC_PLANES.reshape(
        (DEC_PLANES.shape[0], NW, 1, 1)))
    scratch = [
        pltpu.VMEM((GH + 1, GW + 2) + arr_tail, jnp.int32),  # rho+eb
        pltpu.VMEM((64,) + arr_tail, jnp.int32),             # ms win
        pltpu.VMEM((64,) + arr_tail, jnp.int32),             # mel win
        pltpu.VMEM((96,) + arr_tail, jnp.int32),             # vlc win
        pltpu.VMEM(lane_sh, jnp.int32),                      # ms base
        pltpu.VMEM(lane_sh, jnp.int32),                      # mel base
        pltpu.VMEM(lane_sh, jnp.int32),                      # vlc base
        pltpu.VMEM((MIDG, 32) + arr_tail, jnp.int32),        # ms mid
        pltpu.VMEM(lane_sh, jnp.int32),                      # mid base
    ]
    ins = [ms_d, mel_d, vlc_d, pv, wh, valid, lut_in]
    if refine:
        scratch += [
            pltpu.VMEM((H + 2, W + 2) + arr_tail, jnp.int32),  # sig grid
            pltpu.VMEM((64,) + arr_tail, jnp.int32),           # rf win
            pltpu.VMEM(lane_sh, jnp.int32),                    # rf base
        ]
        ins = [ms_d, mel_d, vlc_d, pv, wh, valid, lut_in,
               sp_d, mr_d, npv]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W) + arr_tail, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)
    return out


def sublanes_for_ht(W: int, H: int, max_stream: int = 0) -> int:
    """Sublane batch bounded by VMEM: out + rho scratch + the three
    staged byte-pair stream buffers + the window/mid staging scratches
    (int32 words per lane).  Threshold 12.5 MB under the ~16 MB scoped
    VMEM budget (the pre-hierarchy guard at 11 MB ignored the staging
    values the old kernel carried in registers/spills).  Returns the
    largest power-of-two S in {8, 4, 2, 1} that fits: long-stream
    (dense lossless) buckets that can't afford S=8 still batch 512/256
    lanes per launch instead of collapsing straight to 128 — launch
    time is nearly S-independent, so this is ~S× decode throughput."""
    GH, GW = (H + 1) // 2, (W + 1) // 2
    words = H * W + (GH + 1) * (GW + 2)    # packed (ebot<<4)|rho scratch
    words += 64 + 64 + 96 + 10 * 32 + 4    # windows + MagSgn mid + bases
    if max_stream:
        words += _quant_len(max_stream) + 2 * 256   # ms + mel + vlc pairs
    for s in (8, 4, 2):
        if words * s * 128 * 4 <= 12.5 * 2 ** 20:
            return s
    return 1


def floor_pow2(n: int) -> int:
    """Largest power of two <= n (n >= 1).  Kernel S values must be
    powers of two: intermediate sublane counts (e.g. S=3 from a
    count-limited min) send Mosaic compiles off a cliff (CLAUDE.md)."""
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


def sublanes_for_count(nblocks: int, s_vmem: int) -> int:
    """Sublane pick that minimizes LAUNCHES: the smallest power-of-two S
    (capped by the VMEM bound s_vmem, itself a power of two) whose
    S*128-lane launch covers the demand.  Launch time is nearly
    lane-count-independent on hardware, so one padded 512-lane launch
    beats 256+84 split over two — idle lanes are free, launches are
    not."""
    need = -(-nblocks // LANES)
    p = 1
    while p < need and p < s_vmem:
        p *= 2
    return p


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def decode_ht_blocks(blocks: list[dict], interpret: bool = False):
    """Batched device decode of eligible HT blocks, bucketed by shape.

    Returns per-block (mag2 int64 (h, w), neg bool) like ht_decode_block.
    Callers pre-filter with ht_block_eligible."""
    results: list = [None] * len(blocks)
    buckets: dict[tuple, list[int]] = {}
    for i, b in enumerate(blocks):
        if "_ht_hdr" not in b:
            ok = ht_block_eligible(b)   # fills b["_ht_hdr"]
            if not ok:
                raise ValueError("ineligible HT block reached the "
                                 "device path")
        refine = b["numpasses"] > 1
        Hb = _pow2_at_least(b["h"])
        if refine:
            # the refine stripe loops walk full 4-row stripes (masked
            # values, UNmasked indices): pad tiny blocks to H >= 4
            Hb = max(Hb, 4)
        key = (_pow2_at_least(b["w"]), Hb, refine)
        buckets.setdefault(key, []).append(i)
    for (W, H, refine), idxs in buckets.items():
        mx = max(max(len(x) for x in blocks[i]["_ht_hdr"])
                 for i in idxs)
        S = sublanes_for_count(len(idxs), sublanes_for_ht(W, H, mx))
        step = S * LANES
        for kchunk in range(0, len(idxs), step):
            chunk = idxs[kchunk:kchunk + step]
            ms_d, mel_d, vlc_d, pv, wh, valid = pack_ht_for_pallas(
                [blocks[i] for i in chunk], S)
            if refine:
                NL = S * LANES
                sp_d = _pack_raw([blocks[i]["_ht_hdr"][3]
                                  for i in chunk], S)
                mr_d = _pack_raw([blocks[i]["_ht_hdr"][4]
                                  for i in chunk], S)
                npv = np.zeros((NL,), np.int32)
                for j, i in enumerate(chunk):
                    npv[j] = blocks[i]["numpasses"]
                npv = npv.reshape(S, LANES) if S > 1 \
                    else npv.reshape(1, LANES)
                out = pallas_ht_decode_refine(
                    jnp.asarray(ms_d), jnp.asarray(mel_d),
                    jnp.asarray(vlc_d), jnp.asarray(pv),
                    jnp.asarray(wh), jnp.asarray(valid),
                    jnp.asarray(sp_d), jnp.asarray(mr_d),
                    jnp.asarray(npv), W, H, S, interpret)
            else:
                out = pallas_ht_decode(
                    jnp.asarray(ms_d), jnp.asarray(mel_d),
                    jnp.asarray(vlc_d), jnp.asarray(pv),
                    jnp.asarray(wh), jnp.asarray(valid),
                    W, H, S, interpret)
            out = np.asarray(out)
            for j, i in enumerate(chunk):
                b = blocks[i]
                if S > 1:
                    v = out[:b["h"], :b["w"], j // LANES, j % LANES]
                else:
                    v = out[:b["h"], :b["w"], j]
                results[i] = (np.abs(v).astype(np.int64), v < 0)
    return results
