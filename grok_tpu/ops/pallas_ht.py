"""Pallas TPU kernel: batched HTJ2K (Part 15) cleanup-pass decode.

The HT cleanup segment was designed device-first (t1ht/scalar.py): all
three sub-streams are LSB-first without 0xFF bit-stuffing and the rho
codes are fixed-width (t1ht/tables._build kind="flat"), so the lockstep
decoder reads every field as `(word >> shift) & mask` — no per-bit loops
and no code-table gathers.  One fori iteration decodes a whole 2x2 quad:

  - quad context from a (GH+1, GW+2) rho scratch (3 point loads),
  - the MEL event via carried (k, run, pending) registers and a single
    6-bit peek,
  - rho + UVLC via two peeks of the VLC stream,
  - four maskable MagSgn reads of U+1 bits each.

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
    """Split a cleanup segment into (p, magsgn, mel, vlc-forward) or None
    if the framing is invalid (mirrors t1ht.scalar.ht_decode_block)."""
    L = seg_lens[0] if seg_lens else len(data)
    if L > len(data) or L < 6:
        return None
    p = data[0]
    scup = data[L - 2] | (data[L - 1] << 8)
    mel_len = data[L - 4] | (data[L - 3] << 8)
    if scup < 4 or scup > L - 1 or mel_len > scup - 4:
        return None
    ms = data[1:L - scup]
    mel = data[L - scup:L - scup + mel_len]
    vlc = bytes(reversed(data[L - scup + mel_len:L - 4]))
    return p, ms, mel, vlc


def ht_block_eligible(job: dict) -> bool:
    """Kernel path: single cleanup segment, valid framing, U+1 <= 25 bits
    per MagSgn read (the staged word guarantees 25 valid bits).  Caches
    the parsed header in job["_ht_hdr"] for the packer."""
    if job["numpasses"] != 1:
        return False
    sl = job.get("seg_lens") or [len(job["data"])]
    if len(sl) > 1:
        return False
    hdr = job.get("_ht_hdr")
    if hdr is None:
        hdr = parse_ht_header(job["data"], sl)
        if hdr is None:
            return False
        job["_ht_hdr"] = hdr
    if max(len(hdr[1]), len(hdr[2]), len(hdr[3])) > MAX_STREAM:
        return False
    return job["numbps"] - hdr[0] <= 24


# Longest per-lane stream the kernel accepts.  The staged-window design
# re-reads the whole (G, 32, lanes) buffer at every refresh, so G is both
# a VMEM-pressure and a Mosaic-compile bound — G > ~128 sends compiles
# off a cliff (reproduced: G=256 hangs).  Oversized blocks fall back to
# the scalar path; encoders that want the device path use smaller
# code-blocks (32x32 keeps lossless 8bpp streams ~1 KB).
MAX_STREAM = 128 * 32 - 8


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
        p, ms, mel, vlc = hdr
        mss.append(ms)
        mels.append(mel)
        vlcs.append(vlc)
        pv[j] = p
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


@partial(jax.jit, static_argnums=(6, 7, 8, 9))
def pallas_ht_decode(ms_raw, mel_raw, vlc_raw, pv, wh, valid,
                     W: int, H: int, S: int, interpret: bool = False):
    """Decode a batch of S*128 HT cleanup blocks with one Pallas kernel.

    ms/mel/vlc_raw: (NL, Lb+1) uint8 per-lane streams (_pack_raw); the
    byte-pair staging tensors are built here on device.  Returns signed
    mag2 (H, W, [S,] LANES) int32 (negative = sign bit), with the Part-1
    half-bit below plane p (matches ht_decode_block)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ms_d = device_pairs(ms_raw, S)
    mel_d = device_pairs(mel_raw, S)
    vlc_d = device_pairs(vlc_raw, S)

    GH, GW = (H + 1) // 2, (W + 1) // 2
    arr_tail = (S, LANES) if S > 1 else (LANES,)
    nd = len(arr_tail)
    lane_sh = (S, LANES) if S > 1 else (1, LANES)
    kd = S == 1
    NQ = GH * GW
    K = min(16, NQ)           # NQ is a pow2 product: K always divides it
    assert NQ % K == 0, (W, H)   # callers bucket W/H to powers of two
    NO = NQ // K
    MIDG = 10                 # MagSgn mid granules: 31 B skew + 16 quads
                              # * 12.5 B + 2-granule window <= 10 * 32 B

    def iota_for(n):
        return jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * nd, 0)

    def kernel(ms_ref, mel_ref, vlc_ref, p_ref, wh_ref, valid_ref,
               out_ref, rho_ref, ms_st, mel_st, vlc_st,
               ms_ba, mel_ba, vlc_ba, ms_mid, ms_mba):
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
        rho_ref[...] = jnp.zeros((GH + 1, GW + 2) + arr_tail, jnp.int32)
        for st in (ms_st, mel_st, vlc_st):
            st[...] = jnp.zeros((64,) + arr_tail, jnp.int32)
        for ba in (ms_ba, mel_ba, vlc_ba, ms_mba):
            ba[...] = jnp.zeros(lane_sh, jnp.int32)
        ms_mid[...] = jnp.zeros((MIDG, 32) + arr_tail, jnp.int32)

        siota = iota_for(64)
        wiota = iota_for(W)
        qiota = iota_for(GW + 2)
        giotas = {G: jax.lax.broadcasted_iota(
            jnp.int32, (G,) + (1,) * (nd + 1), 0)
            for G in {ms_ref.shape[0], mel_ref.shape[0], vlc_ref.shape[0]}}
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
            off = (bp >> 3) - base
            sel = (siota == off).astype(jnp.int32) + \
                (siota == off + 2).astype(jnp.int32) * 65536
            w = jnp.sum(stage * sel, axis=0, keepdims=kd)
            return w >> (bp & 7)

        def rho_read(gi, qi):
            v = rho_ref[gi, pl.ds(qi, 1)]
            if S == 1:
                return v
            return jnp.sum(v, axis=0)

        one = jnp.int32(1)
        half = jnp.where(p_l > 0, one << p_l, 0)
        p1 = p_l + 1

        def quad_body(t, carry):
            ms_bp, mel_bp, vlc_bp, k, run, pend = carry
            g = t // GW
            qx = t - g * GW
            act = (val_l == 1) & (g < gh_l) & (qx < gw_l)

            # MagSgn window slides up to 12.5 B/quad: reload from mid
            # (O(MIDG)); MEL/VLC windows absorb K quads of growth and
            # refresh at the outer boundary only.
            ms_win_refresh(ms_bp >> 3)
            ms_stage = ms_st[...]
            ms_base = ms_ba[...]
            mel_stage = mel_st[...]
            mel_base = mel_ba[...]
            vlc_stage = vlc_st[...]
            vlc_base = vlc_ba[...]

            left = rho_read(g + 1, qx)
            top = rho_read(g, qx + 1)
            topr = rho_read(g, qx + 2)
            c = (left != 0).astype(jnp.int32) | \
                ((top != 0).astype(jnp.int32) << 1) | \
                ((topr != 0).astype(jnp.int32) << 2)
            is_c0 = c == 0

            # -- MEL event (only context-0 quads consume) ------------------
            mel_mask = act & is_c0
            owed = mel_mask & (run > 0)
            pnd = mel_mask & ~owed & (pend == 1)
            need = mel_mask & ~owed & ~pnd
            e = jnp.where(k >= 12, 5,
                          jnp.where(k >= 11, 4,
                                    jnp.where(k >= 9, 3,
                                              jnp.where(k >= 6, 2,
                                                        jnp.where(k >= 3, 1,
                                                                  0)))))
            w6 = bits_at(mel_stage, mel_base, mel_bp)
            bit0 = w6 & 1
            rfld = (w6 >> 1) & ((one << e) - 1)
            zero_path = need & (bit0 == 0)
            one_path = need & (bit0 == 1)
            ev = (pnd | (one_path & (rfld == 0))).astype(jnp.int32)
            mel_bp = mel_bp + jnp.where(need,
                                        jnp.where(bit0 == 1, 1 + e, 1), 0)
            k = jnp.where(zero_path, jnp.minimum(k + 1, 12),
                          jnp.where(one_path, jnp.maximum(k - 1, 0), k))
            run = jnp.where(owed, run - 1,
                            jnp.where(zero_path, (one << e) - 1,
                                      jnp.where(one_path & (rfld > 0),
                                                rfld - 1, run)))
            pend = jnp.where(pnd, 0,
                             jnp.where(one_path & (rfld > 0), 1, pend))

            # -- rho via the fixed-width VLC -------------------------------
            w5 = bits_at(vlc_stage, vlc_base, vlc_bp)
            c0_sig = mel_mask & (ev == 1)
            cn = act & ~is_c0
            flag = w5 & 1
            rho = jnp.where(c0_sig, w5 & 0xF,
                            jnp.where(cn & (flag == 1), (w5 >> 1) & 0xF, 0))
            vlc_bp = vlc_bp + jnp.where(
                c0_sig, 4, jnp.where(cn, jnp.where(flag == 1, 5, 1), 0))

            # -- UVLC exponent offset u ------------------------------------
            umask = act & (rho != 0)
            w8 = bits_at(vlc_stage, vlc_base, vlc_bp)
            b0 = w8 & 1
            b1 = (w8 >> 1) & 1
            b2 = (w8 >> 2) & 1
            u = jnp.where(b0 == 0, 0,
                          jnp.where(b1 == 0, 1,
                                    jnp.where(b2 == 0, 2,
                                              3 + ((w8 >> 3) & 31))))
            ulen = jnp.where(b0 == 0, 1,
                             jnp.where(b1 == 0, 2,
                                       jnp.where(b2 == 0, 3, 8)))
            vlc_bp = vlc_bp + jnp.where(umask, ulen, 0)
            U = u + 1
            umax = (one << U) - 1

            # -- MagSgn: 4 maskable sequential reads of U+1 bits -----------
            svals = []
            smasks = []
            for i in range(4):
                m_i = umask & (((rho >> i) & 1) == 1)
                w = bits_at(ms_stage, ms_base, ms_bp)
                vi = (w & umax) + 1
                sg = (w >> U) & 1
                ms_bp = ms_bp + jnp.where(m_i, U + 1, 0)
                mag2 = (vi << p1) + half
                svals.append(jnp.where(sg == 1, -mag2, mag2))
                smasks.append(m_i)

            # -- state + output writes -------------------------------------
            rowr = rho_ref[g + 1]
            rho_ref[g + 1] = jnp.where((qiota == qx + 1) & act, rho, rowr)

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
            return (ms_bp, mel_bp, vlc_bp, k, run, pend)

        def outer_body(o, carry):
            (ms_bp, mel_bp, vlc_bp, _, _, _) = carry
            ms_mid_refresh(ms_bp >> 3)
            st, ba = stage_load(mel_ref, mel_bp >> 3)
            mel_st[...] = st
            mel_ba[...] = ba
            st, ba = stage_load(vlc_ref, vlc_bp >> 3)
            vlc_st[...] = st
            vlc_ba[...] = ba
            return jax.lax.fori_loop(o * K, o * K + K, quad_body, carry)

        zi = jnp.zeros(lane_sh, jnp.int32)
        jax.lax.fori_loop(0, NO, outer_body,
                          (zi, zi, zi, zi, zi, zi))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W) + arr_tail, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((GH + 1, GW + 2) + arr_tail, jnp.int32),  # rho
            pltpu.VMEM((64,) + arr_tail, jnp.int32),             # ms win
            pltpu.VMEM((64,) + arr_tail, jnp.int32),             # mel win
            pltpu.VMEM((64,) + arr_tail, jnp.int32),             # vlc win
            pltpu.VMEM(lane_sh, jnp.int32),                      # ms base
            pltpu.VMEM(lane_sh, jnp.int32),                      # mel base
            pltpu.VMEM(lane_sh, jnp.int32),                      # vlc base
            pltpu.VMEM((MIDG, 32) + arr_tail, jnp.int32),        # ms mid
            pltpu.VMEM(lane_sh, jnp.int32),                      # mid base
        ],
        interpret=interpret,
    )(ms_d, mel_d, vlc_d, pv, wh, valid)
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
    words = H * W + (GH + 1) * (GW + 2)
    words += 3 * 64 + 10 * 32 + 4          # windows + MagSgn mid + bases
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
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, b in enumerate(blocks):
        if "_ht_hdr" not in b:
            b["_ht_hdr"] = parse_ht_header(
                b["data"], b.get("seg_lens") or [len(b["data"])])
        key = (_pow2_at_least(b["w"]), _pow2_at_least(b["h"]))
        buckets.setdefault(key, []).append(i)
    for (W, H), idxs in buckets.items():
        mx = max(max(len(s) for s in blocks[i]["_ht_hdr"][1:4])
                 for i in idxs)
        S = sublanes_for_count(len(idxs), sublanes_for_ht(W, H, mx))
        step = S * LANES
        for kchunk in range(0, len(idxs), step):
            chunk = idxs[kchunk:kchunk + step]
            ms_d, mel_d, vlc_d, pv, wh, valid = pack_ht_for_pallas(
                [blocks[i] for i in chunk], S)
            out = pallas_ht_decode(
                jnp.asarray(ms_d), jnp.asarray(mel_d), jnp.asarray(vlc_d),
                jnp.asarray(pv), jnp.asarray(wh), jnp.asarray(valid),
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
