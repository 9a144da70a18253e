"""Coding tables + context machinery for the HT cleanup pass.

ISO/IEC 15444-15 structure (SURVEY.md §2 row 8):

  - CxtVLC: per-context variable-length codes (<= 7 bits) jointly coding
    a quad's significance pattern rho and its u_off bit (whether the
    quad's exponent bound exceeds the predicted kappa).  The symbol
    space reserves bits 5..8 for the spec's EMB pattern epsilon_k; the
    default tables code epsilon_k = 0 (no magnitude-bit suppression) —
    drop normative tables in here (kind="normative") for interop once a
    spec/oracle source is available.
  - Sample-level context formation: the context of quad q is built from
    the significance of individual neighbouring SAMPLES (the right
    column of the quad to the left, the bottom row of the quad above,
    and the bottom-left sample of the quad above-right), not from
    whole-quad significance.
  - Exponent prediction: for quads outside the initial row-pair with
    more than one significant sample, kappa_q = max(1, E_above - 1)
    where E_above is the largest exponent among the bottom-row samples
    of the quad directly above; else kappa_q = 1.  The coded u_q is
    U_q - kappa_q, so vertically correlated magnitudes cost 1-2 UVLC
    bits instead of 8.
  - UVLC: prefix/suffix code for u >= 1 (see uvlc_encode).

The default code lengths are TRAINED on a synthetic corpus
(tools/gen_ht_tables.py) and baked below; canonical codewords are
derived at import, stored with the transmitted-first bit at bit 0
(LSB-first streams).  Encoder/decoder/device kernels all read these
tables, so swapping in the normative lengths/codes is a one-file
change.
"""

from __future__ import annotations

import heapq

N_CTX = 8
MAX_CLEN = 7                    # decoder peeks a 7-bit window

_POP = [bin(i).count("1") for i in range(16)]


def quad_ctx(rho_w: int, rho_n: int, rho_ne: int) -> int:
    """Sample-level context of a quad from its coded neighbours.

    rho_w: significance pattern of the quad to the left (same row pair);
    rho_n / rho_ne: patterns of the quads above / above-right (previous
    row pair; 0 for the initial row pair).  Sample bits within a quad:
    n0=(0,0) n1=(1,0) n2=(0,1) n3=(1,1) (column-major, (dy,dx)).
    """
    c = 1 if (rho_w & 0b1100) else 0          # left quad, right column
    if rho_n & 0b1010:                        # above quad, bottom row
        c |= 2
    if rho_ne & 0b0010:                       # above-right, bottom-left
        c |= 4
    return c


def quad_kappa(rho: int, e_above: int) -> int:
    """Exponent-bound predictor: U_q = kappa_q + u_q."""
    if rho & (rho - 1):                       # popcount > 1
        return max(1, e_above - 1)
    return 1


# --- UVLC ------------------------------------------------------------------
#
# Prefix classes (transmitted-first bit at bit 0, shown for the default
# polarity UVLC_PXOR = 0):
#   "0"            -> u = 1                    (1-bit prefix, no suffix)
#   "1 0"          -> u = 2                    (2-bit prefix, no suffix)
#   "1 1 0" + s1   -> u = 3 + s1               (3-bit prefix, 1 suffix bit)
#   "1 1 1" + s5   -> u = 5 + s5  (s5 < 31)    (3-bit prefix, 5 suffix bits)
#                     u = 36 + e5 (s5 == 31)   (+5 extension bits)
#
# UVLC_PXOR (WIRE_AUDIT delta #2 knob): bit i of UVLC_PXOR flips the
# i-th TRANSMITTED prefix bit on the wire (suffix/extension bits are
# plain binary either way).  The class SHAPE (1/2/3-bit prefixes and
# suffix lengths) is structural; only the bit polarity is a normative
# unknown.  Set via install_tables(uvlc_prefix_xor=...); every backend
# (scalar, C wire, both Pallas kernels) reads it from here.
#
# Quads are UVLC-coded in PAIRS along each quad row (ISO/IEC 15444-15
# structure): when both quads of a pair have u_off = 1 the two PREFIXES
# are transmitted first, then the two suffixes (each suffix immediately
# followed by its extension bits when present) — see
# t1ht.scalar._emit_u_pair / _read_u_pair for the initial-row-pair MEL
# event and the one-bit u1 special case.

UVLC_PXOR = 0


def uvlc_parts(u: int) -> tuple[int, int, int, int]:
    """(pfx_len, pfx_bits, sfx_len, sfx_bits) for u >= 1; the suffix
    carries the 5-bit escape extension for u >= 36 (sfx_len 10).
    pfx_bits are wire bits (UVLC_PXOR applied)."""
    if u == 1:
        pl, pb, sl, sb = 1, 0b0, 0, 0
    elif u == 2:
        pl, pb, sl, sb = 2, 0b01, 0, 0
    elif u <= 4:
        pl, pb, sl, sb = 3, 0b011, 1, u - 3
    elif u <= 35:
        pl, pb, sl, sb = 3, 0b111, 5, u - 5
    else:
        assert u <= 67, "u out of range"
        pl, pb, sl, sb = 3, 0b111, 10, 31 | ((u - 36) << 5)
    return pl, pb ^ (UVLC_PXOR & ((1 << pl) - 1)), sl, sb


def uvlc_encode(u: int) -> tuple[int, int]:
    """(length, bits) for a SINGLE u >= 1 (u = U_q - kappa_q when
    u_off = 1 and the pair partner has u_off = 0)."""
    pl, pb, sl, sb = uvlc_parts(u)
    return pl + sl, pb | (sb << pl)


def uvlc_decode(read_bit) -> int:
    x = UVLC_PXOR
    if read_bit() ^ (x & 1) == 0:
        return 1
    if read_bit() ^ ((x >> 1) & 1) == 0:
        return 2
    if read_bit() ^ ((x >> 2) & 1) == 0:
        return 3 + read_bit()
    s = 0
    for i in range(5):
        s |= read_bit() << i
    if s < 31:
        return 5 + s
    v = 0
    for i in range(5):
        v |= read_bit() << i
    return 36 + v


# --- CxtVLC ----------------------------------------------------------------
# Symbol encoding: sym = (eps_k << 5) | (u_off << 4) | rho.  rho == 0
# implies u_off == 0 and eps_k == 0 (sym 0); context 0 has no rho == 0
# entry (MEL signals significance there).  Default tables: eps_k = 0.

def _symbols(ctx: int):
    syms = [] if ctx == 0 else [0]
    for rho in range(1, 16):
        syms.append(rho)            # u_off = 0
        syms.append(0x10 | rho)     # u_off = 1
    return syms


def _heuristic_weights(ctx: int) -> dict[int, float]:
    act = _POP[ctx & 7]
    w = {}
    for sym in _symbols(ctx):
        rho = sym & 0xF
        p = _POP[rho]
        base = 2.0 ** (4 - p)
        if act:
            base *= 1.5 ** (p * act / 3.0)
        if rho == 0:
            base *= 8.0
        w[sym] = base * (0.6 if sym & 0x10 else 0.4)
    return w


def _huffman_lengths(weights: dict[int, float],
                     maxlen: int = MAX_CLEN) -> dict[int, int]:
    """Huffman code lengths, clamped to maxlen with Kraft repair."""
    if len(weights) == 1:
        return {next(iter(weights)): 1}
    heap = [(wt, i, (s,)) for i, (s, wt) in enumerate(weights.items())]
    heapq.heapify(heap)
    lengths = {s: 0 for s in weights}
    n = len(heap)
    while len(heap) > 1:
        w1, _, s1 = heapq.heappop(heap)
        w2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        n += 1
        heapq.heappush(heap, (w1 + w2, n, s1 + s2))
    for s in lengths:
        lengths[s] = min(max(lengths[s], 1), maxlen)
    syms = sorted(lengths, key=lambda s: (lengths[s], s))
    kraft = sum(2.0 ** -lengths[s] for s in syms)
    i = 0
    while kraft > 1.0 + 1e-12:
        s = syms[i % len(syms)]
        if lengths[s] < maxlen:
            kraft -= 2.0 ** -lengths[s] - 2.0 ** -(lengths[s] + 1)
            lengths[s] += 1
        i += 1
    return lengths


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Canonical codewords (MSB-first), shorter codes first then by
    symbol; returned bit-reversed so the transmitted-first bit is at
    bit 0."""
    code = 0
    prev_len = 0
    enc = {}
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[s]
        code <<= ln - prev_len
        rev = int(format(code, f"0{ln}b")[::-1], 2)
        enc[s] = (ln, rev)
        code += 1
        prev_len = ln
    return enc


# Trained code lengths (tools/gen_ht_tables.py over the synthetic
# corpus, 1.63 M quads, 2.58 bits/quad; regenerate after coding-model
# changes).
_TRAINED_LENS = {
    0: {1: 4, 2: 3, 3: 5, 4: 3, 5: 5, 6: 4, 7: 7, 8: 3, 9: 4, 10: 4, 11: 7, 12: 5, 13: 7, 14: 6, 15: 7, 17: 7, 18: 7, 19: 7, 20: 7, 21: 7, 22: 7, 23: 7, 24: 7, 25: 7, 26: 7, 27: 7, 28: 7, 29: 7, 30: 7, 31: 3},
    1: {0: 3, 1: 5, 2: 5, 3: 7, 4: 5, 5: 6, 6: 6, 7: 7, 8: 5, 9: 6, 10: 6, 11: 7, 12: 7, 13: 7, 14: 7, 15: 7, 17: 7, 18: 7, 19: 7, 20: 7, 21: 7, 22: 7, 23: 5, 24: 7, 25: 7, 26: 7, 27: 5, 28: 7, 29: 5, 30: 5, 31: 2},
    2: {0: 3, 1: 4, 2: 3, 3: 4, 4: 4, 5: 6, 6: 5, 7: 6, 8: 4, 9: 5, 10: 5, 11: 6, 12: 4, 13: 6, 14: 6, 15: 5, 17: 7, 18: 7, 19: 7, 20: 7, 21: 7, 22: 7, 23: 7, 24: 7, 25: 7, 26: 7, 27: 7, 28: 7, 29: 7, 30: 7, 31: 4},
    3: {0: 5, 1: 6, 2: 6, 3: 7, 4: 6, 5: 7, 6: 6, 7: 6, 8: 6, 9: 6, 10: 6, 11: 6, 12: 6, 13: 6, 14: 6, 15: 3, 17: 7, 18: 7, 19: 7, 20: 7, 21: 7, 22: 7, 23: 5, 24: 7, 25: 7, 26: 7, 27: 5, 28: 7, 29: 5, 30: 5, 31: 2},
    4: {0: 3, 1: 3, 2: 4, 3: 5, 4: 3, 5: 5, 6: 4, 7: 7, 8: 3, 9: 5, 10: 5, 11: 7, 12: 5, 13: 7, 14: 5, 15: 7, 17: 7, 18: 7, 19: 7, 20: 7, 21: 7, 22: 7, 23: 7, 24: 7, 25: 7, 26: 7, 27: 7, 28: 7, 29: 7, 30: 7, 31: 7},
    5: {0: 4, 1: 4, 2: 4, 3: 5, 4: 4, 5: 4, 6: 4, 7: 5, 8: 4, 9: 4, 10: 4, 11: 5, 12: 5, 13: 6, 14: 6, 15: 5, 17: 7, 18: 7, 19: 7, 20: 7, 21: 7, 22: 7, 23: 6, 24: 7, 25: 7, 26: 7, 27: 7, 28: 7, 29: 7, 30: 7, 31: 3},
    6: {0: 5, 1: 7, 2: 7, 3: 7, 4: 7, 5: 7, 6: 7, 7: 6, 8: 7, 9: 7, 10: 7, 11: 7, 12: 7, 13: 6, 14: 7, 15: 2, 17: 7, 18: 7, 19: 7, 20: 7, 21: 7, 22: 7, 23: 6, 24: 7, 25: 7, 26: 7, 27: 6, 28: 7, 29: 5, 30: 5, 31: 2},
    7: {0: 7, 1: 7, 2: 7, 3: 7, 4: 7, 5: 7, 6: 7, 7: 6, 8: 7, 9: 7, 10: 7, 11: 6, 12: 7, 13: 6, 14: 6, 15: 2, 17: 7, 18: 7, 19: 7, 20: 7, 21: 7, 22: 7, 23: 5, 24: 7, 25: 7, 26: 7, 27: 5, 28: 7, 29: 5, 30: 4, 31: 2},
}


def _dec_from_enc(enc_tables):
    """Peek-window decode LUTs from canonical encode maps (one list of
    128-entry (sym, len) tables per context)."""
    dec_tables = []
    for enc in enc_tables:
        dec = [(-1, 0)] * (1 << MAX_CLEN)
        for sym, (ln, code) in enc.items():
            for pad in range(1 << (MAX_CLEN - ln)):
                dec[code | (pad << ln)] = (sym, ln)
        dec_tables.append(dec)
    return dec_tables


def _repair_lens(lens: dict[int, int]) -> dict[int, int]:
    """Clamp to MAX_CLEN and repair the Kraft sum by lengthening."""
    syms = sorted(lens, key=lambda s: (lens[s], s))
    kraft = sum(2.0 ** -lens[s] for s in syms)
    i = 0
    while kraft > 1.0 + 1e-12:
        s = syms[i % len(syms)]
        if lens[s] < MAX_CLEN:
            kraft -= 2.0 ** -lens[s] - 2.0 ** -(lens[s] + 1)
            lens[s] += 1
        i += 1
    return lens


def _build(kind: str = "trained"):
    enc_tables = []
    for c in range(N_CTX):
        if kind == "trained" and _TRAINED_LENS is not None:
            lens = dict(_TRAINED_LENS[c])
            # guarantee every legal symbol has a code (corpus gaps)
            for s in _symbols(c):
                lens.setdefault(s, MAX_CLEN)
            lens = _repair_lens(lens)
        else:
            lens = _huffman_lengths(_heuristic_weights(c))
        enc_tables.append(_canonical(lens))
    return enc_tables, _dec_from_enc(enc_tables)


VLC_ENC, VLC_DEC = _build()

# --- table families + normative drop-in point ------------------------------
#
# The spec defines SEPARATE CxtVLC tables for the INITIAL quad-row pair
# vs the rest (WIRE_AUDIT delta #3).  VLC_ENC/VLC_DEC is the
# non-initial family; VLC_ENC_INIT/VLC_DEC_INIT is the initial-row
# family.  By default both names point at the SAME objects (identity
# `VLC_ENC_INIT is VLC_ENC` is the one-family fast path the kernels
# key on); install_tables() is where a normative table drop-in lands.
# VERSION is bumped on every install so trace-time LUT caches
# (ops/pallas_ht.py, ops/pallas_ht_enc.py) rebuild and re-jit.

VLC_ENC_INIT, VLC_DEC_INIT = VLC_ENC, VLC_DEC
VERSION = 0


def two_families() -> bool:
    return VLC_ENC_INIT is not VLC_ENC


def tables_have_ek() -> bool:
    """Any installed table family codes an eps_k != 0 symbol (EMB)."""
    for fam in (VLC_ENC, VLC_ENC_INIT):
        for enc in fam:
            for sym in enc:
                if sym >= 32:
                    return True
        if not two_families():
            break
    return False


def install_tables(*, enc=None, enc_init=None, lens=None, lens_init=None,
                   uvlc_prefix_xor: int = 0):
    """Install CxtVLC tables + UVLC polarity (the normative drop-in
    point — WIRE_AUDIT deltas #1/#2/#3/#5 all land here).

    This is a FULL install, not a patch: every aspect is set on every
    call — an omitted enc/lens keeps the CURRENT non-initial family,
    but an omitted *_init always re-aliases the initial-row family to
    the non-initial one (single-family mode) and an omitted
    uvlc_prefix_xor always resets the polarity to 0.  Callers swapping
    one aspect must re-pass the others.

    enc / enc_init: per-context list of {sym: (len, code)} canonical
    maps (code with the transmitted-first bit at bit 0).  lens /
    lens_init: per-context {sym: len} maps (canonical codes derived
    here; Kraft-repaired).  Symbols may include eps_k bits (sym =
    eps<<5 | u_off<<4 | rho); every legal eps=0 symbol must be
    codeable (the encoders' fallback entries).

    Every backend re-derives from here: the scalar coder reads the
    module attributes per call; both Pallas kernels rebuild their
    bit-sliced LUTs keyed on VERSION and re-jit.  Serving plan/program
    caches are cleared."""
    global VLC_ENC, VLC_DEC, VLC_ENC_INIT, VLC_DEC_INIT
    global UVLC_PXOR, VERSION
    if enc is None and lens is not None:
        enc = [_canonical(_repair_lens(dict(lc))) for lc in lens]
    if enc_init is None and lens_init is not None:
        enc_init = [_canonical(_repair_lens(dict(lc)))
                    for lc in lens_init]
    if enc is not None:
        for c in range(N_CTX):
            for s in _symbols(c):
                assert s in enc[c], f"ctx {c}: base symbol {s} uncodeable"
        VLC_ENC = list(enc)
        VLC_DEC = _dec_from_enc(VLC_ENC)
    if enc_init is not None:
        for c in range(N_CTX):
            for s in _symbols(c):
                assert s in enc_init[c], \
                    f"init ctx {c}: base symbol {s} uncodeable"
        VLC_ENC_INIT = list(enc_init)
        VLC_DEC_INIT = _dec_from_enc(VLC_ENC_INIT)
    else:
        VLC_ENC_INIT, VLC_DEC_INIT = VLC_ENC, VLC_DEC
    UVLC_PXOR = int(uvlc_prefix_xor) & 7
    VERSION += 1
    _clear_downstream_caches()


def reset_tables():
    """Restore the default trained single-family tables."""
    global VLC_ENC, VLC_DEC, VLC_ENC_INIT, VLC_DEC_INIT
    global UVLC_PXOR, VERSION
    VLC_ENC, VLC_DEC = _build()
    VLC_ENC_INIT, VLC_DEC_INIT = VLC_ENC, VLC_DEC
    UVLC_PXOR = 0
    VERSION += 1
    _clear_downstream_caches()


def _clear_downstream_caches():
    """Serving plans AND cached traced programs bake table state (the
    jitted serving programs close over the kernel wrappers' trace-time
    table version) — drop them all so the next call re-derives."""
    import sys
    serve = sys.modules.get("grok_tpu.pipeline.serve")
    if serve is not None:
        serve._PLANS.clear()
    serve_enc = sys.modules.get("grok_tpu.pipeline.serve_enc")
    if serve_enc is not None:
        serve_enc._EPLANS.clear()
        serve_enc._build_encode_fn.cache_clear()
        serve_enc._build_encode_fn_mq.cache_clear()
    device = sys.modules.get("grok_tpu.pipeline.device")
    if device is not None:
        device._build_decode_fn.cache_clear()
