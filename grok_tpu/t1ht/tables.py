"""Context-adaptive VLC code tables for the HT cleanup pass.

The spec's CxtVLC maps (context, significance pattern rho, EMB pattern)
to codewords of <= 7 bits.  The normative tables (ISO/IEC 15444-15
Annex C) are unavailable in this offline environment, so we generate
self-consistent canonical prefix codes with the same interface: one code
per (context, rho) pair, lengths chosen from a heuristic probability
model (sparse patterns are likelier, significance clusters).  Encoder
and decoder share these tables; swap in the normative ones here for
interoperability.

Layout per context c in [0, 8):
  ENC[c][rho] = (length, codeword)   transmitted-first bit = codeword
                                     bit 0 (LSB-first streams), len <= 7
  DEC[c][window7] = (rho, length)    LUT over the next 7 stream bits
                                     (first bit at window bit 0)

Context 0 excludes rho == 0 (MEL already signalled significance), other
contexts include it.

UVLC codes the quad magnitude-exponent offset u = U - 1 (bit strings
in transmission order): 0 -> "0", 1 -> "10", 2 -> "110",
u >= 3 -> "111" + 5 bits of (u - 3) LSB-first.
"""

from __future__ import annotations

import heapq

N_CTX = 8


def _popcount(x: int) -> int:
    return bin(x).count("1")


def _weights(ctx: int):
    """Heuristic symbol weights for significance pattern rho in context
    ctx: fewer significant samples more likely; with significant
    neighbours (higher ctx bits set), denser patterns gain weight."""
    act = _popcount(ctx)             # 0..3 active neighbour groups
    w = {}
    for rho in range(16):
        p = _popcount(rho)
        base = 2.0 ** (4 - p)        # sparse-biased
        if act:
            base *= 1.5 ** (p * act / 3.0)   # neighbourhood activity
        w[rho] = base
    if ctx == 0:
        del w[0]                     # rho=0 signalled via MEL
    else:
        w[0] *= 4.0                  # insignificant quads dominate
    return w


def _huffman_lengths(weights: dict[int, float], maxlen: int = 7):
    """Code lengths by Huffman; clamp to maxlen then fix Kraft."""
    if len(weights) == 1:
        return {next(iter(weights)): 1}
    heap = [(wt, i, (sym,)) for i, (sym, wt) in enumerate(weights.items())]
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
    # clamp and repair Kraft inequality (sum 2^-l <= 1)
    for s in lengths:
        lengths[s] = min(lengths[s], maxlen)
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


def _canonical(lengths: dict[int, int]):
    """Assign canonical codewords (shorter codes first, then by symbol)."""
    code = 0
    prev_len = 0
    enc = {}
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[s]
        code <<= ln - prev_len
        enc[s] = (ln, code)
        code += 1
        prev_len = ln
    return enc


def _build(kind: str = "flat"):
    """Build the (enc, dec) table pair.

    kind="flat": fixed 4-bit rho codes — the default, chosen so the
    device (Pallas) decoder needs no table lookup in its lockstep scan
    (a 128-entry one-hot gather per quad would dominate the kernel).
    Costs ~2 bits per coded quad vs the Huffman variant.
    kind="huffman": canonical codes from the heuristic weights — the
    structural stand-in for the normative CxtVLC tables; keep this path
    alive so those tables can drop in.
    """
    enc_tables = []
    dec_tables = []
    for c in range(N_CTX):
        if kind == "flat":
            if c == 0:
                # MEL already said the quad is significant: plain 4 bits
                enc = {s: (4, s) for s in range(1, 16)}
            else:
                # rho=0 dominates active contexts: 1-bit zero flag,
                # else flag + 4 rho bits — still LUT-free on device
                enc = {0: (1, 0)}
                enc.update({s: (5, 1 | (s << 1)) for s in range(1, 16)})
        else:
            canon = _canonical(_huffman_lengths(_weights(c)))
            # canonical codes are MSB-first; store them bit-reversed so
            # the transmitted-first bit sits at bit 0
            enc = {s: (ln, int(format(code, f"0{ln}b")[::-1], 2))
                   for s, (ln, code) in canon.items()}
        enc_tables.append(enc)
        dec = [(-1, 0)] * 128
        for sym, (ln, code) in enc.items():
            # every 7-bit window whose low ln bits equal the code
            for pad in range(1 << (7 - ln)):
                dec[code | (pad << ln)] = (sym, ln)
        dec_tables.append(dec)
    return enc_tables, dec_tables


VLC_ENC, VLC_DEC = _build()


def uvlc_encode(u: int):
    """Return (length, bits) for u >= 0; transmitted-first bit = bit 0."""
    if u == 0:
        return 1, 0b0
    if u == 1:
        return 2, 0b01
    if u == 2:
        return 3, 0b011
    assert u - 3 < 32, "u out of range"
    return 8, 0b111 | ((u - 3) << 3)


def uvlc_decode(read_bit) -> int:
    if read_bit() == 0:
        return 0
    if read_bit() == 0:
        return 1
    if read_bit() == 0:
        return 2
    v = 0
    for i in range(5):
        v |= read_bit() << i
    return v + 3
