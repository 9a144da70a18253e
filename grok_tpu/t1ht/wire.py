"""HT cleanup-segment wire helpers for the device paths.

The wire form (t1ht/scalar.py docstring) carries 0xFF bit-stuffing;
the Pallas kernels read *clean* LSB-first streams (fixed `(word >>
shift) & mask` field reads, no per-bit loops).  The un-stuffing side
is pointwise in the wire bytes — whether byte i carries 7 or 8 payload
bits depends only on its already-known neighbour — so the host split
is fully numpy-vectorized (unpackbits -> boolean keep mask ->
packbits); no Python per-bit work on the decode path.

Stuffing (encode side) IS sequential (each emitted byte's capacity
depends on the previous emitted byte), so device encoders emit clean
streams and the wire assembly runs through t1ht.scalar.assemble_cleanup
(Python oracle) or its C mirror (native.ht_assemble) — byte-identical
by test.

Reference parity: [grok: src/lib/core/t1/t1_ht/] (SURVEY.md §2 row 8).
"""

from __future__ import annotations

import numpy as np


def _unstuff_lsb(wire: np.ndarray) -> bytes:
    """Forward LSB-first wire bytes -> clean LSB-first bytes (MagSgn,
    SigProp, MagRef).  A byte following 0xFF carries 7 payload bits
    (bits 0..6)."""
    if wire.size == 0:
        return b""
    bits = np.unpackbits(wire, bitorder="little").reshape(-1, 8)
    keep = np.ones_like(bits, dtype=bool)
    keep[1:, 7] = wire[:-1] != 0xFF
    return np.packbits(bits[keep], bitorder="little").tobytes()


def _unstuff_msb(wire: np.ndarray) -> bytes:
    """Forward MSB-first wire bytes (MEL) -> clean LSB-first bytes.
    Transmission order within a byte is bit 7 first; a byte following
    0xFF carries 7 payload bits (bits 6..0, its bit 7 forced 0)."""
    if wire.size == 0:
        return b""
    bits = np.unpackbits(wire, bitorder="big").reshape(-1, 8)
    keep = np.ones_like(bits, dtype=bool)
    keep[1:, 0] = wire[:-1] != 0xFF
    return np.packbits(bits[keep], bitorder="little").tobytes()


def _vlc_clean_fwd(data: np.ndarray, suf_lo: int, L: int) -> bytes:
    """Backward VLC wire -> clean forward LSB-first bytes.

    The stream starts at the high nibble of data[L-2] and walks toward
    lower addresses; within each byte bits transmit LSB-first; a 0x7F
    byte whose file successor is > 0x8F carries 7 bits (scalar.py
    _VLCReader).  The capacity rule is pointwise (successor byte is
    known), so this vectorizes."""
    nib = np.array([data[L - 2] >> 4], np.uint8)
    nib_bits = np.unpackbits(nib, bitorder="little")[:4]
    body = data[suf_lo:L - 2][::-1]          # emission (read) order
    if body.size:
        succ = np.empty_like(body)
        succ[0] = data[L - 2]
        succ[1:] = body[:-1]
        bits = np.unpackbits(body, bitorder="little").reshape(-1, 8)
        keep = np.ones_like(bits, dtype=bool)
        keep[:, 7] = ~((succ > 0x8F) & (body == 0x7F))
        seq = np.concatenate([nib_bits, bits[keep]])
    else:
        seq = nib_bits
    return np.packbits(seq, bitorder="little").tobytes()


def split_cleanup(data, L: int):
    """Split a wire cleanup segment into clean sub-streams.

    Returns (ms_clean, mel_clean, vlc_clean) bytes or None if the
    framing is invalid.  mel/vlc are un-stuffed over the WHOLE suffix
    (their true boundary is implicit); un-stuffing is prefix-local, so
    each stream's real prefix is exact and consumers never read past
    their own content (encoder flush rules)."""
    if L > len(data) or L < 2:
        return None
    arr = np.frombuffer(data, np.uint8, count=L) if not isinstance(
        data, np.ndarray) else np.asarray(data[:L], np.uint8)
    scup = (int(arr[L - 1]) << 4) | (int(arr[L - 2]) & 0xF)
    if scup < 2 or scup > L:
        return None
    suf_lo = L - scup
    ms = _unstuff_lsb(arr[:suf_lo])
    mel = _unstuff_msb(arr[suf_lo:L - 2])
    vlc = _vlc_clean_fwd(arr, suf_lo, L)
    return ms, mel, vlc
