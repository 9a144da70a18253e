"""MEL adaptive run-length coder (ISO/IEC 15444-15 §7.2 structure).

The MEL coder transmits binary "significance" events for quads whose
context is zero.  It is an adaptive Golomb-style run-length code: state
k in [0, 12] selects a run threshold T = 2^E[k]; a completed run of T
zero-events emits a single 0-bit and moves to a longer threshold, while
a one-event emits a 1-bit followed by E[k] bits giving the partial run
length and moves to a shorter threshold.

Bits are packed LSB-first without bit-stuffing (first transmitted bit
= bit 0 of the first byte; multi-bit run fields LSB-first): the
lockstep device decoder (ops/pallas_ht.py) then reads n-bit fields as
`acc & ((1 << n) - 1)` instead of per-bit loops.  Marker-code emulation
inside packet bodies is an accepted non-conformance of this
experimental path (see t1ht/__init__).

Reference parity: [grok: src/lib/core/t1/t1_ht/ MEL encoder/decoder];
the state-exponent ladder is the spec's (13 states, exponents below).
"""

from __future__ import annotations

MEL_E = (0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5)


class MELEncoder:
    def __init__(self):
        self.k = 0
        self.run = 0
        self.buf = bytearray()
        self._bits = 0          # bit accumulator (LSB first)
        self._nbits = 0

    def _emit_bit(self, b: int):
        self._bits |= (b & 1) << self._nbits
        self._nbits += 1
        if self._nbits == 8:
            self.buf.append(self._bits)
            self._bits = 0
            self._nbits = 0

    def _emit_bits(self, v: int, n: int):
        for i in range(n):
            self._emit_bit((v >> i) & 1)

    def encode(self, event: int):
        e = MEL_E[self.k]
        if event == 0:
            self.run += 1
            if self.run == (1 << e):
                self._emit_bit(0)
                self.run = 0
                self.k = min(self.k + 1, 12)
        else:
            self._emit_bit(1)
            self._emit_bits(self.run, e)
            self.run = 0
            self.k = max(self.k - 1, 0)

    def finish(self) -> bytes:
        # A pending partial run of zeros needs no bits: the decoder never
        # requests more events than were encoded, so just flush the bit
        # accumulator zero-padded.
        if self._nbits:
            self.buf.append(self._bits)
            self._bits = 0
            self._nbits = 0
        return bytes(self.buf)


class MELDecoder:
    def __init__(self, data: bytes, start: int = 0, end: int | None = None):
        self.data = data
        self.pos = start
        self.end = len(data) if end is None else end
        self.k = 0
        self.run = 0            # zero-events still owed from a decoded run
        self._pending_one = False   # a one-event follows the owed zeros
        self._byte = 0
        self._nbits = 0

    def _read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos < self.end:
                b = self.data[self.pos]
                self.pos += 1
            else:
                b = 0
            self._nbits = 8
            self._byte = b
        v = self._byte & 1
        self._byte >>= 1
        self._nbits -= 1
        return v

    def next_event(self) -> int:
        if self.run > 0:
            self.run -= 1
            return 0
        if self._pending_one:
            self._pending_one = False
            return 1
        e = MEL_E[self.k]
        if self._read_bit() == 0:
            # full run of T zeros: deliver the first now, owe the rest
            self.run = (1 << e) - 1
            self.k = min(self.k + 1, 12)
            return 0
        r = 0
        for i in range(e):
            r |= self._read_bit() << i
        self.k = max(self.k - 1, 0)
        if r > 0:
            # r zeros precede the one-event
            self.run = r - 1
            self._pending_one = True
            return 0
        return 1
