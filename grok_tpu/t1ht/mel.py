"""MEL adaptive run-length coder (ISO/IEC 15444-15 §7.2 structure).

The MEL coder transmits the binary significance events of quads whose
VLC context is zero.  It is the spec's 13-state adaptive run-length
machine: state k in [0, 12] selects a run threshold T = 2^E[k]; a
completed run of T zero-events emits a single 1-bit and moves to a
longer threshold, while a one-event emits a 0-bit followed by E[k]
bits giving the partial run length (most-significant bit first) and
moves to a shorter threshold.

Bit-packing and byte-level behavior follow the normative layout:

  - The ENCODER here produces a *clean* bit sequence in transmission
    order, accumulated LSB-first (bit i of the sequence at bit i%8 of
    byte i//8).  `t1ht.scalar.assemble_cleanup` repacks it MSB-first
    per byte and applies the 0xFF bit-stuffing rule (a byte following
    an 0xFF byte carries only 7 payload bits, its MSB forced 0, so no
    0xFF .. >0x8F marker emulation can occur) when building the wire
    segment.  The device encoder emits the same clean sequence, so
    both backends share one wire assembler byte-for-byte.
  - The DECODER here reads the wire form directly (MSB-first within
    each byte, un-stuffing after 0xFF) and returns 1-bits past the end
    of the segment, matching the spec's 0xFF-padding convention.

Reference parity: [grok: src/lib/core/t1/t1_ht/ MEL coder]; state
ladder and exponents per ISO/IEC 15444-15 (SURVEY.md §2 row 8).
"""

from __future__ import annotations

MEL_E = (0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5)


class BitSink:
    """Clean LSB-first bit accumulator (transmission order -> bit i%8
    of byte i//8).  Shared by the MEL/VLC/MagSgn clean writers."""

    __slots__ = ("buf", "_acc", "_n", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0
        self.nbits = 0

    def bit(self, b: int):
        self._acc |= (b & 1) << self._n
        self._n += 1
        self.nbits += 1
        if self._n == 8:
            self.buf.append(self._acc)
            self._acc = 0
            self._n = 0

    def bits_lsb(self, v: int, n: int):
        """n bits of v, LSB transmitted first."""
        for i in range(n):
            self.bit((v >> i) & 1)

    def bits_msb(self, v: int, n: int):
        """n bits of v, MSB transmitted first (MEL run fields)."""
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def finish(self) -> bytes:
        if self._n:
            self.buf.append(self._acc)
            self._acc = 0
            self._n = 0
        return bytes(self.buf)


class MELEncoder:
    """MEL event encoder emitting a clean bit sequence (see module
    docstring); significance event 1 = the quad is significant."""

    def __init__(self):
        self.k = 0
        self.run = 0
        self.sink = BitSink()

    def encode(self, event: int):
        e = MEL_E[self.k]
        if event == 0:
            self.run += 1
            if self.run == (1 << e):
                self.sink.bit(1)            # completed full run
                self.run = 0
                self.k = min(self.k + 1, 12)
        else:
            self.sink.bit(0)                # miss: partial run + event
            self.sink.bits_msb(self.run, e)
            self.run = 0
            self.k = max(self.k - 1, 0)

    def finish(self) -> tuple[bytes, int]:
        """Flush.  A pending partial run is emitted as a claimed full
        run (one 1-bit): the decoder then serves every remaining
        zero-event from real bits, so byte padding is never decoded as
        an event.  Returns (clean LSB-first bytes, exact bit count)."""
        if self.run > 0:
            self.sink.bit(1)
            self.run = 0
        n = self.sink.nbits
        return self.sink.finish(), n


class MELDecoder:
    """Wire-form MEL decoder: MSB-first bits with 0xFF un-stuffing;
    reads past `end` return 0xFF bytes (spec padding)."""

    def __init__(self, data: bytes, start: int = 0, end: int | None = None):
        self.data = data
        self.pos = start
        self.end = len(data) if end is None else end
        self.k = 0
        self.run = 0                 # zero-events still owed
        self._pending_one = False
        self._byte = 0
        self._nbits = 0
        self._prev_ff = False

    def _read_bit(self) -> int:
        if self._nbits == 0:
            b = self.data[self.pos] if self.pos < self.end else 0xFF
            self.pos += 1
            self._nbits = 7 if self._prev_ff else 8
            self._prev_ff = b == 0xFF
            self._byte = b
        self._nbits -= 1
        return (self._byte >> self._nbits) & 1

    def next_event(self) -> int:
        if self.run > 0:
            self.run -= 1
            return 0
        if self._pending_one:
            self._pending_one = False
            return 1
        e = MEL_E[self.k]
        if self._read_bit() == 1:
            # completed run of T zeros: deliver one now, owe the rest
            self.run = (1 << e) - 1
            self.k = min(self.k + 1, 12)
            return 0
        r = 0
        for _ in range(e):               # partial run length, MSB first
            r = (r << 1) | self._read_bit()
        self.k = max(self.k - 1, 0)
        if r > 0:
            self.run = r - 1
            self._pending_one = True
            return 0
        return 1
