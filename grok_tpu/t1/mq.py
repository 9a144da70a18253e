"""MQ arithmetic coder (ISO/IEC 15444-1 Annex C).

Exact scalar implementation of the 47-state MQ coder used by EBCOT Tier-1.
This is the host-side reference model; the batched device-side variant lives
in grok_tpu/ops/t1_vec.py and must match this bit-for-bit.

Reference parity: [grok: src/lib/core/t1/t1_part1/mqc.cpp :: mqc_*] — behavior
is normative per ISO 15444-1 Annex C (software conventions C.2/C.3), not a
translation of the reference implementation.
"""

from __future__ import annotations

import numpy as np

# 47-state probability table: (Qe, NMPS, NLPS, SWITCH)  [ISO 15444-1 Table C.2]
MQ_TABLE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

MQ_QE = np.array([row[0] for row in MQ_TABLE], dtype=np.uint32)
MQ_NMPS = np.array([row[1] for row in MQ_TABLE], dtype=np.uint8)
MQ_NLPS = np.array([row[2] for row in MQ_TABLE], dtype=np.uint8)
MQ_SWITCH = np.array([row[3] for row in MQ_TABLE], dtype=np.uint8)

# T1 context numbering (matches the conventional EBCOT layout):
#   0..8   zero coding
#   9..13  sign coding
#   14..16 magnitude refinement
#   17     run-length (aggregation)
#   18     uniform
N_CTX = 19
CTX_ZC = 0
CTX_SC = 9
CTX_MAG = 14
CTX_RL = 17
CTX_UNI = 18


def initial_ctx_states() -> list[list[int]]:
    """Initial (state_index, mps) per context [ISO 15444-1 D.2, Table D.7]."""
    states = [[0, 0] for _ in range(N_CTX)]
    states[CTX_UNI][0] = 46
    states[CTX_RL][0] = 3
    states[CTX_ZC][0] = 4
    return states


class MQEncoder:
    """MQ encoder, software conventions of ISO 15444-1 C.2.

    Output bytes exclude a leading carry-absorbing sentinel.  `numbytes()`
    reflects the length after `flush()` per the C.2.9 convention (a trailing
    0xFF is not counted: the decoder regenerates it at end-of-data).
    """

    __slots__ = ("a", "c", "ct", "bp", "out", "ctx")

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        # out[0] is the carry sentinel ("byte before the buffer", value 0).
        self.out = bytearray(1)
        self.bp = 0  # index of byte "B" in out
        self.ctx = initial_ctx_states()

    # -- C.2.6 BYTEOUT ----------------------------------------------------
    def _byteout(self):
        out = self.out
        if out[self.bp] == 0xFF:
            self.bp += 1
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.bp += 1
            out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            out[self.bp] += 1  # propagate carry into previous byte
            if out[self.bp] == 0xFF:
                self.c &= 0x7FFFFFF
                self.bp += 1
                out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.bp += 1
                out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self):
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    # -- C.2.5 ENCODE ------------------------------------------------------
    def encode(self, d: int, cx: int):
        st = self.ctx[cx]
        i, mps = st
        qe = MQ_TABLE[i][0]
        self.a -= qe
        if d == mps:
            if self.a & 0x8000:
                self.c += qe
            else:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                st[0] = MQ_TABLE[i][1]  # NMPS
                self._renorm()
        else:
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if MQ_TABLE[i][3]:
                st[1] = 1 - mps
            st[0] = MQ_TABLE[i][2]  # NLPS
            self._renorm()

    # -- C.2.9 FLUSH -------------------------------------------------------
    def flush(self) -> bytes:
        # SETBITS
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFF
        self._byteout()
        if self.out[self.bp] != 0xFF:
            self.bp += 1
        assert self.out[0] == 0, "carry reached the sentinel byte"
        return bytes(self.out[1:self.bp])

    def erterm_flush(self) -> bytes:
        """C.2.9-variant predictable termination (ERTERM).

        Pushes the register out without SETBITS: at least 12 further
        register bits are emitted, which (with the decoder's 0xFF
        substitution past the end) guarantees every decision is
        recoverable while making the termination point predictable for
        error detection (ISO 15444-1 D.4.2 / mode switch PTERM).
        """
        k = 12 - self.ct            # 11 - CT + 1
        while k > 0:
            self.c = (self.c << self.ct) & 0xFFFFFFF
            self.ct = 0
            self._byteout()
            k -= self.ct
        if self.out[self.bp] != 0xFF:
            self.bp += 1
        assert self.out[0] == 0, "carry reached the sentinel byte"
        return bytes(self.out[1:self.bp])

    def numbytes(self) -> int:
        """Bytes emitted so far (excluding sentinel), before flushing."""
        return self.bp  # == (bp index) - (sentinel) ; bp points at last byte

    def flushed_length(self) -> int:
        """Length flush() would return, without mutating state."""
        clone = MQEncoder()
        clone.a, clone.c, clone.ct, clone.bp = self.a, self.c, self.ct, self.bp
        clone.out = bytearray(self.out)
        return len(clone.flush())

    def reset_ctx(self):
        self.ctx = initial_ctx_states()


class MQDecoder:
    """MQ decoder, software conventions of ISO 15444-1 C.3.

    Reading past the end of `data` supplies 0xFF bytes (C.3.4: the decoder
    substitutes 1-bits after the data runs out), which makes truncated
    codeword segments decodable — the basis of quality-layer truncation.
    """

    __slots__ = ("data", "n", "bp", "a", "c", "ct", "ctx", "_start")

    def __init__(self, data: bytes, start: int = 0, end: int | None = None):
        self.data = data
        self.n = len(data) if end is None else min(end, len(data))
        self._start = start
        self.bp = start
        b = data[start] if start < self.n else 0xFF
        self.c = b << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000
        self.ctx = initial_ctx_states()

    def _byte(self, i: int) -> int:
        return self.data[i] if i < self.n else 0xFF

    # -- C.3.4 BYTEIN ------------------------------------------------------
    def _bytein(self):
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    # -- C.3.2 DECODE ------------------------------------------------------
    def decode(self, cx: int) -> int:
        st = self.ctx[cx]
        i, mps = st
        qe = MQ_TABLE[i][0]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange path
            if self.a < qe:
                d = mps
                st[0] = MQ_TABLE[i][1]
            else:
                d = 1 - mps
                if MQ_TABLE[i][3]:
                    st[1] = 1 - mps
                st[0] = MQ_TABLE[i][2]
            self.a = qe
            self._renormd()
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                d = mps
            else:
                if self.a < qe:
                    d = 1 - mps
                    if MQ_TABLE[i][3]:
                        st[1] = 1 - mps
                    st[0] = MQ_TABLE[i][2]
                else:
                    d = mps
                    st[0] = MQ_TABLE[i][1]
                self._renormd()
        return d

    def _renormd(self):
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def reset_ctx(self):
        self.ctx = initial_ctx_states()
