"""Packet-header bit IO and tag trees."""

import numpy as np
import pytest

from grok_tpu.codestream.bitio import BitReader, BitWriter
from grok_tpu.t2.tagtree import TagTree


def test_bitio_roundtrip_random():
    rng = np.random.default_rng(0)
    bits = (rng.random(5000) < 0.5).astype(int)
    bw = BitWriter()
    for b in bits:
        bw.write_bit(int(b))
    data = bw.flush()
    br = BitReader(data)
    assert [br.read_bit() for _ in bits] == list(bits)


def test_bitio_stuffing_after_ff():
    bw = BitWriter()
    # write 0xFF then more bits; stuffed byte must have MSB 0
    bw.write_bits(0xFF, 8)
    bw.write_bits(0b1010101, 7)   # exactly fills the 7-bit stuffed byte
    data = bw.flush()
    assert data[0] == 0xFF
    assert data[1] == 0b01010101 & 0x7F
    br = BitReader(data)
    assert br.read_bits(8) == 0xFF
    assert br.read_bits(7) == 0b1010101


def test_bitio_trailing_ff_gets_zero_byte():
    bw = BitWriter()
    bw.write_bits(0xFF, 8)
    data = bw.flush()
    assert data == b"\xff\x00"
    br = BitReader(data)
    assert br.read_bits(8) == 0xFF
    br.align()
    assert br.pos == 2


def test_bitio_align_mid_byte():
    bw = BitWriter()
    bw.write_bits(0b101, 3)
    data = bw.flush()
    br = BitReader(data)
    assert br.read_bits(3) == 0b101
    br.align()
    assert br.pos == 1


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 4), (7, 5), (16, 16)])
def test_tagtree_roundtrip(w, h):
    rng = np.random.default_rng(w * 100 + h)
    values = rng.integers(0, 10, size=(h, w))

    enc_tree = TagTree(w, h)
    for y in range(h):
        for x in range(w):
            enc_tree.set_value(x, y, int(values[y, x]))

    bw = BitWriter()
    # encode every leaf at high threshold (fully resolves values)
    for y in range(h):
        for x in range(w):
            enc_tree.encode(bw, x, y, 999)
    data = bw.flush()

    dec_tree = TagTree(w, h)
    br = BitReader(data)
    for y in range(h):
        for x in range(w):
            t = 1
            while not dec_tree.decode(br, x, y, t):
                t += 1
            assert dec_tree.leaf_value(x, y) == values[y, x]


def test_tagtree_full_encode_vs_incremental_decode():
    """Encoder writes each leaf fully (threshold 999, the zero-bitplane
    pattern); decoder probes the same leaf with rising thresholds — the
    per-leaf bit budgets must line up exactly."""
    w, h = 4, 3
    rng = np.random.default_rng(7)
    values = rng.integers(0, 6, size=(h, w))

    tree = TagTree(w, h)
    for y in range(h):
        for x in range(w):
            tree.set_value(x, y, int(values[y, x]))

    bw = BitWriter()
    for y in range(h):
        for x in range(w):
            tree.encode(bw, x, y, 999)
    data = bw.flush()

    dt = TagTree(w, h)
    br = BitReader(data)
    for y in range(h):
        for x in range(w):
            t = 1
            while not dt.decode(br, x, y, t):
                t += 1
            assert t - 1 == values[y, x]
            assert dt.leaf_value(x, y) == values[y, x]


def test_tagtree_inclusion_semantics():
    """decode() returns whether leaf value < threshold, layer-style."""
    tree = TagTree(2, 2)
    vals = [[0, 2], [1, 3]]
    for y in range(2):
        for x in range(2):
            tree.set_value(x, y, vals[y][x])
    bw = BitWriter()
    for t in range(1, 5):
        for y in range(2):
            for x in range(2):
                tree.encode(bw, x, y, t)
    data = bw.flush()

    dt = TagTree(2, 2)
    br = BitReader(data)
    seen = [[None] * 2 for _ in range(2)]
    for t in range(1, 5):
        for y in range(2):
            for x in range(2):
                inc = dt.decode(br, x, y, t)
                assert inc == (vals[y][x] < t)
                seen[y][x] = inc
    assert all(all(row) for row in seen)
