"""MQ coder: roundtrip and truncation behavior."""

import numpy as np
import pytest

from grok_tpu.t1.mq import MQDecoder, MQEncoder, N_CTX, MQ_TABLE


def test_table_shape():
    assert len(MQ_TABLE) == 47
    # state 46 is the non-adapting uniform state
    assert MQ_TABLE[46] == (0x5601, 46, 46, 0)


@pytest.mark.parametrize("seed,n", [(0, 100), (1, 1000), (2, 20000)])
def test_roundtrip_random(seed, n):
    rng = np.random.default_rng(seed)
    ctxs = rng.integers(0, N_CTX, size=n)
    # skewed decisions exercise both MPS and LPS paths
    bits = (rng.random(n) < 0.2).astype(int)
    enc = MQEncoder()
    for d, cx in zip(bits, ctxs):
        enc.encode(int(d), int(cx))
    data = enc.flush()
    dec = MQDecoder(data)
    out = [dec.decode(int(cx)) for cx in ctxs]
    assert out == list(bits)


def test_roundtrip_all_zero_and_all_one():
    for bit in (0, 1):
        enc = MQEncoder()
        for _ in range(500):
            enc.encode(bit, 0)
        data = enc.flush()
        dec = MQDecoder(data)
        assert all(dec.decode(0) == bit for _ in range(500))


def test_compresses_skewed_source():
    rng = np.random.default_rng(3)
    bits = (rng.random(8192) < 0.02).astype(int)
    enc = MQEncoder()
    for d in bits:
        enc.encode(int(d), 5)
    data = enc.flush()
    assert len(data) < 8192 / 8 / 2  # beats 4:1 vs raw bits on 2% source


def test_flushed_length_is_nondestructive():
    rng = np.random.default_rng(4)
    bits = (rng.random(300) < 0.5).astype(int)
    enc = MQEncoder()
    for i, d in enumerate(bits):
        enc.encode(int(d), 1)
        if i == 150:
            mid_len = enc.flushed_length()
            assert mid_len >= enc.numbytes()
    data = enc.flush()
    dec = MQDecoder(data)
    assert [dec.decode(1) for _ in bits] == list(bits)


def test_truncated_prefix_decodes_prefix_decisions():
    """Layered truncation: a prefix + slack must decode the earlier decisions."""
    rng = np.random.default_rng(5)
    bits = (rng.random(2000) < 0.3).astype(int)
    enc = MQEncoder()
    snap_len = None
    for i, d in enumerate(bits):
        enc.encode(int(d), 2)
        if i == 999:
            snap_len = enc.flushed_length()
    data = enc.flush()
    trunc = data[: snap_len]
    dec = MQDecoder(trunc)
    out = [dec.decode(2) for _ in range(1000)]
    assert out == list(bits[:1000])
