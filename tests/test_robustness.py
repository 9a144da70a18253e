"""Stream-level fault tolerance (SURVEY.md §5): malformed and truncated
codestreams must degrade or error cleanly — never crash or hang."""

import numpy as np
import pytest

from grok_tpu import (CompressParams, DecompressParams, compress, decompress)
from grok_tpu.util.oracle import synthetic_image


@pytest.fixture(scope="module")
def stream():
    img = synthetic_image(96, 96, 1, seed=77)
    return img, compress(img, CompressParams(num_resolutions=4))


def test_truncation_ladder_never_crashes(stream):
    img, data = stream
    dp = DecompressParams(strict=False)
    prev = -1.0
    for frac in (0.95, 0.8, 0.6, 0.4, 0.2, 0.08, 0.03):
        out = decompress(data[:int(len(data) * frac)], dp).to_array()
        assert out.shape == img.shape


@pytest.mark.parametrize("seed", range(8))
def test_random_corruption_no_crash(stream, seed):
    img, data = stream
    rng = np.random.default_rng(seed)
    buf = bytearray(data)
    # corrupt a few bytes in the tile body (past the main header)
    for _ in range(4):
        pos = int(rng.integers(len(buf) // 3, len(buf)))
        buf[pos] = int(rng.integers(0, 256))
    try:
        out = decompress(bytes(buf), DecompressParams(strict=False))
        assert out.to_array().shape == img.shape
    except (ValueError, IndexError, KeyError):
        pass    # clean decode error is acceptable; crash/hang is not


def test_garbage_headers_rejected():
    for garbage in (b"", b"\x00" * 64, b"\xff\x4f" + bytes(range(50)),
                    b"\xff\x4f\xff\x51\x00\x03\x00"):
        with pytest.raises(Exception):
            decompress(garbage)


def test_dump_is_stable(stream):
    """compare_dump_files analog: dump output is deterministic and
    contains the structural facts."""
    import io

    from grok_tpu.cli.dump import dump_codestream
    _img, data = stream
    a, b = io.StringIO(), io.StringIO()
    dump_codestream(data, out=a, verbose=True)
    dump_codestream(data, out=b, verbose=True)
    assert a.getvalue() == b.getvalue()
    txt = a.getvalue()
    assert "SIZ: image [0,0]..[96,96]" in txt
    assert "resolutions=4" in txt
    assert "Tile parts: 1" in txt
