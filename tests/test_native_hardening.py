"""ASan/UBSan run of the native decoders over a generated corpus
(SURVEY §4.5-4.6): valid, truncated, bit-flipped, and garbage inputs
through grk_t1_decode_fast and grk_t2_parse under the sanitizers.

A decode error is fine; a memory fault or UB aborts the harness and
fails here.  The harness binary is built once per session (cached next
to the sources)."""

import os
import subprocess

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
_HARNESS = os.path.join(_ROOT, "tools", "_fuzz_native")


def _build_harness():
    srcs = [os.path.join(_ROOT, "tools", "fuzz_native.c"),
            os.path.join(_ROOT, "grok_tpu", "native", "t1.c"),
            os.path.join(_ROOT, "grok_tpu", "native", "t2.c")]
    if os.path.exists(_HARNESS) and all(
            os.path.getmtime(_HARNESS) >= os.path.getmtime(s)
            for s in srcs):
        return _HARNESS
    cmd = ["gcc", "-O1", "-g", "-fsanitize=address,undefined",
           "-fno-sanitize-recover=all", "-pthread", "-o", _HARNESS] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return _HARNESS


@pytest.fixture(scope="module")
def harness():
    h = _build_harness()
    if h is None:
        pytest.skip("no sanitizer-capable compiler")
    return h


def _run(harness, tmp_path, blob: bytes, name: str):
    p = tmp_path / name
    p.write_bytes(blob)
    r = subprocess.run([harness, str(p)], capture_output=True, timeout=30)
    assert r.returncode in (0, 2), (
        f"sanitizer fault on {name} (rc={r.returncode}):\n"
        + r.stderr.decode(errors="replace")[-2000:])


def _hdr(mode, w, h, npass=8, nbps=10, orient=0, style=0, extra=0):
    return bytes([mode, w & 63, h & 63, npass, nbps, orient, style, extra])


def test_t1_corpus_under_sanitizers(harness, tmp_path):
    from grok_tpu.t1.t1_scalar import encode_block
    rng = np.random.default_rng(0)
    cases = []
    # valid blocks at assorted styles
    for i, style in enumerate((0, 0x01, 0x04, 0x08, 0x3F)):
        mag = np.abs(rng.normal(0, 60, (16, 16))).astype(np.int64)
        mag[rng.random((16, 16)) < 0.4] = 0
        neg = rng.random((16, 16)) < 0.5
        enc = encode_block(mag, neg, i % 4, style)
        cases.append(_hdr(0, 15, 15, len(enc.passes) % 60, enc.numbps,
                          i % 4, style) + enc.data)
    base = cases[0]
    # truncations
    for frac in (0.75, 0.5, 0.25, 0.05):
        cases.append(base[:8 + int((len(base) - 8) * frac)])
    # bit flips
    for s in range(12):
        r2 = np.random.default_rng(s)
        b = bytearray(base)
        for _ in range(4):
            b[8 + int(r2.integers(0, len(b) - 8))] ^= 1 << int(
                r2.integers(0, 8))
        cases.append(bytes(b))
    # pure garbage
    for s in range(12):
        r2 = np.random.default_rng(100 + s)
        n = int(r2.integers(8, 600))
        cases.append(bytes(r2.integers(0, 256, n, dtype=np.uint8)))
    for i, c in enumerate(cases):
        blob = bytes([0]) + c[1:] if c else c
        _run(harness, tmp_path, blob, f"t1_{i}.bin")


def test_t2_corpus_under_sanitizers(harness, tmp_path):
    rng = np.random.default_rng(7)
    cases = []
    for s in range(24):
        n = int(rng.integers(8, 400))
        blob = bytearray(rng.integers(0, 256, n, dtype=np.uint8))
        blob[0] = 1
        cases.append(bytes(blob))
    # all-0xFF (stuffing paths) and all-zero
    cases.append(bytes([1, 2, 2, 1, 1, 0, 0, 3]) + b"\xff" * 200)
    cases.append(bytes([1, 2, 2, 1, 1, 0, 0, 3]) + b"\x00" * 200)
    for i, c in enumerate(cases):
        _run(harness, tmp_path, c, f"t2_{i}.bin")
