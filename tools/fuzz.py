"""Corpus-driven fuzz loop over the decoder entry (SURVEY §4.6).

Seeds a small corpus of valid codestreams (styles x filters x HT), then
mutates: truncation, byte flips, region scrambles, marker injection.
Permissive decode must never raise outside the sanctioned error types;
strict decode may raise but never crash or hang.

    python tools/fuzz.py [seconds] [--seed N]

Exits nonzero on the first finding, printing a reproducer path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_corpus():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from grok_tpu.api import compress
    from grok_tpu.core.params import CompressParams
    from grok_tpu.util.oracle import synthetic_image

    img = synthetic_image(96, 88, 1, seed=3)
    rgb = synthetic_image(64, 64, 3, seed=4)
    corpus = [
        compress(img, CompressParams(num_resolutions=3)),
        compress(img, CompressParams(num_resolutions=3, cblk_style=0x3F,
                                     sop=True, eph=True)),
        compress(img, CompressParams(ht=True)),
        compress(rgb, CompressParams(irreversible=True, num_layers=2,
                                     rates=[10, 0])),
        compress(img, CompressParams(num_resolutions=3, jp2=True)),
        compress(img, CompressParams(ht_mixed=True, num_resolutions=3)),
    ]
    return corpus


def mutate(rng, data: bytes) -> bytes:
    b = bytearray(data)
    kind = rng.integers(0, 4)
    if kind == 0:                              # truncate
        return bytes(b[:int(rng.integers(2, len(b)))])
    if kind == 1:                              # byte flips
        for _ in range(int(rng.integers(1, 9))):
            b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
    elif kind == 2:                            # region scramble
        i = int(rng.integers(0, len(b) - 8))
        n = int(rng.integers(4, min(64, len(b) - i)))
        b[i:i + n] = bytes(rng.integers(0, 256, n, dtype="uint8"))
    else:                                      # marker injection
        i = int(rng.integers(0, len(b) - 2))
        b[i:i + 2] = bytes([0xFF, int(rng.integers(0x4F, 0x94))])
    return bytes(b)


def main():
    import numpy as np

    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    seed = 0
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    from grok_tpu.api import decompress
    from grok_tpu.codestream.j2k import CodestreamError
    from grok_tpu.core.params import DecompressParams

    ok_errors = (CodestreamError, ValueError, EOFError, IndexError,
                 KeyError, struct_error())
    corpus = build_corpus()
    rng = np.random.default_rng(seed)
    t0 = time.time()
    n = 0
    while time.time() - t0 < budget:
        data = mutate(rng, corpus[n % len(corpus)])
        for strict in (False, True):
            try:
                decompress(data, DecompressParams(strict=strict))
            except ok_errors:
                pass
            except Exception as e:     # noqa: BLE001 — the fuzz verdict
                path = f"/tmp/grok_fuzz_crash_{n}.j2k"
                open(path, "wb").write(data)
                print(f"FUZZ FINDING after {n} cases: "
                      f"{type(e).__name__}: {e}\nreproducer: {path} "
                      f"(strict={strict})")
                return 1
        n += 1
    print(f"fuzz: {n} cases in {time.time() - t0:.0f}s, no findings")
    return 0


def struct_error():
    import struct
    return struct.error


if __name__ == "__main__":
    sys.exit(main())
