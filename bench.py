"""Benchmark: end-to-end decode throughput (MP/s) vs the OpenJPEG oracle.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The driver runs this on real TPU hardware; GROK_BENCH_PLATFORM=cpu pins the
CPU backend for local runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    if os.environ.get("GROK_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GROK_BENCH_PLATFORM"])
    try:  # persistent compile cache: slow TPU compiles happen once, ever
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from grok_tpu import CompressParams, DecompressParams, compress, decompress
    from grok_tpu.util.oracle import (HAVE_ORACLE, oracle_decode,
                                      oracle_encode, synthetic_image)

    side = int(os.environ.get("GROK_BENCH_SIZE", "512"))
    img = synthetic_image(side, side, 1, seed=7)
    mp = side * side / 1e6

    data = compress(img, CompressParams(num_resolutions=5))
    dp = DecompressParams(backend=os.environ.get("GROK_BENCH_BACKEND", "native"))

    # warmup (jit compiles)
    out = decompress(data, dp).to_array()
    assert np.array_equal(out, img), "bench decode is not lossless"

    reps = int(os.environ.get("GROK_BENCH_REPS", "5"))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        decompress(data, dp)
        best = min(best, time.perf_counter() - t0)
    ours_mps = mp / best

    vs_baseline = 0.0
    if HAVE_ORACLE:
        odata = oracle_encode(img, num_resolutions=5)
        oracle_decode(odata)
        obest = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            oracle_decode(odata)
            obest = min(obest, time.perf_counter() - t0)
        vs_baseline = (mp / best) / (mp / obest)

    print(json.dumps({
        "metric": "decode_throughput_lossless_53",
        "value": round(ours_mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
