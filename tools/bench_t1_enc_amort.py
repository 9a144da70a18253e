"""Amortized MQ ENCODE kernel rate (the honest per-session number).

Packs once, launches the kernel N times back-to-back, forces real
completion with a D2H of the last result (CLAUDE.md round-4: per-call
timings lie in both directions on axon), best of R rounds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
from grok_tpu.ops.pallas_t1_enc import (pack_for_pallas_enc,
                                        pallas_t1_encode,
                                        unpack_out_bytes)
from grok_tpu.t1.t1_scalar import encode_block


def main():
    W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    check = "--nocheck" not in sys.argv
    rng = np.random.default_rng(0)
    blocks, refs = [], []
    for i in range(128):
        mag = np.abs(rng.normal(0, [10, 60, 300][i % 3],
                                (H, W))).astype(np.int64)
        mag[rng.random((H, W)) < 0.55] = 0
        neg = rng.random((H, W)) < 0.5
        blocks.append(dict(mag=mag, neg=neg, orient=i % 4, style=0))
        if check:
            refs.append(encode_block(mag, neg, i % 4, 0))
    mneg, ori, nbps, Wp, Hp, maxbp, L = pack_for_pallas_enc(blocks)
    args = (jnp.asarray(mneg), jnp.asarray(ori), jnp.asarray(nbps))
    out, lens, rates, st = pallas_t1_encode(*args, Wp, Hp, maxbp, L,
                                            False)
    jax.block_until_ready(out)
    if check:
        outh = np.asarray(out)
        lensh = np.asarray(lens)
        bad = sum(1 for j, r in enumerate(refs)
                  if unpack_out_bytes(outh, j, int(lensh[0, j]))
                  != r.data)
        print("bit-exact:", "OK" if bad == 0 else f"FAIL {bad}/128",
              flush=True)
    mp = 128 * W * H / 1e6
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            out, lens, rates, st = pallas_t1_encode(*args, Wp, Hp,
                                                    maxbp, L, False)
        jax.block_until_ready(out)
        np.asarray(lens[:1, :1])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{W}x{H}: {best*1e3:.1f} ms/launch amortized -> "
          f"{mp/best:.2f} MP/s/core", flush=True)


if __name__ == "__main__":
    main()
