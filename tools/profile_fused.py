"""Decompose the serving fused program: gathers vs HT kernel vs DWT.

Times three standalone jitted pieces at the bench shape (512x512 gray,
5 levels, 32x32 HT blocks) with the amortized D2H-barrier methodology.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np


def amort(fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)

    # --- 1. gather staging: 340 lanes x (1024+256+512) windows ---------
    body = jnp.asarray(np.random.randint(0, 255, 300032, dtype=np.uint8))
    meta = jnp.asarray(
        np.random.randint(0, 250000, (512, 7), dtype=np.int32))
    bmax = body.shape[0] - 1

    @jax.jit
    def gathers(meta, body):
        outs = []
        for col, L, rev in ((0, 1024, False), (2, 256, False),
                            (4, 512, True)):
            ar = jax.lax.broadcasted_iota(jnp.int32, (512, L + 1), 1)
            ln = meta[:, col + 1][:, None]
            if rev:
                idx = meta[:, col][:, None] + (ln - 1 - ar)
            else:
                idx = meta[:, col][:, None] + ar
            g = body[jnp.clip(idx, 0, bmax)].astype(jnp.int32)
            outs.append(jnp.where(ar < ln, g, 0).sum())
        return outs

    t = amort(lambda: gathers(meta, body))
    print(f"gathers (512 lanes): {t*1e3:7.2f} ms", flush=True)

    # --- 2. inverse 5/3 DWT chain: 512^2, 5 levels ---------------------
    from grok_tpu.core.geometry import Rect
    from grok_tpu.ops import dwt as jdwt

    # build band pyramid for 512 with 5 resolutions
    rng = np.random.default_rng(0)
    sizes = [512 >> (4 - r) for r in range(5)]  # res r size

    @jax.jit
    def invdwt(ll, hls):
        cur = ll
        for r in range(1, 5):
            n = sizes[r]
            hl, lh, hh = hls[r - 1]
            cur = jdwt.inv_2d_level(cur, hl, lh, hh,
                                    Rect(0, 0, n, n), False)
        return cur

    ll0 = jnp.asarray(rng.integers(-500, 500, (32, 32), dtype=np.int32))
    hls = tuple(
        (jnp.asarray(rng.integers(-500, 500, (sizes[r] // 2,
                                              sizes[r] // 2),
                                  dtype=np.int32)),) * 3
        for r in range(1, 5))
    t = amort(lambda: invdwt(ll0, hls))
    print(f"inv53 5-level 512^2: {t*1e3:7.2f} ms", flush=True)

    # --- 3. 8x DWT (the batched program's share) -----------------------
    @jax.jit
    def invdwt8(ll, hls):
        return [invdwt(ll, hls) for _ in range(8)]
    t = amort(lambda: invdwt8(ll0, hls))
    print(f"inv53 x8          : {t*1e3:7.2f} ms", flush=True)

    # --- 4. trivial jit (per-call floor) -------------------------------
    x = jnp.zeros((8, 128), jnp.int32)

    @jax.jit
    def triv(x):
        return x + 1
    t = amort(lambda: triv(x))
    print(f"trivial jit call  : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
