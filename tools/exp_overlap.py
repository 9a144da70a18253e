"""Experiments: can H2D overlap device compute on this relay; what
serializes the serving loop; batch-path breakdown.

Run on a TPU-attached host from the repo root.
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


def t(label, f, n=10):
    f()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:32s}: {dt:8.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    # A long-ish device program (~5 ms): chained matmuls
    x = jnp.ones((1024, 1024), jnp.float32)

    @jax.jit
    def burn(x):
        for _ in range(60):
            x = x @ x * 1e-3
        return x

    r = burn(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5):
        r = burn(x)
    jax.block_until_ready(r)
    np.asarray(r[:1, :1])
    burn_ms = (time.perf_counter() - t0) / 5 * 1e3
    print(f"burn program                    : {burn_ms:8.2f} ms", flush=True)

    # H2D of a ~214 KB buffer, alone
    buf = np.zeros(214 * 1024, np.uint8)

    def up():
        return jax.device_put(buf)

    up_ms = t("device_put 214KB alone", up, 20)

    # does device_put RETURN before the transfer completes?
    t0 = time.perf_counter()
    a = jax.device_put(buf)
    ret_ms = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(a)
    done_ms = (time.perf_counter() - t0) * 1e3
    print(f"device_put return after         : {ret_ms:8.2f} ms; "
          f"ready after {done_ms:8.2f} ms", flush=True)

    # jnp.asarray the same
    t0 = time.perf_counter()
    a = jnp.asarray(buf)
    ret_ms = (time.perf_counter() - t0) * 1e3
    jax.block_until_ready(a)
    done_ms = (time.perf_counter() - t0) * 1e3
    print(f"jnp.asarray return after        : {ret_ms:8.2f} ms; "
          f"ready after {done_ms:8.2f} ms", flush=True)

    # interleaved: launch burn, then upload while it runs
    def inter():
        r = burn(x)
        a = jax.device_put(buf)
        return (r, a)

    both = t("burn + upload interleaved", inter, 10)
    print(f"  -> serial would be {burn_ms + up_ms:.2f}; "
          f"overlap would be {max(burn_ms, up_ms):.2f}", flush=True)

    # N programs back-to-back with uploads between (the serving shape)
    def seq():
        a = jax.device_put(buf)
        r = burn(x)
        return (r, a)

    t("upload-then-burn x10", seq, 10)


if __name__ == "__main__":
    main()
