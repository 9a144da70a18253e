"""Relay characterization + serving batch breakdown (honest barriers).

All timings amortized over N calls with a final D2H read as the
completion barrier (axon block_until_ready can ack early).

Sections:
  1. upload sweep: per-call ms at 64K/256K/1M/4M -> overhead + MB/s fit
  2. serving single vs batch(8) vs batch(16), per-frame, same window
  3. batch internals: program-only on pre-uploaded body, upload-only,
     host-only (staging with fn+upload stubbed)
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

from grok_tpu import CompressParams, compress
from grok_tpu.api import decompress_device, decompress_device_batch
from grok_tpu.core.params import DecompressParams
from grok_tpu.util.oracle import synthetic_image


@jax.jit
def _tick(b):
    return jnp.sum(jnp.asarray(b[:16], jnp.int32))


def upload_sweep(n=12):
    print("-- upload sweep (honest tick barrier) --", flush=True)
    res = []
    for kb in (64, 256, 1024, 4096):
        buf = np.random.default_rng(0).integers(
            0, 255, kb * 1024, dtype=np.uint8)
        a = jax.device_put(buf)
        np.asarray(_tick(a))
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = jax.device_put(buf)
        np.asarray(_tick(last))
        ms = (time.perf_counter() - t0) / n * 1e3
        res.append((kb, ms))
        print(f"  {kb:5d} KB: {ms:8.2f} ms/call "
              f"({kb / 1024 / ms * 1e3:6.1f} MB/s inc. overhead)",
              flush=True)
    # 2-point fit overhead + bandwidth from 64K and 4M
    (k0, m0), (k1, m1) = res[0], res[-1]
    bw = (k1 - k0) / 1024.0 / ((m1 - m0) / 1e3)
    ov = m0 - (k0 / 1024.0) / bw * 1e3
    print(f"  fit: overhead ~{ov:.2f} ms/call, bw ~{bw:.1f} MB/s",
          flush=True)
    return ov, bw


def serving(side=512, n=40):
    img = synthetic_image(side, side, 1, seed=7)
    mp = side * side / 1e6
    cp = CompressParams(ht=True, num_resolutions=5, cblk_w_exp=5,
                        cblk_h_exp=5)
    cs = compress(img, cp)
    print(f"-- serving {side}x{side}, stream {len(cs)} B --", flush=True)

    out = decompress_device(cs)
    jax.block_until_ready(out)
    assert np.array_equal(np.asarray(out[0]), img)

    def bar(o):
        jax.block_until_ready(o)
        np.asarray(o[0][:1, :1])

    t0 = time.perf_counter()
    for _ in range(n):
        out = decompress_device(cs)
    bar(out)
    single = (time.perf_counter() - t0) / n * 1e3
    print(f"  single           : {single:8.2f} ms/frame "
          f"({mp / single * 1e3:6.1f} MP/s)", flush=True)

    for nb in (8, 16):
        streams = [compress(synthetic_image(side, side, 1, seed=100 + i),
                            cp) for i in range(nb)]
        outs = decompress_device_batch(streams)
        jax.block_until_ready(outs[-1])
        rounds = max(2, n // nb)
        t0 = time.perf_counter()
        for _ in range(rounds):
            outs = decompress_device_batch(streams)
        bar(outs[-1])
        per = (time.perf_counter() - t0) / (rounds * nb) * 1e3
        print(f"  batch{nb:2d}          : {per:8.2f} ms/frame "
              f"({mp / per * 1e3:6.1f} MP/s)", flush=True)
    return streams  # the nb=16 set


def batch_breakdown(streams, side=512, rounds=4):
    """Split batch(8) serve into host / upload / program via taps."""
    from grok_tpu.pipeline import device as dev
    from grok_tpu.pipeline import serve

    mp = side * side / 1e6
    streams = streams[:8]
    nb = len(streams)
    captured = {}
    real_build = dev._build_decode_fn

    def tap(sig):
        fn = real_build(sig)

        def wrapped(arrs, body_d):
            captured["sig"] = sig
            captured["arrs"] = arrs
            captured["body_d"] = body_d
            return fn(arrs, body_d)

        return wrapped

    dev._build_decode_fn = tap
    # plan fast-cache may hold the fn already: clear so the tap fires
    serve._PLANS.clear()
    outs = decompress_device_batch(streams)
    dev._build_decode_fn = real_build
    jax.block_until_ready(outs[-1])
    fn = real_build(captured["sig"])
    arrs = captured["arrs"]
    body_d0 = captured["body_d"]
    nbytes = body_d0.shape[0]
    print(f"-- batch{nb} breakdown (body {nbytes} B) --", flush=True)

    def bar(o):
        jax.block_until_ready(o)
        np.asarray(o[0][:1, :1])

    o = fn(arrs, body_d0)
    bar(o)
    t0 = time.perf_counter()
    for _ in range(rounds):
        o = fn(arrs, body_d0)
    bar(o)
    prog = (time.perf_counter() - t0) / (rounds * nb) * 1e3
    print(f"  program only     : {prog:8.2f} ms/frame "
          f"({mp / prog * 1e3:6.1f} MP/s)", flush=True)

    # upload-only: the concatenated body buffer
    body_np = np.asarray(jnp.asarray(body_d0, jnp.int32)).astype(np.uint8)
    t0 = time.perf_counter()
    for _ in range(rounds):
        last = jax.device_put(body_np)
    np.asarray(_tick(last))
    up = (time.perf_counter() - t0) / (rounds * nb) * 1e3
    print(f"  upload only      : {up:8.2f} ms/frame", flush=True)

    # host-only: stub fn to skip device dispatch entirely
    def tap_null(sig):
        def wrapped(arrs, body_d):
            return [jnp.zeros((1, 1), jnp.int32)] * (sig[0])
        return wrapped

    dev._build_decode_fn = tap_null
    serve._PLANS.clear()
    decompress_device_batch(streams)   # rebuild plan w/ stub
    t0 = time.perf_counter()
    for _ in range(rounds):
        decompress_device_batch(streams)
    host = (time.perf_counter() - t0) / (rounds * nb) * 1e3
    dev._build_decode_fn = real_build
    serve._PLANS.clear()
    print(f"  host only        : {host:8.2f} ms/frame "
          f"(incl. body_cat build + jnp.asarray dispatch)", flush=True)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    upload_sweep()
    streams = serving()
    batch_breakdown(streams)
    upload_sweep(n=8)   # re-measure: did the window drift during the run?


if __name__ == "__main__":
    main()
