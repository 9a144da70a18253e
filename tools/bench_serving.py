"""Serving-path benchmark: single / batched decode + fused encode on the
attached device.  Amortized N-call timing with a D2H completion barrier
(per-call timings lie on the axon runtime).  Run from the repo root."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import dataclasses

import numpy as np

from grok_tpu import CompressParams, compress
from grok_tpu.api import (compress_device, decompress_device,
                          decompress_device_batch)
from grok_tpu.util.oracle import synthetic_image


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mp = side * side / 1e6
    print("backend:", jax.default_backend(), flush=True)

    p = CompressParams(ht=True, num_resolutions=5, cblk_w_exp=5,
                       cblk_h_exp=5)
    imgs = [synthetic_image(side, side, 1, seed=s) for s in range(8)]
    streams = [compress(im, p) for im in imgs]
    print(f"stream bytes: {len(streams[0])} "
          f"({len(streams[0]) * 8 / side / side:.2f} bpp)", flush=True)

    # single-stream serving decode
    o = decompress_device(streams[0])
    jax.block_until_ready(o)
    assert np.array_equal(np.asarray(o[0]), imgs[0])
    t0 = time.perf_counter()
    for i in range(n):
        o = decompress_device(streams[i % 8])
    jax.block_until_ready(o)
    np.asarray(o[0][:1, :1])
    dt = (time.perf_counter() - t0) / n
    print(f"decode single : {dt*1e3:7.2f} ms/frame  {mp/dt:6.1f} MP/s",
          flush=True)

    # batched serving decode (8 streams per call)
    ob = decompress_device_batch(streams)
    jax.block_until_ready(ob)
    for im, oo in zip(imgs, ob):
        assert np.array_equal(np.asarray(oo[0]), im)
    rounds = max(2, n // 8)
    t0 = time.perf_counter()
    for _ in range(rounds):
        ob = decompress_device_batch(streams)
    jax.block_until_ready(ob)
    np.asarray(ob[-1][0][:1, :1])
    dt = (time.perf_counter() - t0) / (rounds * 8)
    print(f"decode batch=8: {dt*1e3:7.2f} ms/frame  {mp/dt:6.1f} MP/s",
          flush=True)

    # fused device encode (host-pixel input)
    pd = dataclasses.replace(p, backend="jax")
    t0 = time.perf_counter()
    b = compress(imgs[0], pd)
    print(f"encode first call (compile): {time.perf_counter()-t0:.1f} s",
          flush=True)
    assert b == streams[0], "device encode != host encode"
    t0 = time.perf_counter()
    for i in range(max(3, n // 2)):
        b = compress(imgs[i % 8], pd)
    dt = (time.perf_counter() - t0) / max(3, n // 2)
    print(f"encode device : {dt*1e3:7.2f} ms/frame  {mp/dt:6.1f} MP/s",
          flush=True)

    # batched fused encode (8 frames share kernel launches)
    from grok_tpu.api import compress_device_batch
    bb = compress_device_batch(imgs, p)
    assert bb[0] == streams[0], "batched device encode != host encode"
    rounds = max(2, n // 8)
    t0 = time.perf_counter()
    for _ in range(rounds):
        bb = compress_device_batch(imgs, p)
    dt = (time.perf_counter() - t0) / (rounds * 8)
    print(f"encode batch=8: {dt*1e3:7.2f} ms/frame  {mp/dt:6.1f} MP/s",
          flush=True)

    # device-resident loop (decode -> re-encode without pixel download)
    dev = decompress_device(streams[0])
    t0 = time.perf_counter()
    for _ in range(max(3, n // 2)):
        b = compress_device(dev, p)
    dt = (time.perf_counter() - t0) / max(3, n // 2)
    print(f"loop dec->enc : {dt*1e3:7.2f} ms/frame  {mp/dt:6.1f} MP/s "
          f"(re-encode of device pixels)", flush=True)


if __name__ == "__main__":
    main()
