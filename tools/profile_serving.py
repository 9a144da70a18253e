"""Stage-by-stage profile of the cached serving decode on the device.

Decomposes one decompress_device call: plan lookup, C t2 parse, C ht
scan, staging-array build, and the fused jit program (timed amortized
with a D2H barrier).  Run from the repo root on a TPU-attached host.
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

import numpy as np

from grok_tpu import CompressParams, compress
from grok_tpu.codestream import j2k
from grok_tpu.codestream.j2k import TileHeader
from grok_tpu.core.params import DecompressParams
from grok_tpu.pipeline import serve
from grok_tpu.util.oracle import synthetic_image


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    img = synthetic_image(side, side, 1, seed=7)
    p = CompressParams(ht=True, num_resolutions=5, cblk_w_exp=5,
                       cblk_h_exp=5)
    cs = compress(img, p)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    hdr = j2k.read_main_header(cs)
    parts = j2k.read_tile_parts(cs, hdr)
    th = TileHeader()
    chunks = []
    for p in sorted(parts, key=lambda p: p.part_index):
        j2k.read_tile_part_header(cs, p, hdr, th)
        chunks.append(cs[p.data_start:p.data_end])
    body = b"".join(chunks)
    dp = DecompressParams(backend="jax", keep_device=True, strict=False)

    # warm (compile + plan build)
    out = serve.try_decode_serving(cs, hdr, 0, th, body, dp)
    assert out is not None
    jax.block_until_ready(out)
    assert np.array_equal(np.asarray(out[0]), img)
    print("warm ok", flush=True)

    # general fused path (what default strict=True falls back to)
    from grok_tpu.api import decompress_device
    o2 = decompress_device(cs)
    jax.block_until_ready(o2)
    t0 = time.perf_counter()
    for _ in range(3):
        o2 = decompress_device(cs)
    jax.block_until_ready(o2)
    np.asarray(o2[0][:1, :1])
    print(f"general fused  : {(time.perf_counter()-t0)/3*1e3:8.2f} ms",
          flush=True)

    # full-call amortized
    t0 = time.perf_counter()
    for _ in range(n):
        out = serve.try_decode_serving(cs, hdr, 0, th, body, dp)
    jax.block_until_ready(out)
    np.asarray(out[0][:1, :1])
    print(f"full serve call: {(time.perf_counter()-t0)/n*1e3:8.2f} ms",
          flush=True)

    # host-only portion (monkeypatch the fused fn to a no-op)
    from grok_tpu.pipeline import device as dev
    real_build = dev._build_decode_fn
    import grok_tpu.pipeline.serve as sv

    orig = dev._build_decode_fn
    dev._build_decode_fn = lambda sig: (lambda *a, **k: [None])
    t0 = time.perf_counter()
    for _ in range(n):
        sv.try_decode_serving(cs, hdr, 0, th, body, dp)
    print(f"host-side only : {(time.perf_counter()-t0)/n*1e3:8.2f} ms",
          flush=True)
    dev._build_decode_fn = orig

    # fused program only: rebuild args once, call fn repeatedly
    # re-run the batch body to capture (sig, arrays) via a tap
    captured = {}
    def tap_build(sig):
        fn = real_build(sig)
        def wrapped(arrs, body_d):
            captured["sig"] = sig
            captured["arrs"] = arrs
            captured["body"] = body_d
            return fn(arrs, body_d)
        return wrapped
    dev._build_decode_fn = tap_build
    serve._PLANS.clear()   # the fast path caches fn on the plan
    out = sv.try_decode_serving(cs, hdr, 0, th, body, dp)
    dev._build_decode_fn = real_build
    fn = real_build(captured["sig"])
    arrs, body_d = captured["arrs"], captured["body"]
    o = fn(arrs, body_d)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(arrs, body_d)
    jax.block_until_ready(o)
    np.asarray(o[0][:1, :1])
    print(f"fused program  : {(time.perf_counter()-t0)/n*1e3:8.2f} ms",
          flush=True)
    nb = len(captured["sig"][4])
    print("bucket sigs:", [s[:4] for s in captured["sig"][4]], flush=True)


if __name__ == "__main__":
    main()
