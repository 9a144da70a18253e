"""On-hardware validation + timing of the Pallas kernels.

Run on a TPU-attached host after kernel changes:

    python tools/hw_validate.py [ht_dec] [ht_enc] [mq_dec] [mq_enc]

For each requested kernel: compile on the device (persistent cache in
.jax_cache), check bit/byte-exactness vs the scalar oracle, and report
an amortized launch time (N back-to-back launches with a final D2H read
as the completion barrier — per-call timings lie on the axon runtime,
see CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def _setup_jax():
    import jax
    try:
        import os
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    return jax


def _amortized(fn, barrier, n=20, rounds=3):
    import jax
    fn()                      # warm (compile)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        barrier(out)          # force a D2H read
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def _ht_jobs(rng, w, h, nblocks, sigma=300.0, dens=0.5):
    from grok_tpu.t1ht import ht_decode_block, ht_encode_block
    jobs, refs = [], []
    for i in range(nblocks):
        mag = np.abs(rng.normal(0, sigma, (h, w))).astype(np.int64)
        mag[rng.random((h, w)) >= dens] = 0
        mag = np.minimum(mag, (1 << 24) - 1)
        neg = (rng.random((h, w)) < 0.5) & (mag > 0)
        mag[0, 0] = max(int(mag[0, 0]), 3)
        enc = ht_encode_block(mag, neg, i % 4)
        jobs.append(dict(data=enc.data, seg_lens=enc.seg_lens,
                         numpasses=1, numbps=enc.numbps, orient=i % 4,
                         w=w, h=h, mag=mag, neg=neg))
        refs.append(ht_decode_block(enc.data, enc.seg_lens, 1,
                                    enc.numbps, i % 4, w, h))
    return jobs, refs


def run_ht_dec(jax, w=32, h=32, nblocks=1024):
    import jax.numpy as jnp

    from grok_tpu.ops.pallas_ht import (pack_ht_for_pallas,
                                        pallas_ht_decode, sublanes_for_ht)
    rng = np.random.default_rng(0)
    jobs, refs = _ht_jobs(rng, w, h, nblocks)
    from grok_tpu.ops.pallas_ht import ht_block_eligible
    elig = [ht_block_eligible(j) for j in jobs]   # fills j["_ht_hdr"]
    assert all(elig)
    mx = max(max(len(s) for s in j["_ht_hdr"][1:4]) for j in jobs)
    S = min(sublanes_for_ht(w, h, mx), -(-len(jobs) // 128))
    if len(jobs) > S * 128:        # one launch only: trim to capacity
        jobs, refs = jobs[:S * 128], refs[:S * 128]
    ms_d, mel_d, vlc_d, pv, wh, valid = pack_ht_for_pallas(jobs, S)
    args = [jnp.asarray(a) for a in (ms_d, mel_d, vlc_d, pv, wh, valid)]

    def fn():
        return pallas_ht_decode(*args, w, h, S, False)

    t = _amortized(fn, lambda o: np.asarray(o[:1, :1]))
    out = np.asarray(fn())
    ok = 0
    for j, (rm, rn) in enumerate(refs):
        v = out[:h, :w, j // 128, j % 128] if S > 1 else out[:h, :w, j]
        if np.array_equal(np.abs(v).astype(np.int64), rm) and \
                np.array_equal(v < 0, rn):
            ok += 1
    mp = len(jobs) * w * h / 1e6
    print(f"ht_dec {w}x{h}x{len(jobs)}: {ok}/{len(jobs)} bit-exact, "
          f"{t * 1e3:.2f} ms/launch, {mp / t:.1f} MP/s/core")


def run_ht_enc(jax, w=32, h=32, nblocks=1024):
    from grok_tpu.ops.pallas_ht_enc import encode_ht_blocks
    from grok_tpu.t1ht import ht_encode_block
    rng = np.random.default_rng(1)
    blocks, refs = [], []
    for i in range(nblocks):
        mag = np.abs(rng.normal(0, 300, (h, w))).astype(np.int64)
        mag[rng.random((h, w)) >= 0.5] = 0
        neg = (rng.random((h, w)) < 0.5) & (mag > 0)
        mag[0, 0] = max(int(mag[0, 0]), 3)
        blocks.append(dict(mag=mag, neg=neg, orient=i % 4, w=w, h=h))
        refs.append(ht_encode_block(mag, neg, i % 4))
    t0 = time.perf_counter()
    res = encode_ht_blocks(blocks)
    warm = time.perf_counter() - t0
    ok = sum(1 for g, r in zip(res, refs) if g.data == r.data)
    t0 = time.perf_counter()
    res = encode_ht_blocks(blocks)
    steady = time.perf_counter() - t0
    mp = nblocks * w * h / 1e6
    print(f"ht_enc {w}x{h}x{nblocks}: {ok}/{nblocks} byte-exact, "
          f"first {warm:.2f} s, steady {steady * 1e3:.1f} ms "
          f"({mp / steady:.1f} MP/s/core incl host pack)")


def run_mq_dec(jax, w=64, h=64, nblocks=128):
    from grok_tpu.ops.pallas_t1 import decode_bucket_pallas
    from grok_tpu.t1.t1_scalar import decode_block, encode_block
    rng = np.random.default_rng(2)
    jobs, refs = [], []
    for i in range(nblocks):
        mag = np.abs((rng.normal(0, 30, (h, w))
                      * (rng.random((h, w)) < 0.6))).astype(np.int64)
        neg = rng.random((h, w)) < 0.5
        enc = encode_block(mag, neg, i % 4, 0)
        jobs.append(dict(data=enc.data, seg_lens=enc.seg_lens,
                         seg_passes=enc.seg_passes,
                         numpasses=len(enc.passes), numbps=enc.numbps,
                         orient=i % 4, w=w, h=h, style=0))
        refs.append(decode_block(enc.data, enc.seg_lens,
                                 len(enc.passes), enc.numbps, i % 4,
                                 w, h, 0))
    t0 = time.perf_counter()
    res = decode_bucket_pallas(jobs, w, h)
    warm = time.perf_counter() - t0
    ok = sum(1 for (m, n), (rm, rn) in zip(res, refs)
             if np.array_equal(m, rm) and np.array_equal(n, rn))
    t0 = time.perf_counter()
    decode_bucket_pallas(jobs, w, h)
    steady = time.perf_counter() - t0
    mp = nblocks * w * h / 1e6
    print(f"mq_dec {w}x{h}x{nblocks}: {ok}/{nblocks} bit-exact, "
          f"first {warm:.2f} s, steady {steady * 1e3:.1f} ms "
          f"({mp / steady:.1f} MP/s/core incl host pack)")


def run_mq_enc(jax, w=64, h=64, nblocks=128):
    from grok_tpu.ops.pallas_t1_enc import encode_bucket_pallas
    from grok_tpu.t1.t1_scalar import encode_block
    rng = np.random.default_rng(3)
    blocks, refs = [], []
    for i in range(nblocks):
        mag = np.abs((rng.normal(0, 30, (h, w))
                      * (rng.random((h, w)) < 0.6))).astype(np.int64)
        neg = rng.random((h, w)) < 0.5
        blocks.append(dict(mag=mag, neg=neg, orient=i % 4, style=0))
        refs.append(encode_block(mag, neg, i % 4, 0))
    t0 = time.perf_counter()
    res = encode_bucket_pallas(blocks)
    warm = time.perf_counter() - t0
    ok = sum(1 for g, r in zip(res, refs) if g.data == r.data)
    t0 = time.perf_counter()
    encode_bucket_pallas(blocks)
    steady = time.perf_counter() - t0
    mp = nblocks * w * h / 1e6
    print(f"mq_enc {w}x{h}x{nblocks}: {ok}/{nblocks} byte-exact, "
          f"first {warm:.2f} s, steady {steady * 1e3:.1f} ms "
          f"({mp / steady:.1f} MP/s/core incl host pack)")


def run_serve_mq_enc(jax, side=512, cblk_exp=5, n=10):
    """Fused Part-1 serving ENCODE (round 4): compress(backend="jax")
    on a default-style config must stay on the serving path and produce
    bytes identical to the host encoder; report the amortized rate."""
    from grok_tpu.api import compress
    from grok_tpu.core.params import CompressParams
    from grok_tpu.pipeline import serve_enc
    from grok_tpu.util.oracle import synthetic_image

    img = synthetic_image(side, side, 1, seed=7)
    kw = dict(num_resolutions=5, cblk_w_exp=cblk_exp, cblk_h_exp=cblk_exp)
    taken = []
    orig = serve_enc.try_encode_serving_batch

    def probe(images, hdr, t, params, pocs):
        r = orig(images, hdr, t, params, pocs)
        taken.append(r is not None)
        return r

    serve_enc.try_encode_serving_batch = probe
    try:
        t0 = time.perf_counter()
        dev = compress(img, CompressParams(backend="jax", **kw))
        warm = time.perf_counter() - t0
        host = compress(img, CompressParams(backend="native", **kw))
        ident = dev == host
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                dev = compress(img, CompressParams(backend="jax", **kw))
            best = min(best, (time.perf_counter() - t0) / n)
        mp = side * side / 1e6
        print(f"serve_mq_enc {side}^2 cblk {1 << cblk_exp}: "
              f"serving={taken[0] if taken else None} "
              f"byte-identical={ident}, first {warm:.1f} s, "
              f"steady {best * 1e3:.1f} ms ({mp / best:.2f} MP/s)")
    finally:
        serve_enc.try_encode_serving_batch = orig


def run_serve_mq_enc_rt(jax, side=512, cblk_exp=5, n=5):
    """Rate-targeted Part-1 serving ENCODE (round 4, late): the device
    program adds exact per-pass distortion stats (_mq_dstat) and the
    host runs the full PCRD finish — streams must stay on the serving
    path and match the host encoder byte-for-byte (reversible)."""
    from grok_tpu.api import compress
    from grok_tpu.core.params import CompressParams
    from grok_tpu.pipeline import serve_enc
    from grok_tpu.util.oracle import synthetic_image

    img = synthetic_image(side, side, 1, seed=7)
    taken = []
    orig = serve_enc.try_encode_serving_batch

    def probe(images, hdr, t, params, pocs):
        r = orig(images, hdr, t, params, pocs)
        taken.append(r is not None)
        return r

    serve_enc.try_encode_serving_batch = probe
    try:
        for extra in (dict(rates=[4.0]),
                      dict(num_layers=3, rates=[16.0, 4.0, 1.0])):
            kw = dict(num_resolutions=5, cblk_w_exp=cblk_exp,
                      cblk_h_exp=cblk_exp, **extra)
            taken.clear()
            t0 = time.perf_counter()
            dev = compress(img, CompressParams(backend="jax", **kw))
            warm = time.perf_counter() - t0
            host = compress(img, CompressParams(backend="native", **kw))
            ident = dev == host
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n):
                    dev = compress(img, CompressParams(backend="jax",
                                                       **kw))
                best = min(best, (time.perf_counter() - t0) / n)
            mp = side * side / 1e6
            print(f"serve_mq_enc_rt {side}^2 cblk {1 << cblk_exp} "
                  f"{extra}: serving={taken[0] if taken else None} "
                  f"byte-identical={ident}, first {warm:.1f} s, "
                  f"steady {best * 1e3:.1f} ms ({mp / best:.2f} MP/s)")
    finally:
        serve_enc.try_encode_serving_batch = orig


def run_serve_mixed_enc(jax, side=512, cblk_exp=5, n=5):
    """Device HT MIXED serving encode: both kernels on device, per-block
    min, byte-identical to the host mixed encoder."""
    from grok_tpu.api import compress
    from grok_tpu.core.params import CompressParams
    from grok_tpu.pipeline import serve_enc
    from grok_tpu.util.oracle import synthetic_image

    img = synthetic_image(side, side, 1, seed=7)
    kw = dict(ht_mixed=True, num_resolutions=5,
              cblk_w_exp=cblk_exp, cblk_h_exp=cblk_exp)
    taken = []
    orig = serve_enc.try_encode_serving_batch

    def probe(images, hdr, t, params, pocs):
        r = orig(images, hdr, t, params, pocs)
        taken.append(r is not None)
        return r

    serve_enc.try_encode_serving_batch = probe
    try:
        t0 = time.perf_counter()
        dev = compress(img, CompressParams(backend="jax", **kw))
        warm = time.perf_counter() - t0
        host = compress(img, CompressParams(backend="native", **kw))
        ident = dev == host
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                dev = compress(img, CompressParams(backend="jax", **kw))
            best = min(best, (time.perf_counter() - t0) / n)
        mp = side * side / 1e6
        print(f"serve_mixed_enc {side}^2 cblk {1 << cblk_exp}: "
              f"serving={taken[0] if taken else None} "
              f"byte-identical={ident}, first {warm:.1f} s, "
              f"steady {best * 1e3:.1f} ms ({mp / best:.2f} MP/s), "
              f"{len(dev)} B")
    finally:
        serve_enc.try_encode_serving_batch = orig


def run_serve_mixed_dec(jax, side=512, cblk_exp=5, n=10):
    """Device serving decode of HT MIXED streams (round 4, late): the
    per-stream COM bitmap routes blocks between the ht3 and mq3 kernel
    buckets of one fused program.  Natural content picks MQ everywhere
    (PERF.md), so also force a truly mixed bitmap via the encoder
    comparison hook and check losslessness + amortized rate."""
    import numpy as np

    from grok_tpu.api import compress, decompress_device
    from grok_tpu.core.params import CompressParams
    from grok_tpu.pipeline import serve
    import grok_tpu.pipeline.tile as tile_pipe
    from grok_tpu.util.oracle import synthetic_image

    img = synthetic_image(side, side, 1, seed=7)
    kw = dict(ht_mixed=True, num_resolutions=5,
              cblk_w_exp=cblk_exp, cblk_h_exp=cblk_exp)
    streams = {"natural": compress(img, CompressParams(**kw))}
    real = tile_pipe.encode_block
    calls = {"n": 0}

    def fat_every_other(mag, neg, orient, style):
        e = real(mag, neg, orient, style)
        calls["n"] += 1
        if calls["n"] % 2 and e.data:
            e.data = e.data + b"\x00" * 4096
            e.seg_lens = [len(e.data)]
        return e

    tile_pipe.encode_block = fat_every_other
    try:
        streams["forced"] = compress(img, CompressParams(**kw))
    finally:
        tile_pipe.encode_block = real

    taken = []
    orig = serve.try_decode_serving_batch

    def probe(cs, hdr, t, th, bodies, dp, ths=None):
        r = orig(cs, hdr, t, th, bodies, dp, ths=ths)
        taken.append(r is not None)
        return r

    serve.try_decode_serving_batch = probe
    try:
        for label, s in streams.items():
            taken.clear()
            out = decompress_device(s)
            jax.block_until_ready(out)
            ok = np.array_equal(np.asarray(out[0]), img)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n):
                    out = decompress_device(s)
                jax.block_until_ready(out)
                np.asarray(out[0][:1, :1])
                best = min(best, (time.perf_counter() - t0) / n)
            mp = side * side / 1e6
            print(f"serve_mixed_dec {label} {side}^2 "
                  f"({len(s)} B): serving={taken[0] if taken else None} "
                  f"lossless={ok}, steady {best * 1e3:.1f} ms "
                  f"({mp / best:.2f} MP/s)")
    finally:
        serve.try_decode_serving_batch = orig


def run_gather_probe(jax, rows=64):
    """Probe tpu.dynamic_gather support: jnp.take_along_axis on a 2D
    (rows, 128) array with per-lane row indices.  If Mosaic lowers and
    runs this correctly, the staged-window one-hot machinery in the T1
    kernels could be replaced by native per-lane gathers."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)

    x = np.arange(rows * 128, dtype=np.int32).reshape(rows, 128)
    idx = np.random.default_rng(0).integers(0, rows, (rows, 128),
                                            dtype=np.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(x), jnp.asarray(idx))
        out = np.asarray(out)
        ok = np.array_equal(out, np.take_along_axis(x, idx, axis=0))
        print(f"gather_probe rows={rows}: lowers, correct={ok}")
    except Exception as e:
        print(f"gather_probe rows={rows}: UNSUPPORTED ({type(e).__name__}:"
              f" {str(e)[:120]})")


def main():
    jax = _setup_jax()
    print("backend:", jax.default_backend(), jax.devices())
    which = sys.argv[1:] or ["gather_probe", "ht_dec", "ht_enc",
                             "mq_dec", "mq_enc"]
    for k in which:
        t0 = time.perf_counter()
        globals()[f"run_{k}"](jax)
        print(f"  [{k} total {time.perf_counter() - t0:.1f} s]",
              flush=True)


if __name__ == "__main__":
    main()
