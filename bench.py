"""Benchmark: end-to-end decode + encode throughput (MP/s) vs the
OpenJPEG oracle.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline (TPU backends): the fused DEVICE decode path — host T2 parse,
Pallas HT block decode + dequant + inverse DWT on chip, decoded pixels
left DEVICE-RESIDENT (the serving shape: an accelerator consumer reads
them from HBM; no host download).  Extra fields record the host native
path, the oracle, the batched path, the like-for-like Part-1 device
rate, ENCODE rates (host + fused device), and `device_program_mps` —
the decode program rate with request bytes already staged in HBM,
which is what a local-attached link would measure (the tunnel's
5-22 MB/s H2D is this rig's floor; docs/PERF.md round-5 overlap
verdict).  On CPU (GROK_BENCH_PLATFORM=cpu) the headline falls back
to the host C path.

vs_baseline = headline / oracle throughput on the same image, both
lossless (ours: HT cleanup / Part-1 5/3; oracle: Part-1 5/3 — OpenJPEG
2.5 has no HT path, its Part-1 decode is its best lossless rate).

Methodology (every device figure): N back-to-back calls amortized,
best of R rounds, with a final 1-px D2H read as the completion barrier
— axon's block_until_ready can ack early and per-call timings lie in
both directions (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _best(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _tpu_responsive(timeout_s: float = 120.0) -> bool:
    """Probe device init in a subprocess: the axon service can hang
    indefinitely at backend setup, which would wedge the bench."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return r.returncode == 0
    except Exception:
        return False


def main():
    if not os.environ.get("GROK_BENCH_PLATFORM") and not _tpu_responsive():
        os.environ["GROK_BENCH_PLATFORM"] = "cpu"
        print("# TPU backend unresponsive; falling back to CPU",
              file=sys.stderr)
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

    import numpy as np

    from grok_tpu import CompressParams, DecompressParams, compress, decompress
    from grok_tpu.util.oracle import (HAVE_ORACLE, oracle_decode,
                                      oracle_encode, synthetic_image)

    side = int(os.environ.get("GROK_BENCH_SIZE", "512"))
    reps = int(os.environ.get("GROK_BENCH_REPS", "5"))
    img = synthetic_image(side, side, 1, seed=7)
    mp = side * side / 1e6

    def _bar_dec(out):
        jax.block_until_ready(out)
        np.asarray(out[0][:1, :1])   # 1-px D2H: completion barrier

    # -- host native path (Part-1, C T1 + C DWT, threaded) -------------------
    data = compress(img, CompressParams(num_resolutions=5))
    dp_host = DecompressParams(backend="native")
    out = decompress(data, dp_host).to_array()
    assert np.array_equal(out, img), "host decode is not lossless"
    host_mps = mp / _best(lambda: decompress(data, dp_host), reps)
    cp_host = CompressParams(num_resolutions=5)
    enc_host_mps = mp / _best(lambda: compress(img, cp_host), reps)

    # -- oracle ----------------------------------------------------------------
    oracle_mps = 0.0
    oracle_enc_mps = 0.0
    if HAVE_ORACLE:
        odata = oracle_encode(img, num_resolutions=5)
        oracle_decode(odata)
        oracle_mps = mp / _best(lambda: oracle_decode(odata), reps)
        oracle_enc_mps = mp / _best(
            lambda: oracle_encode(img, num_resolutions=5), reps)

    # -- fused device paths (TPU only) ---------------------------------------
    # The relay alternates between bandwidth-bound and per-call-overhead
    # -bound regimes on a timescale of MINUTES (docs/PERF.md round-5
    # verdict: single 27 -> 99 ms/frame and batch8 27 -> 9.2 ms/frame
    # between two same-day windows), so every path is measured once per
    # ROUND and the rounds interleave across paths — each path samples
    # several weather windows and keeps its best.
    device_mps = 0.0
    batch_mps = 0.0
    program_mps = 0.0
    device_mq_mps = 0.0
    enc_device_mps = 0.0
    enc_batch_mps = 0.0
    on_tpu = jax.default_backend() in ("tpu", "axon")
    relay_errs = []
    if on_tpu:
        import jax.numpy as jnp

        from grok_tpu.api import (compress_device, decompress_device,
                                  decompress_device_batch)
        # 32x32 code-blocks: short per-lane streams (small staged windows)
        # and wide kernel launches — the device coder's sweet spot
        cp = CompressParams(ht=True, num_resolutions=5,
                            cblk_w_exp=5, cblk_h_exp=5)
        ht = compress(img, cp)
        n = max(reps, 20)
        nb = 8
        imgs_b = [synthetic_image(side, side, 1, seed=100 + i)
                  for i in range(nb)]
        streams = [compress(im, cp) for im in imgs_b]
        mq32 = compress(img, CompressParams(num_resolutions=5,
                                            cblk_w_exp=5, cblk_h_exp=5))
        rounds_n = max(3, (n + nb - 1) // nb)

        def _bar_b(outs):
            jax.block_until_ready(outs[-1])
            np.asarray(outs[-1][0][:1, :1])

        def _timed(call, barrier, count: int) -> float:
            t0 = time.perf_counter()
            last = None
            for _ in range(count):
                last = call()
            barrier(last)
            return (time.perf_counter() - t0) / count

        # warm-up + correctness (once, untimed)
        warm = {}
        try:
            devs = decompress_device(ht)
            jax.block_until_ready(devs)
            assert np.array_equal(np.asarray(devs[0]), img), \
                "device decode is not lossless"
            warm["single"] = True
        except jax.errors.JaxRuntimeError as e:   # relay flake: field 0
            relay_errs.append(f"device: {e}")
        try:
            outs = decompress_device_batch(streams)
            jax.block_until_ready(outs[-1])
            for im, ob in zip(imgs_b, outs):
                assert np.array_equal(np.asarray(ob[0]), im), \
                    "batched device decode is not lossless"
            warm["batch"] = True
        except jax.errors.JaxRuntimeError as e:
            relay_errs.append(f"batch: {e}")
        try:
            devs = decompress_device(mq32)
            jax.block_until_ready(devs)
            assert np.array_equal(np.asarray(devs[0]), img)
            warm["mq"] = True
        except jax.errors.JaxRuntimeError as e:
            relay_errs.append(f"mq: {e}")
        arrs_enc = [jnp.asarray(img.astype(np.int32))]
        try:
            jax.block_until_ready(arrs_enc)
            got = compress_device(arrs_enc, cp)
            assert got == ht, "device HT encode is not byte-identical"
            warm["enc"] = True
        except jax.errors.JaxRuntimeError as e:
            relay_errs.append(f"enc: {e}")
        from grok_tpu.api import compress_device_batch
        arrs_enc_b = [[jnp.asarray(im.astype(np.int32))]
                      for im in imgs_b]
        try:
            jax.block_until_ready(arrs_enc_b)
            outs_e = compress_device_batch(arrs_enc_b, cp)
            for im_s, o_s in zip(streams, outs_e):
                assert o_s == im_s, \
                    "batched device encode is not byte-identical"
            warm["encb"] = True
        except jax.errors.JaxRuntimeError as e:
            relay_errs.append(f"encb: {e}")
        # decode program handle: request bytes already resident in HBM
        # (what a local-attached link measures; this rig's tunnel is the
        # headline's floor — docs/PERF.md round-5 overlap verdict)
        cap = {}
        if warm.get("batch"):
            try:
                from grok_tpu.pipeline import device as _dev
                from grok_tpu.pipeline import serve as _serve
                real_build = _dev._build_decode_fn

                def _tap(sig):
                    fn = real_build(sig)

                    def wrapped(arrs, body_d):
                        cap["fn"], cap["arrs"], cap["body"] = \
                            fn, arrs, body_d
                        return fn(arrs, body_d)
                    return wrapped

                _dev._build_decode_fn = _tap
                try:
                    _serve._PLANS.clear()
                    outs = decompress_device_batch(streams)
                finally:
                    # a relay flake must not leave the tap installed:
                    # later decodes would repopulate `cap` with the
                    # WRONG program and mislabel device_program_mps
                    _dev._build_decode_fn = real_build
                    _serve._PLANS.clear()
                jax.block_until_ready(outs[-1])
            except jax.errors.JaxRuntimeError as e:
                cap.clear()
                relay_errs.append(f"program: {e}")

        best = {}
        for _ in range(4):
            for key, ok, fn_t in (
                ("single", warm.get("single"), lambda: _timed(
                    lambda: decompress_device(ht), _bar_dec, n)),
                ("batch", warm.get("batch"), lambda: _timed(
                    lambda: decompress_device_batch(streams), _bar_b,
                    rounds_n) / nb),
                ("program", "fn" in cap, lambda: _timed(
                    lambda: cap["fn"](cap["arrs"], cap["body"]),
                    _bar_dec, 4) / nb),
                ("mq", warm.get("mq"), lambda: _timed(
                    lambda: decompress_device(mq32), _bar_dec, n)),
                ("enc", warm.get("enc"), lambda: _timed(
                    lambda: compress_device(arrs_enc, cp),
                    lambda _: None, max(reps, 10))),
                ("encb", warm.get("encb"), lambda: _timed(
                    lambda: compress_device_batch(arrs_enc_b, cp),
                    lambda _: None, 2) / nb),
            ):
                if not ok:
                    continue
                try:
                    dt = fn_t()
                    if dt < best.get(key, float("inf")):
                        best[key] = dt
                except jax.errors.JaxRuntimeError as e:
                    relay_errs.append(f"{key} round: {e}")

        device_mps = mp / best["single"] if "single" in best else 0.0
        batch_mps = mp / best["batch"] if "batch" in best else 0.0
        program_mps = mp / best["program"] if "program" in best else 0.0
        device_mq_mps = mp / best["mq"] if "mq" in best else 0.0
        enc_device_mps = mp / best["enc"] if "enc" in best else 0.0
        enc_batch_mps = mp / best["encb"] if "encb" in best else 0.0

    value, path = max(
        (host_mps, "host_native"),
        (device_mps, "tpu_device_resident"),
        (batch_mps, "tpu_device_batch"), key=lambda t: t[0])
    vs_baseline = value / oracle_mps if oracle_mps else 0.0

    # density transparency (bytes moved IS frame time on the
    # link-bound serving path): pure coders + the round-4 MIXED mode
    # (per-block min — PERF.md proves the HT gap structural), all at
    # like-for-like default 64x64 code-blocks
    ht_bytes = len(compress(img, CompressParams(ht=True,
                                                num_resolutions=5)))
    mixed_bytes = len(compress(img, CompressParams(
        ht_mixed=True, num_resolutions=5)))

    for e in relay_errs:
        print(f"# relay error (field zeroed): {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "decode_throughput_lossless_53",
        "value": round(value, 3),
        "unit": "MP/s",
        "vs_baseline": round(vs_baseline, 3),
        "path": path,
        "host_native_mps": round(host_mps, 3),
        "oracle_mps": round(oracle_mps, 3),
        "device_mps": round(device_mps, 3),
        "device_batch_mps": round(batch_mps, 3),
        "device_program_mps": round(program_mps, 3),
        "device_mq_mps": round(device_mq_mps, 3),
        "encode_host_mps": round(enc_host_mps, 3),
        "encode_device_mps": round(enc_device_mps, 3),
        "encode_device_batch_mps": round(enc_batch_mps, 3),
        "oracle_enc_mps": round(oracle_enc_mps, 3),
        "mq_bytes": len(data),
        "ht_bytes": ht_bytes,
        "mixed_bytes": mixed_bytes,
        "size": side,
    }))


if __name__ == "__main__":
    sys.exit(main())
