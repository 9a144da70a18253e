import os, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from grok_tpu.t1.t1_scalar import encode_block
from grok_tpu.ops.pallas_t1 import decode_bucket_pallas, LANES

W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 128
rng = np.random.default_rng(0)
blocks, refs = [], []
for i in range(NB):
    mag = np.abs(rng.normal(0, [10, 60, 300][i % 3], (H, W))).astype(np.int64)
    mag[rng.random((H, W)) < 0.55] = 0
    neg = rng.random((H, W)) < 0.5
    enc = encode_block(mag, neg, i % 4, 0)
    blocks.append(dict(data=enc.data, numpasses=len(enc.passes),
                       numbps=enc.numbps, orient=i % 4, w=W, h=H))
    refs.append((mag, neg))
avg_len = np.mean([len(b["data"]) for b in blocks])
print(f"{NB} blocks {W}x{H}, avg codeword {avg_len:.0f} B")

t0 = time.time()
res = decode_bucket_pallas(blocks, W, H)
print(f"first call (compile+run): {time.time()-t0:.1f}s")
bad = sum(1 for (m2, ng), (m, n) in zip(res, refs)
          if not (np.array_equal(m2 >> 1, m)
                  and np.array_equal(ng[m > 0], n[m > 0])))
print("bit-exact:", "OK" if bad == 0 else f"FAIL {bad}/{NB}")

best = 1e9
for _ in range(3):
    t0 = time.time()
    res = decode_bucket_pallas(blocks, W, H)
    best = min(best, time.time() - t0)
mp = NB * W * H / best / 1e6
print(f"steady: {best*1e3:.1f} ms -> {mp:.1f} MP/s")
