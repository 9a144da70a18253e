import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
os.environ["GROK_T1_PALLAS"] = "1"
from grok_tpu.t1.t1_scalar import encode_block
from grok_tpu.ops.t1_enc import encode_blocks

W = H = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 128
rng = np.random.default_rng(0)
blocks, refs = [], []
for i in range(NB):
    mag = np.abs(rng.normal(0, [10, 60, 300][i % 3], (H, W))).astype(np.int64)
    mag[rng.random((H, W)) < 0.55] = 0
    neg = rng.random((H, W)) < 0.5
    blocks.append(dict(mag=mag, neg=neg, orient=i % 4, style=0, w=W, h=H))
    refs.append(encode_block(mag, neg, i % 4, 0))
t0 = time.time()
encs = encode_blocks(blocks)
print(f"first call: {time.time()-t0:.1f}s")
bad = sum(1 for e, r in zip(encs, refs) if e.data != r.data)
print("bit-exact:", "OK" if bad == 0 else f"FAIL {bad}/{NB}")
best = 1e9
for _ in range(3):
    t0 = time.time()
    encode_blocks(blocks)
    best = min(best, time.time() - t0)
print(f"steady: {best*1e3:.1f} ms -> {NB*W*H/best/1e6:.1f} MP/s")
