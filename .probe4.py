import time
import numpy as np
import jax
import jax.numpy as jnp

ITERS = 2048
B = 256
tbl = jax.device_put(np.random.randint(0, 1 << 29, (47,), dtype=np.int32))
data = jax.device_put(np.random.randint(0, 1 << 30, (B, 2048), dtype=np.int32))
arr3 = jax.device_put(np.zeros((B, 66, 66), dtype=np.int32))

def bench(name, body):
    @jax.jit
    def f(x):
        return jax.lax.fori_loop(0, ITERS, body, x)
    x0 = jnp.zeros((B,), jnp.int32)
    jax.block_until_ready(f(x0))
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(f(x0))
    tr = (time.time() - t0) / 3
    print(f"{name}: {tr/ITERS*1e6:.2f}us/iter")

def b_take(i, acc):
    v = jnp.take(tbl, acc % 47)
    return acc + (v & 1)

def b_gather(i, acc):
    idx = (acc % 2048)[:, None]
    v = jnp.take_along_axis(data, idx, axis=1)[:, 0]
    return acc + (v & 1)

def b_dynslice(i, acc):
    y = i % 64
    x = (i // 64) % 64
    n = jax.lax.dynamic_slice(arr3, (0, y, x), (B, 3, 3))
    return acc + jnp.sum(n, axis=(1, 2)) % 2

def b_dynupd(i, acc):
    y = i % 64
    x = (i // 64) % 64
    global arr3
    cur = jax.lax.dynamic_slice(arr3, (0, y, x), (B, 1, 1))
    return acc + cur[:, 0, 0] % 2

def b_vec100(i, acc):
    v = acc
    for _ in range(25):
        v = (v * 3 + 7) & 0xFFFF
        v = v ^ (v >> 3)
        v = v + (v << 2 & 0xFFF)
        v = jnp.where(v > 100, v - 5, v)
    return v % 97 + acc % 3

def b_onehot19(i, acc):
    oh = (jnp.arange(19)[None, :] == (acc % 19)[:, None])
    st = jnp.sum(jnp.where(oh, acc[:, None] + jnp.arange(19)[None, :], 0), axis=1)
    return acc + st % 2

bench("take47", b_take)
bench("gather2048", b_gather)
bench("dynslice3x3", b_dynslice)
bench("dynslice1x1", b_dynupd)
bench("vec100ops", b_vec100)
bench("onehot19", b_onehot19)
