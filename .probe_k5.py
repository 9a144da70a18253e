import sys
import numpy as np
import jax, jax.numpy as jnp
variant = sys.argv[1]
src = open('/root/repo/grok_tpu/ops/pallas_t1.py').read()
# strip to SPP only
src = src.replace("""            mqs, _ = jax.lax.fori_loop(0, n_stripes * W * 4, mrp_step,
                                       (mqs, bp))""", "", 1)
src = src.replace("""            carry = jax.lax.fori_loop(0, n_stripes * W * 11, cln_step,
                                      carry)
            mqs = carry[0]""", "", 1)
if variant == 'noread':
    src = src.replace("""            visv = vis_ref[y, x, :] != 0""",
                      """            visv = jnp.zeros((LANES,), bool)""", 1)
elif variant == 'nowrite':
    src = src.replace("""            row_set(vis_ref, y, x, jnp.ones((1, LANES), jnp.int32), coded,
                    False)""", "", 1)
elif variant == 'rowread':
    src = src.replace("""            visv = vis_ref[y, x, :] != 0""",
"""            vrow = vis_ref[y, :, :]
            visv = jnp.sum(jnp.where((wiota == x), vrow, 0), axis=0) != 0""", 1)
ns = {}
exec(src, ns)
f = ns['pallas_t1_decode']
from grok_tpu.t1.t1_scalar import encode_block
rng = np.random.default_rng(0)
blocks = []
for i in range(4):
    mag = np.abs(rng.normal(0, 40, (16, 16))).astype(np.int64)
    neg = rng.random((16, 16)) < 0.5
    enc = encode_block(mag, neg, i % 4, 0)
    blocks.append(dict(data=enc.data, numpasses=enc.numpasses, numbps=enc.numbps, orient=i%4, w=16, h=16))
data, npass, nbps, ori, wh, B = ns['pack_for_pallas'](blocks)
args = [jnp.asarray(x) for x in (data, npass, nbps, ori, wh)]
try:
    m, n = f(*args, 16, 16, 8, data.shape[0]*32, False)
    jax.block_until_ready(m)
    print(variant, 'COMPILES')
except Exception as e:
    print(variant, 'FAIL', str(e)[:50])
