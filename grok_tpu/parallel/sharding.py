"""Multi-chip parallelism (SURVEY.md §2.1): the codec analogs of DP/TP.

Two first-class strategies:

1. Tile-batch data parallelism (`shard_tiles_decode` / `codec_roundtrip_step`):
   independent tiles sharded across chips on a 1-D `tiles` mesh axis via
   NamedSharding — the analog of the reference's per-tile thread pool, with
   XLA inserting any needed collectives.  Global PCRD statistics reduce with
   a sharded sum (psum under jit).

2. Huge-tile spatial sharding (`inv53_vertical_sharded`): one tile's rows
   sharded across chips; the vertical lifting pass needs a 2-sample halo of
   neighbor rows per level (5/3), exchanged with `ppermute` over ICI inside
   `shard_map` — structurally the ring-neighbor exchange of
   sequence-parallel attention, and exactly the "DWT tile-boundary
   extension sample" exchange the north star names.

Tested on an 8-device virtual CPU mesh (tests/test_parallel.py); the same
code runs unchanged on a real TPU slice.
"""

from __future__ import annotations

from functools import partial

import numpy as np


def tile_mesh(n_devices: int | None = None):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), ("tiles",))


def shard_tile_batch(arr, mesh):
    """Place a (T, ...) tile batch with the leading axis sharded."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P("tiles", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def make_codec_roundtrip_step(rect, num_resolutions: int, prec: int = 8):
    """Jitted sharded step: DC shift -> RCT -> fwd DWT -> (R-D stat psum)
    -> inverse DWT -> inverse RCT -> unshift, over a (T, 3, H, W) batch.

    The returned fn is safe to jit with a sharded input; the distortion
    statistic is a global (cross-shard) scalar — the PCRD exchange.
    """
    import jax
    import jax.numpy as jnp

    from grok_tpu.ops import dwt as jdwt
    from grok_tpu.ops import mct as jmct

    @jax.jit
    def step(tiles):
        r, g, b = tiles[:, 0], tiles[:, 1], tiles[:, 2]
        y, cb, cr = jmct.rct_fwd(jmct.dc_shift_fwd(r, prec, False),
                                 jmct.dc_shift_fwd(g, prec, False),
                                 jmct.dc_shift_fwd(b, prec, False))
        outs = []
        dist = jnp.float32(0)
        for comp in (y, cb, cr):
            bands = jdwt.fwd_multilevel(comp, rect, num_resolutions, False)
            dist = dist + jnp.sum(jnp.abs(bands[0]).astype(jnp.float32))
            outs.append(jdwt.inv_multilevel(bands, rect, num_resolutions,
                                            False))
        r2, g2, b2 = jmct.rct_inv(*outs)
        out = jnp.stack([jmct.dc_shift_inv(r2, prec, False),
                         jmct.dc_shift_inv(g2, prec, False),
                         jmct.dc_shift_inv(b2, prec, False)], axis=1)
        return out, dist

    return step


# ---------------------------------------------------------------------------
# Huge-tile spatial sharding: vertical 5/3 with ppermute halo exchange
# ---------------------------------------------------------------------------

def make_inv53_vertical_sharded(mesh, rows_per_shard: int, width: int):
    """Inverse vertical 5/3 lifting over a row-sharded (R, W) image.

    Input: interleaved low/high rows in natural order (even abs row = low),
    rows sharded contiguously across the `tiles` axis.  Each shard exchanges
    2 boundary rows with each neighbor (the lifting halo) via ppermute.

    Returns a jitted fn (full_rows sharded) -> lifted rows, bit-exact vs
    the single-device inverse (whole-sample symmetric extension at the
    global edges).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    axis = "tiles"

    def local(block):
        # block: (rows_per_shard, W) local rows; exchange halos
        idx = jax.lax.axis_index(axis)
        up = jax.lax.ppermute(block[-2:, :], axis,
                              [(i, (i + 1) % n) for i in range(n)])
        down = jax.lax.ppermute(block[:2, :], axis,
                                [(i, (i - 1) % n) for i in range(n)])
        # global edges: whole-sample symmetric extension instead of wrap
        top_ext = block[1:3, :][::-1]       # rows 1,2 mirrored
        bot_ext = block[-3:-1, :][::-1]
        up = jnp.where(idx == 0, top_ext, up)
        down = jnp.where(idx == n - 1, bot_ext, down)
        ext = jnp.concatenate([up, block, down], axis=0)
        # vertical inverse 5/3 on the extended strip (rows at global
        # parity: local row j is global idx*rows_per_shard + j - 2)
        base = idx * rows_per_shard - 2
        rows = ext.shape[0]
        e = ext[1:-1, :] - ((ext[:-2, :] + ext[2:, :] + 2) >> 2)
        o = ext[2:-2, :] + ((e[:-2, :] + e[2:, :]) >> 1)
        emid = e[1:-1, :]
        jpar = (jnp.arange(rows - 4) + base + 2) % 2
        out = jnp.where(jpar[:, None] == 0, emid, o)
        return out

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return jax.jit(fn)


def reference_inv53_vertical(y: np.ndarray) -> np.ndarray:
    """Single-device oracle for the sharded vertical inverse lifting."""
    from grok_tpu.transform.dwt_np import _extend2

    ye = _extend2(np.swapaxes(y.astype(np.int64), -1, -2), 2)
    e = np.empty_like(ye)
    e[..., 1:-1] = ye[..., 1:-1] - ((ye[..., :-2] + ye[..., 2:] + 2) >> 2)
    o = ye[..., 2:-2] + ((e[..., 1:-3] + e[..., 3:-1]) >> 1)
    n = y.shape[0]
    out = np.empty_like(np.swapaxes(y, -1, -2))
    out[..., 0::2] = e[..., 2:-2][..., 0::2]
    out[..., 1::2] = o[..., 1::2]
    return np.swapaxes(out, -1, -2)


# ---------------------------------------------------------------------------
# Distributed T1: code-block batch sharded across chips
# ---------------------------------------------------------------------------

def decode_blocks_sharded(blocks: list[dict], mesh, W: int, H: int):
    """Decode a code-block batch with the lane axis sharded over the mesh.

    The batched T1 kernel carries only per-lane state, so sharding the
    block axis is pure data parallelism — each chip decodes its share of
    the blocks with no cross-chip traffic (the codec analog of DP over the
    reference's thread pool).  Blocks are padded to a multiple of the mesh
    size.  Returns per-block (mag2, neg) numpy arrays.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from grok_tpu.ops.t1_dec import default_fold, pack_pairs, t1_decode_batch

    n = mesh.devices.size
    B = len(blocks)
    Bp = -(-B // n) * n
    maxlen = max((len(b["data"]) for b in blocks), default=1)
    L = max(8, -(-maxlen // 64) * 64)
    data = np.zeros((Bp, L), dtype=np.uint8)
    dlen = np.zeros((Bp,), dtype=np.int32)
    npass = np.zeros((Bp,), dtype=np.int32)
    nbps = np.zeros((Bp,), dtype=np.int32)
    ori = np.zeros((Bp,), dtype=np.int32)
    wh = np.ones((Bp, 2), dtype=np.int32)
    for i, b in enumerate(blocks):
        d = b["data"]
        data[i, :len(d)] = np.frombuffer(d, dtype=np.uint8)
        dlen[i] = len(d)
        npass[i] = b["numpasses"]
        nbps[i] = b["numbps"]
        ori[i] = b["orient"]
        wh[i] = (b["w"], b["h"])
    maxbp = -(-int(nbps.max()) // 4) * 4 if B else 4

    sh1 = NamedSharding(mesh, P("tiles"))
    sh2 = NamedSharding(mesh, P("tiles", None))
    args = (jax.device_put(pack_pairs(data), sh2),
            jax.device_put(dlen, sh1), jax.device_put(npass, sh1),
            jax.device_put(nbps, sh1), jax.device_put(ori, sh1),
            jax.device_put(wh, sh2))
    mag2, neg = t1_decode_batch(*args, W, H, maxbp, default_fold())
    mag2 = np.asarray(mag2)
    neg = np.asarray(neg)
    return [(mag2[i, :b["h"], :b["w"]].astype(np.int64),
             neg[i, :b["h"], :b["w"]])
            for i, b in enumerate(blocks)]
