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

def make_inv53_vertical_sharded(mesh, rows_per_shard: int):
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
    from jax import shard_map
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


# ---------------------------------------------------------------------------
# Full 2D level inverse, row-sharded: the giant-tile decode building block
# ---------------------------------------------------------------------------

def make_inv53_2d_sharded(mesh, rows_per_shard: int, width: int):
    """One full inverse 5/3 level over a row-sharded (R, W) interleaved
    array (even abs row/col = low-pass), bit-exact vs the host kernel.

    Horizontal lifting is local (each shard owns whole rows); vertical
    lifting exchanges a 2-row halo with each neighbor over ICI via
    ppermute — SURVEY §2.1's "DWT tile-boundary extension sample"
    exchange.  Oracle order (Annex F): horizontal first, then vertical.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.devices.size
    axis = "tiles"
    W = width

    def h_inverse(rows):
        # in-place interleaved horizontal lifting on (rows, W) int32:
        # even abs columns are low-pass.  Whole-sample symmetric ext.
        def ext2(a):
            left = a[:, 1:3][:, ::-1]
            right = a[:, -3:-1][:, ::-1]
            return jnp.concatenate([left, a, right], axis=1)
        # computing e at every position is exact: odd positions only ever
        # read e at even neighbors, and e at the extension slots equals
        # the mirrored interior e by symmetry of the lifting expression
        ya = ext2(rows)
        e = ya[:, 1:-1] - ((ya[:, :-2] + ya[:, 2:] + 2) >> 2)
        o = ya[:, 2:-2] + ((e[:, :-2] + e[:, 2:]) >> 1)
        jpar = jnp.arange(W) % 2
        return jnp.where(jpar[None, :] == 0, e[:, 1:-1], o)

    def local(block):
        idx = jax.lax.axis_index(axis)
        hrows = h_inverse(block)
        up = jax.lax.ppermute(hrows[-2:, :], axis,
                              [(i, (i + 1) % n) for i in range(n)])
        down = jax.lax.ppermute(hrows[:2, :], axis,
                                [(i, (i - 1) % n) for i in range(n)])
        top_ext = hrows[1:3, :][::-1]
        bot_ext = hrows[-3:-1, :][::-1]
        up = jnp.where(idx == 0, top_ext, up)
        down = jnp.where(idx == n - 1, bot_ext, down)
        ext = jnp.concatenate([up, hrows, down], axis=0)
        base = idx * rows_per_shard - 2
        rows = ext.shape[0]
        e = ext[1:-1, :] - ((ext[:-2, :] + ext[2:, :] + 2) >> 2)
        o = ext[2:-2, :] + ((e[:-2, :] + e[2:, :]) >> 1)
        jpar = (jnp.arange(rows - 4) + base + 2) % 2
        return jnp.where(jpar[:, None] == 0, e[1:-1, :], o)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return jax.jit(fn)


def decode_blocks_sharded_auto(blocks: list[dict], mesh):
    """decode_blocks_sharded over mixed shapes: bucket by padded dims,
    one sharded batch per bucket.  Returns per-block (mag2, neg)."""
    results: list = [None] * len(blocks)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, b in enumerate(blocks):
        import numpy as _np
        if b["numpasses"] <= 0 or b["numbps"] <= 0:
            results[i] = (_np.zeros((b["h"], b["w"]), _np.int64),
                          _np.zeros((b["h"], b["w"]), bool))
            continue
        W = H = 4   # kernel minimum (stripe geometry)
        while W < b["w"]:
            W <<= 1
        while H < b["h"]:
            H <<= 1
        buckets.setdefault((W, H), []).append(i)
    for (W, H), idxs in buckets.items():
        for i, res in zip(idxs, decode_blocks_sharded(
                [blocks[i] for i in idxs], mesh, W, H)):
            results[i] = res
    return results


def make_inv_2d_level_sharded(mesh, rows_per_shard: int, width: int,
                              x0: int, y0: int, irrev: bool):
    """One full inverse DWT level over a row-sharded (R, W) interleaved
    array — the generalized giant-tile building block.

    Lifts the round-1 limits (VERDICT #4): odd canvas parities (x0, y0)
    and the irreversible 9/7 filter (4-sample halos, f32 lifting in the
    same op order as ops/dwt.py).  Horizontal lifting is local to each
    shard; vertical lifting exchanges a 4-row halo with each neighbour
    over ICI via ppermute.  Global edges use whole-sample symmetric
    extension; callers pad ragged row counts with mirror rows
    (inv_2d_level_sharded) so every shard is full.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from grok_tpu.transform.dwt_np import ALPHA, BETA, DELTA, GAMMA

    n = mesh.devices.size
    axis = "tiles"
    W = width
    HALO = 4

    def h_inverse53(rows):
        def ext2(a):
            left = a[:, 1:3][:, ::-1]
            right = a[:, -3:-1][:, ::-1]
            return jnp.concatenate([left, a, right], axis=1)
        ya = ext2(rows)
        e = ya[:, 1:-1] - ((ya[:, :-2] + ya[:, 2:] + 2) >> 2)
        o = ya[:, 2:-2] + ((e[:, :-2] + e[:, 2:]) >> 1)
        jpar = (jnp.arange(W) + x0) % 2
        return jnp.where(jpar[None, :] == 0, e[:, 1:-1], o)

    def lift_h(a, coef, target_par, base_par):
        # a[:, j] += coef * (a[:, j-1] + a[:, j+1]) where abs parity hits
        upd = a[:, 1:-1] + coef * (a[:, :-2] + a[:, 2:])
        jpar = (jnp.arange(1, a.shape[1] - 1) + base_par) % 2
        mid = jnp.where((jpar == target_par)[None, :], upd, a[:, 1:-1])
        return jnp.concatenate([a[:, :1], mid, a[:, -1:]], axis=1)

    def h_inverse97(rows):
        def ext4(a):
            left = a[:, 1:5][:, ::-1]
            right = a[:, -5:-1][:, ::-1]
            return jnp.concatenate([left, a, right], axis=1)
        a = ext4(rows)
        base_par = (x0 + 4) % 2   # abs parity of extended column 0
        for coef, tp in ((-DELTA, 0), (-GAMMA, 1), (-BETA, 0), (-ALPHA, 1)):
            a = lift_h(a, jnp.float32(coef), tp, base_par)
        return a[:, 4:-4]

    def lift_v(a, coef, target_par, base_par):
        upd = a[1:-1, :] + coef * (a[:-2, :] + a[2:, :])
        jpar = (jnp.arange(1, a.shape[0] - 1) + base_par) % 2
        mid = jnp.where((jpar == target_par)[:, None], upd, a[1:-1, :])
        return jnp.concatenate([a[:1, :], mid, a[-1:, :]], axis=0)

    def local(block):
        idx = jax.lax.axis_index(axis)
        hrows = h_inverse97(block) if irrev else h_inverse53(block)
        up = jax.lax.ppermute(hrows[-HALO:, :], axis,
                              [(i, (i + 1) % n) for i in range(n)])
        down = jax.lax.ppermute(hrows[:HALO, :], axis,
                                [(i, (i - 1) % n) for i in range(n)])
        top_ext = hrows[1:HALO + 1, :][::-1]
        bot_ext = hrows[-HALO - 1:-1, :][::-1]
        up = jnp.where(idx == 0, top_ext, up)
        down = jnp.where(idx == n - 1, bot_ext, down)
        ext = jnp.concatenate([up, hrows, down], axis=0)
        base = idx * rows_per_shard - HALO  # abs row of ext[0] (mod parity)
        if irrev:
            base_par = (base + y0) % 2
            a = ext
            for coef, tp in ((-DELTA, 0), (-GAMMA, 1),
                             (-BETA, 0), (-ALPHA, 1)):
                a = lift_v(a, jnp.float32(coef), tp, base_par)
            return a[HALO:-HALO, :]
        e = ext[1:-1, :] - ((ext[:-2, :] + ext[2:, :] + 2) >> 2)
        o = ext[2:-2, :] + ((e[:-2, :] + e[2:, :]) >> 1)
        jpar = (jnp.arange(ext.shape[0] - 2 * HALO) + base + HALO + y0) % 2
        return jnp.where(jpar[:, None] == 0, e[HALO - 1:-HALO + 1, :], o[HALO - 2:o.shape[0] - HALO + 2, :])

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return jax.jit(fn)


def make_fwd_2d_level_sharded(mesh, rows_per_shard: int, width: int,
                              x0: int, y0: int, irrev: bool):
    """One full FORWARD DWT level over a row-sharded (R, W) sample array,
    returning the interleaved transform (low at even abs coords).

    Order per Annex F (and dwt_np.fwd_2d_level): vertical lifting first
    (4-row ppermute halos, whole-sample symmetric global edges), then
    horizontal lifting local to each shard.  9/7 runs the analysis lifts
    in f32; the K-scalings are applied by the host wrapper after
    de-interleaving (lifting is linear homogeneous).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from grok_tpu.transform.dwt_np import ALPHA, BETA, DELTA, GAMMA

    n = mesh.devices.size
    axis = "tiles"
    W = width
    HALO = 4

    def lift_v(a, coef, target_par, base_par):
        upd = a[1:-1, :] + coef * (a[:-2, :] + a[2:, :])
        jpar = (jnp.arange(1, a.shape[0] - 1) + base_par) % 2
        mid = jnp.where((jpar == target_par)[:, None], upd, a[1:-1, :])
        return jnp.concatenate([a[:1, :], mid, a[-1:, :]], axis=0)

    def lift_h(a, coef, target_par, base_par):
        upd = a[:, 1:-1] + coef * (a[:, :-2] + a[:, 2:])
        jpar = (jnp.arange(1, a.shape[1] - 1) + base_par) % 2
        mid = jnp.where((jpar == target_par)[None, :], upd, a[:, 1:-1])
        return jnp.concatenate([a[:, :1], mid, a[:, -1:]], axis=1)

    def local(block):
        idx = jax.lax.axis_index(axis)
        up = jax.lax.ppermute(block[-HALO:, :], axis,
                              [(i, (i + 1) % n) for i in range(n)])
        down = jax.lax.ppermute(block[:HALO, :], axis,
                                [(i, (i - 1) % n) for i in range(n)])
        top_ext = block[1:HALO + 1, :][::-1]
        bot_ext = block[-HALO - 1:-1, :][::-1]
        up = jnp.where(idx == 0, top_ext, up)
        down = jnp.where(idx == n - 1, bot_ext, down)
        ext = jnp.concatenate([up, block, down], axis=0)
        base_par = (idx * rows_per_shard - HALO + y0) % 2

        if irrev:
            a = ext
            for coef, tp in ((ALPHA, 1), (BETA, 0), (GAMMA, 1), (DELTA, 0)):
                a = lift_v(a, jnp.float32(coef), tp, base_par)
            rows = a[HALO:-HALO, :]
            b = jnp.concatenate([rows[:, 1:5][:, ::-1], rows,
                                 rows[:, -5:-1][:, ::-1]], axis=1)
            hb_par = (x0 + 4) % 2
            for coef, tp in ((ALPHA, 1), (BETA, 0), (GAMMA, 1), (DELTA, 0)):
                b = lift_h(b, jnp.float32(coef), tp, hb_par)
            return b[:, 4:-4]

        # 5/3 vertical: h at odd abs rows (1-halo), l at even (2-halo)
        h = ext[1:-1, :] - ((ext[:-2, :] + ext[2:, :]) >> 1)
        l = ext[2:-2, :] + ((h[:-2, :] + h[2:, :] + 2) >> 2)
        outrows = ext.shape[0] - 2 * HALO
        jpar = (jnp.arange(outrows) + idx * rows_per_shard + y0) % 2
        rows = jnp.where(jpar[:, None] == 0,
                         l[HALO - 2:HALO - 2 + outrows, :],
                         h[HALO - 1:HALO - 1 + outrows, :])
        # horizontal, local: whole-sample symmetric extension by 2
        ya = jnp.concatenate([rows[:, 1:3][:, ::-1], rows,
                              rows[:, -3:-1][:, ::-1]], axis=1)
        hh_ = ya[:, 1:-1] - ((ya[:, :-2] + ya[:, 2:]) >> 1)
        ll_ = ya[:, 2:-2] + ((hh_[:, :-2] + hh_[:, 2:] + 2) >> 2)
        cpar = (jnp.arange(W) + x0) % 2
        return jnp.where(cpar[None, :] == 0, ll_, hh_[:, 1:-1])

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return jax.jit(fn)


def fwd_2d_level_sharded(cur, rect, irrev: bool, mesh):
    """Host wrapper for the sharded forward level: mirror-pad ragged rows,
    run, de-interleave into (ll, hl, lh, hh) with the 9/7 K-scalings
    applied.  Falls back to the host kernel for degenerate sizes."""
    import numpy as np

    from grok_tpu.transform import dwt_np

    n = mesh.devices.size
    R, W = rect.h, rect.w
    if R < 5 * n or W < 8:
        return dwt_np.fwd_2d_level(cur, rect, irrev)
    dt = np.float32 if irrev else np.int32
    arr = np.asarray(cur, dt)
    pad = (-R) % n
    if 0 < pad < 4:
        # the kernel applies its own symmetric extension at the PADDED
        # edge; mirror rows shallower than the lifting cone (4 taps for
        # 9/7) would make it reflect about the wrong row — deepen the
        # pad by whole shards so the cone never reaches real rows
        pad += n * (-(-(4 - pad) // n))
    if pad:
        if pad + 4 > R - 1:
            return dwt_np.fwd_2d_level(cur, rect, irrev)
        arr = np.concatenate([arr, arr[R - 2:R - 2 - pad:-1, :]], axis=0)
    fn = make_fwd_2d_level_sharded(mesh, arr.shape[0] // n, W,
                                   rect.x0, rect.y0, irrev)
    inter = np.asarray(fn(shard_tile_batch(arr, mesh)))[:R]
    ye, xe = rect.y0 % 2, rect.x0 % 2
    ll = inter[ye::2, xe::2]
    hl = inter[ye::2, xe ^ 1::2]
    lh = inter[ye ^ 1::2, xe::2]
    hh = inter[ye ^ 1::2, xe ^ 1::2]
    if irrev:
        from grok_tpu.transform.dwt_np import K
        ll = ll.astype(np.float64) * (1.0 / (K * K))
        hl = hl.astype(np.float64) * 0.5
        lh = lh.astype(np.float64) * 0.5
        hh = hh.astype(np.float64) * (K * K / 4.0)
    else:
        ll, hl, lh, hh = (b.astype(np.int64) for b in (ll, hl, lh, hh))
    return ll, hl, lh, hh


def pcrd_slope_bounds_sharded(hulls, mesh):
    """The PCRD rate-allocation collective: every chip contributes its
    blocks' convex-hull R-D slopes; a sharded min/max reduction (psum-
    family collective under jit) yields the global bisection bracket fed
    to the one lambda shared by all shards (north star's 'global R-D
    slope exchange').  Returns (smin, smax) identical to the host values
    in t2/rate.allocate_layers."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    all_slopes = np.concatenate([h.slopes for h in hulls if len(h.slopes)]) \
        if any(len(h.slopes) for h in hulls) else np.array([1.0])
    n = mesh.devices.size
    pad = (-len(all_slopes)) % n
    if pad:
        all_slopes = np.concatenate(
            [all_slopes, np.full(pad, all_slopes[0])])
    with jax.enable_x64(True):            # exact f64: the bracket must
        sl = jax.device_put(all_slopes,   # equal the host's bit-for-bit
                            NamedSharding(mesh, P("tiles")))

        @jax.jit
        def bounds(s):
            return jnp.min(s), jnp.max(s)   # cross-shard reductions

        mn, mx = bounds(sl)
        mn, mx = float(mn), float(mx)
    return mn * 0.5, mx * 2.0 + 1.0


def inv_2d_level_sharded(ll, hl, lh, hh, rect, irrev: bool, mesh):
    """Host wrapper: interleave subbands (parity-aware), mirror-pad rows
    to a mesh multiple, run the sharded level, trim.  Returns an ndarray
    (int32 for 5/3, float32 for 9/7).  Falls back to the host kernel for
    degenerate sizes (fewer than ~2 rows per shard or width < 8)."""
    import numpy as np

    from grok_tpu.transform import dwt_np

    n = mesh.devices.size
    R, W = rect.h, rect.w
    if R < 5 * n or W < 8:
        return dwt_np.inv_2d_level(ll, hl, lh, hh, rect, irrev)
    dt = np.float32 if irrev else np.int32
    inter = np.empty((R, W), dt)
    ye, xe = rect.y0 % 2, rect.x0 % 2
    if irrev:
        # both axes' inverse scalings pre-applied (lifting is linear
        # homogeneous, so per-row/per-column factors commute with it)
        from grok_tpu.transform.dwt_np import K
        ll = np.asarray(ll, np.float64) * (K * K)
        hl = np.asarray(hl, np.float64) * 2.0
        lh = np.asarray(lh, np.float64) * 2.0
        hh = np.asarray(hh, np.float64) * (4.0 / (K * K))
    # low samples sit at even abs coords: array row r = abs row y0 + r
    inter[ye::2, xe::2] = ll
    inter[ye::2, xe ^ 1::2] = hl
    inter[ye ^ 1::2, xe::2] = lh
    inter[ye ^ 1::2, xe ^ 1::2] = hh
    pad = (-R) % n
    if 0 < pad < 4:
        # see fwd_2d_level_sharded: the mirror depth must cover the
        # lifting cone or the kernel's edge extension reflects about the
        # padded end instead of the true last row
        pad += n * (-(-(4 - pad) // n))
    if pad:
        if pad + 4 > R - 1:
            return dwt_np.inv_2d_level(ll, hl, lh, hh, rect, irrev)
        # whole-sample symmetric mirror rows keep the lifting cone exact
        # for all real rows; padded outputs are trimmed
        mirror = inter[R - 2:R - 2 - pad:-1, :]
        inter = np.concatenate([inter, mirror], axis=0)
    rows_per_shard = inter.shape[0] // n
    fn = make_inv_2d_level_sharded(mesh, rows_per_shard, W,
                                   rect.x0, rect.y0, irrev)
    out = np.asarray(fn(shard_tile_batch(inter, mesh)))
    return out[:R]


def decode_tile_sharded(blocks: list[dict], band_meta: dict, mesh,
                        tc_rect, num_resolutions: int):
    """Giant-tile decode across the mesh: T1 block batch sharded over
    chips, then the (expensive) finest inverse-DWT levels row-sharded
    with ppermute halos; coarse levels run on host (negligible work).

    blocks: pipeline job dicts (single-component tile, 5/3, pow2 dims,
    uniform code-block size W=H).  band_meta: {(res, orient): rect}.
    Returns the reconstructed (h, w) int64 array, bit-exact vs the
    host pipeline.
    """
    import numpy as np

    from grok_tpu.transform import dwt_np

    W = max(b["w"] for b in blocks)
    H = max(b["h"] for b in blocks)
    res = decode_blocks_sharded(blocks, mesh, W, H)

    # dequant (reversible: mag2 >> 1, sign) + band placement on host
    bands_arr = {}
    for (r, o), rect in band_meta.items():
        bands_arr[(r, o)] = np.zeros((rect.h, rect.w), np.int64)
    for b, (mag2, neg) in zip(blocks, res):
        rect = band_meta[(b["res"], b["orient"])]
        v = np.where(neg, -(mag2 >> 1), mag2 >> 1)
        bands_arr[(b["res"], b["orient"])][
            b["by"]:b["by"] + b["h"], b["bx"]:b["bx"] + b["w"]] = v

    nl = num_resolutions - 1
    cur = bands_arr[(0, 0)]
    n = mesh.devices.size
    for r in range(1, num_resolutions):
        rect = tc_rect.ceil_scale(1 << (nl - r), 1 << (nl - r))
        hl, lh, hh = (bands_arr[(r, o)] for o in (1, 2, 3))
        if rect.h % (2 * n) == 0 and rect.h >= 4 * n and rect.w >= 4:
            # interleave subbands into canvas layout, shard by rows
            inter = np.empty((rect.h, rect.w), np.int64)
            inter[0::2, 0::2] = cur
            inter[0::2, 1::2] = hl
            inter[1::2, 0::2] = lh
            inter[1::2, 1::2] = hh
            fn = make_inv53_2d_sharded(mesh, rect.h // n, rect.w)
            sharded = shard_tile_batch(inter.astype(np.int32), mesh)
            cur = np.asarray(fn(sharded)).astype(np.int64)
        else:
            cur = dwt_np.inv_2d_level(cur, hl, lh, hh, rect, False)
    return cur
