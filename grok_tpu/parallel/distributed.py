"""Multi-host scaffolding (SURVEY.md §7 phase 6): jax.distributed init,
host-0 codestream byte gather, and a process-sharded tile encode.

Every entry point degenerates cleanly at one process, so the whole
surface runs in single-process CI; on a real multi-host pod slice the
same code paths activate `jax.distributed.initialize` and the
`process_allgather` collectives (which ride DCN/ICI as XLA chooses).

Reference parity: the pod-scale analog of the reference's multi-threaded
tile scheduler [grok: src/lib/core/tile/ thread dispatch]; there is no
upstream multi-host mode — this is the TPU-native extension the north
star names (BASELINE.json: "Scale across a multi-host TPU pod slice by
sharding tiles ... via ICI collectives").
"""

from __future__ import annotations

import os


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize the multi-process runtime; returns (pid, nprocs).

    With no arguments and no GROK_COORDINATOR env, this is a no-op
    single-process setup (pid 0 of 1) — the degenerate mode CI runs.
    """
    import jax

    coordinator = coordinator or os.environ.get("GROK_COORDINATOR")
    if coordinator is None:
        return 0, 1
    num_processes = num_processes or int(os.environ["GROK_NUM_PROCESSES"])
    process_id = process_id if process_id is not None \
        else int(os.environ["GROK_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def gather_bytes_to_host0(blob: bytes) -> list[bytes] | None:
    """Gather one variable-length byte blob per process onto every
    process (ordered by process id); callers use the result on process 0
    and ignore it elsewhere.  Single-process: returns [blob].

    Lengths are allgathered first, then the zero-padded payload — two
    collectives total, the classic variable-length gather."""
    import jax

    if jax.process_count() == 1:
        return [blob]
    import numpy as np
    from jax.experimental import multihost_utils

    n = np.frombuffer(bytes(blob), dtype=np.uint8)
    lens = multihost_utils.process_allgather(
        np.array([n.size], dtype=np.int64))
    maxlen = int(lens.max())
    pad = np.zeros(maxlen, dtype=np.uint8)
    pad[:n.size] = n
    # uint8 payloads gather as int32 words to stay off narrow-dtype paths
    alldata = multihost_utils.process_allgather(pad.astype(np.int32))
    out = []
    for i in range(jax.process_count()):
        ln = int(lens[i])
        out.append(alldata[i, :ln].astype(np.uint8).tobytes())
    return out


def compress_distributed(image_or_array, params=None) -> bytes | None:
    """Process-sharded encode: each process encodes tiles
    t % nprocs == pid, tile-part bytes gather to process 0, which
    assembles the final codestream (returns None on other processes).

    Single-process this equals api.compress byte-for-byte (tested);
    multi-host it is the manifest-driven shard dispatch of SURVEY §5.
    """
    import struct

    import numpy as np

    from grok_tpu.api import (CompressParams, _build_main_header,
                              _main_header_bytes)
    from grok_tpu.codestream import j2k
    from grok_tpu.core.image import Image
    from grok_tpu.pipeline import tile as tile_pipe
    from grok_tpu.transform.mct_np import mct_component_norms
    import jax

    params = params or CompressParams()
    if params.jp2 or params.write_ppm or params.write_plm:
        raise ValueError("distributed encode: raw J2K with inline "
                         "headers only")
    if (params.roi_rect is not None or params.fixed_quality
            or params.max_tile_parts != 1):
        raise ValueError("distributed encode: ROI rect, fixed-quality "
                         "targets and tile-part splitting are "
                         "whole-stream features: use compress()")
    image = (image_or_array if isinstance(image_or_array, Image)
             else Image.from_array(np.asarray(image_or_array)))
    hdr = _build_main_header(image, params)
    siz = hdr.siz
    pid, nprocs = jax.process_index(), jax.process_count()

    raw_bytes = sum((siz.xsiz - siz.xosiz) * (siz.ysiz - siz.yosiz)
                    * c.prec / 8.0 / (c.dx * c.dy) for c in hdr.comps)
    total_pixels = (siz.xsiz - siz.xosiz) * (siz.ysiz - siz.yosiz)
    mct_norms = mct_component_norms(params.irreversible) \
        if hdr.cod.mct else None
    mh_probe = _main_header_bytes(hdr, params, None)
    header_overhead = len(mh_probe) + siz.num_tiles * 14 + 2

    local = bytearray()   # concatenated (t, len, bytes) records
    for t in range(siz.num_tiles):
        if t % nprocs != pid:
            continue
        geo = tile_pipe.TileGeometry.build(hdr, t)
        frac = (geo.rect.w * geo.rect.h) / max(total_pixels, 1)
        targets: list = []
        for l in range(params.num_layers):
            if params.rates and params.rates[l] > 1:
                budget = raw_bytes / params.rates[l] - header_overhead
                targets.append(max(budget, 100.0) * frac)
            else:
                targets.append(None)
        res = tile_pipe.encode_tile(image, geo, targets, mct_norms,
                                    backend=params.backend,
                                    pocs=hdr.pocs, mesh=params.mesh)
        plt_seg = j2k.write_plt(res.packet_lens) if params.write_plt \
            else b""
        psot = 12 + len(plt_seg) + 2 + len(res.body)
        tp = j2k.write_sot(t, psot, 0, 1) + plt_seg + \
            struct.pack(">H", j2k.SOD) + res.body
        local += struct.pack(">II", t, len(tp)) + tp

    gathered = gather_bytes_to_host0(bytes(local))
    if pid != 0:
        return None
    # reassemble in tile order from the per-process shards
    parts: dict[int, bytes] = {}
    for blob in gathered:
        pos = 0
        while pos < len(blob):
            t, ln = struct.unpack_from(">II", blob, pos)
            pos += 8
            parts[t] = blob[pos:pos + ln]
            pos += ln
    missing = [t for t in range(siz.num_tiles) if t not in parts]
    if missing:
        raise RuntimeError(f"distributed encode lost tiles {missing[:8]}")
    tiles_out = [parts[t] for t in range(siz.num_tiles)]
    tlm = [(t, len(parts[t])) for t in range(siz.num_tiles)] \
        if params.write_tlm else None
    mh = _main_header_bytes(hdr, params, tlm)
    return mh + b"".join(tiles_out) + struct.pack(">H", j2k.EOC)


def decompress_distributed(data: bytes, dparams=None):
    """Process-sharded tile DECODE: each process decodes tiles
    t % nprocs == pid; the decoded component planes gather to process 0,
    which assembles and postprocesses the full Image (returns None on
    other processes).  The decode mirror of compress_distributed — the
    reference's headline direction (BASELINE.json north_star) sharded
    over processes.

    Single-process this equals api.decompress bit-for-bit (tested).
    Scope: reduce / max_layers / strict / window supported (round 5);
    tile_index and component subsets are single-stream features — use
    decompress().

    Device composition (round 5, SURVEY §7 phase 6): with
    backend="jax" each process first offers its tile shard to the
    cached SERVING pipeline (pipeline.serve.try_decode_serving — the
    Pallas kernel path), falling back to the general tile decode per
    tile; strict defaults to PERMISSIVE for backend="jax" (the
    decompress_device contract — serving validates framing via the C
    scan, not per-pass payloads).
    """
    import struct
    from dataclasses import replace

    import jax
    import numpy as np

    from grok_tpu.api import DecompressParams, _locate_codestream
    from grok_tpu.codestream import j2k
    from grok_tpu.codestream.j2k import TileHeader
    from grok_tpu.pipeline import tile as tile_pipe

    dp = dparams or DecompressParams()
    if dp.tile_index is not None or dp.components is not None:
        raise ValueError("distributed decode: tile/component "
                         "subsets are single-stream features: use "
                         "decompress()")
    if dp.strict is None:
        dp = replace(dp, strict=dp.backend != "jax")
    pid, nprocs = jax.process_index(), jax.process_count()

    cs, meta = _locate_codestream(data, permissive=not dp.strict)
    hdr = j2k.read_main_header(cs)
    parts = j2k.read_tile_parts(cs, hdr, strict=dp.strict)
    by_tile: dict[int, list] = {}
    for p in parts:
        by_tile.setdefault(p.tile_index, []).append(p)

    tiles = sorted(by_tile)
    if dp.window is not None:
        from grok_tpu.core.geometry import Rect
        win = Rect(*dp.window)
        tiles = [t for t in tiles
                 if not hdr.siz.tile_rect(t).intersect(win).empty]

    use_serving = dp.backend == "jax" and not dp.strict \
        and dp.mesh is None and hdr.ppm is None

    # local shard: decode owned tiles, serialize (t, per-comp planes)
    local = bytearray()
    for t in tiles:
        if t % nprocs != pid:
            continue
        th = TileHeader()
        chunks = []
        for p in sorted(by_tile[t], key=lambda p: p.part_index):
            j2k.read_tile_part_header(cs, p, hdr, th)
            chunks.append(cs[p.data_start:p.data_end])
        body = b"".join(chunks)
        comp_arrays = None
        if use_serving:
            from grok_tpu.pipeline.serve import try_decode_serving
            served = try_decode_serving(cs, hdr, t, th, body, dp)
            if served is not None:
                comp_arrays = [np.asarray(a) for a in served]
        if comp_arrays is None:
            geo = tile_pipe.TileGeometry.build(hdr, t, th)
            comp_arrays = tile_pipe.decode_tile(body, geo, hdr, th, dp)
        rec = bytearray(struct.pack(">I", t))
        for c in range(hdr.numcomps):
            arr = np.ascontiguousarray(comp_arrays[c], np.int32)
            rec += struct.pack(">II", arr.shape[0], arr.shape[1])
            rec += arr.tobytes()
        local += struct.pack(">I", len(rec)) + rec

    gathered = gather_bytes_to_host0(bytes(local))
    if pid != 0:
        return None

    # host 0: scatter the gathered planes into the full-image arrays and
    # finish exactly like api.decompress (origins, DC grid, postproc)
    g = hdr.siz.normalized()
    scale = 1 << dp.reduce if dp.reduce else 1
    out_arrays: list[np.ndarray] = []
    origins: list[tuple[int, int]] = []
    for c, ci in enumerate(hdr.comps):
        x0 = -(-g.xosiz // ci.dx)
        y0 = -(-g.yosiz // ci.dy)
        x1 = -(-g.xsiz // ci.dx)
        y1 = -(-g.ysiz // ci.dy)
        rx0, ry0 = -(-x0 // scale), -(-y0 // scale)
        rx1, ry1 = -(-x1 // scale), -(-y1 // scale)
        out_arrays.append(np.zeros((ry1 - ry0, rx1 - rx0), np.int32))
        origins.append((rx0, ry0))

    seen = set()
    for blob in gathered:
        pos = 0
        while pos < len(blob):
            (ln,) = struct.unpack_from(">I", blob, pos)
            pos += 4
            rec = blob[pos:pos + ln]
            pos += ln
            (t,) = struct.unpack_from(">I", rec, 0)
            seen.add(t)
            rpos = 4
            geo = tile_pipe.TileGeometry.build(hdr, t)
            for c in range(hdr.numcomps):
                h, w = struct.unpack_from(">II", rec, rpos)
                rpos += 8
                arr = np.frombuffer(rec, np.int32, count=h * w,
                                    offset=rpos).reshape(h, w)
                rpos += 4 * h * w
                nl = geo.styles[c].num_resolutions - 1
                eff = min(dp.reduce, nl) if dp.reduce else 0
                rect = geo.comp_rects[c].ceil_scale(1 << eff, 1 << eff)
                ox, oy = origins[c]
                out_arrays[c][rect.y0 - oy:rect.y1 - oy,
                              rect.x0 - ox:rect.x1 - ox] = \
                    arr[:rect.h, :rect.w]
    missing = [t for t in tiles if t not in seen]
    if missing:
        raise RuntimeError(f"distributed decode lost tiles {missing[:8]}")

    from grok_tpu.core.image import ColorSpace, Component, Image
    img_x0, img_y0 = -(-g.xosiz // scale), -(-g.yosiz // scale)
    img_x1, img_y1 = -(-g.xsiz // scale), -(-g.ysiz // scale)
    if dp.window is not None:
        # the api.decompress window crop, verbatim (bit-exact parity)
        wx0, wy0, wx1, wy1 = dp.window
        img_x0 = max(img_x0, wx0 // scale)
        img_y0 = max(img_y0, wy0 // scale)
        img_x1 = min(img_x1, -(-wx1 // scale))
        img_y1 = min(img_y1, -(-wy1 // scale))
    comps = []
    for c, ci in enumerate(hdr.comps):
        arr = out_arrays[c]
        if dp.window is not None:
            ox, oy = origins[c]
            cx0 = -(-img_x0 // ci.dx)
            cy0 = -(-img_y0 // ci.dy)
            cx1 = -(-img_x1 // ci.dx)
            cy1 = -(-img_y1 // ci.dy)
            arr = arr[cy0 - oy:cy1 - oy, cx0 - ox:cx1 - ox]
        comps.append(Component(data=arr, dx=ci.dx * scale,
                               dy=ci.dy * scale, prec=ci.prec,
                               sgnd=ci.sgnd))
    color = meta.color_space if meta is not None else (
        ColorSpace.GRAY if len(comps) == 1 else ColorSpace.SRGB)
    img = Image(components=comps, x0=img_x0, y0=img_y0,
                x1=img_x1, y1=img_y1, color_space=color)
    if meta is not None:
        img.icc_profile = meta.icc_profile
        img.capture_resolution = meta.capture_resolution
    from grok_tpu.pipeline.postproc import postprocess
    return postprocess(img, meta, dp)
