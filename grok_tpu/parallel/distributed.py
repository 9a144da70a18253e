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
