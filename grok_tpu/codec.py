"""Object-lifecycle codec API: the grk_decompress_init / read_header /
set_window / decompress / decompress_tile flow (upstream surface verified
in SURVEY.md §1.1), with a decoded-tile cache for multi-call access
[grok: src/lib/core/cache/TileCache] and memory-mapped file sources
[grok: util/ MemStream / mapped-file helpers]: opening by path maps the
file instead of reading it, so TLM-seeded tile access touches only the
pages of the requested tile-parts.
"""

from __future__ import annotations

import mmap
import os
from dataclasses import replace

import numpy as np

from grok_tpu.api import HeaderInfo
from grok_tpu.codestream import j2k
from grok_tpu.core.image import Component, Image
from grok_tpu.core.params import DecompressParams
from grok_tpu.pipeline import tile as tile_pipe


class Decompressor:
    """Incremental decoder over one codestream.

    Usage:
        dec = Decompressor(data, DecompressParams(backend="native"))
        info = dec.header            # cheap: no pixel work
        arr  = dec.decompress_tile(3)        # one tile, cached
        img  = dec.decompress()              # everything (one-shot path)
    """

    def __init__(self, data, params: DecompressParams | None = None,
                 cache_tiles: int = 16):
        """data: a bytes-like codestream/JP2, or a filesystem path (the
        file is memory-mapped, not read).

        cache_tiles: decoded-tile LRU capacity — bounds peak memory for
        gigapixel streaming (BASELINE configs[3]); 0 disables caching,
        None is unbounded (the pre-round-4 behavior)."""
        self.cache_tiles = cache_tiles
        self.params = params or DecompressParams()
        if self.params.strict is None:
            self.params = replace(self.params, strict=True)
        self._mm = self._fh = None
        if isinstance(data, (str, os.PathLike)):
            self._fh = open(data, "rb")
            self._mm = mmap.mmap(self._fh.fileno(), 0,
                                 access=mmap.ACCESS_READ)
            data = self._mm
        self._data = data              # original (JP2 boxes included)
        from grok_tpu.api import _header_info_from, _locate_codestream_span
        s, e, self._meta = _locate_codestream_span(
            data, permissive=not self.params.strict)
        self._cs_off = s               # codestream offset in the mapping
        if s == 0 and e == len(data):
            self._cs = data            # raw .j2k: the source itself
        elif isinstance(data, (bytes, bytearray)):
            self._cs = data[s:e]
        else:
            # mapped JP2: keep the jp2c box a zero-copy view (gigapixel
            # streams must not materialize the codestream)
            self._cs = memoryview(data)[s:e]
        self._hdr = j2k.read_main_header(self._cs)
        self._parts = j2k.read_tile_parts(self._cs, self._hdr,
                                          strict=self.params.strict)
        self._by_tile: dict[int, list] = {}
        for p in self._parts:
            self._by_tile.setdefault(p.tile_index, []).append(p)
        self._cache: dict[tuple, list[np.ndarray]] = {}
        self.header: HeaderInfo = _header_info_from(self._hdr, self._meta)

    @property
    def num_tiles(self) -> int:
        return self._hdr.siz.num_tiles

    def set_window(self, x0: int, y0: int, x1: int, y1: int):
        """Region-of-interest decode window (canvas coordinates)."""
        self.params.window = (x0, y0, x1, y1)
        return self

    def _cache_key(self, t: int) -> tuple:
        return (t, self.params.reduce, self.params.max_layers,
                self.params.window)

    def decompress_tile(self, t: int) -> list[np.ndarray]:
        """Decode one tile (LRU-cached); returns per-component arrays."""
        key = self._cache_key(t)
        if key in self._cache:
            # refresh LRU recency
            self._cache[key] = self._cache.pop(key)
            return self._cache[key]
        if t not in self._by_tile:
            raise j2k.CodestreamError(f"tile {t} not present")
        th = j2k.TileHeader()
        chunks = []
        for p in sorted(self._by_tile[t], key=lambda p: p.part_index):
            j2k.read_tile_part_header(self._cs, p, self._hdr, th)
            chunks.append(self._cs[p.data_start:p.data_end])
        geo = tile_pipe.TileGeometry.build(self._hdr, t, th)
        out = tile_pipe.decode_tile(b"".join(chunks), geo, self._hdr, th,
                                    self.params)
        if self._mm is not None and hasattr(self._mm, "madvise"):
            # gigapixel streaming over mmap: drop the tile's now-consumed
            # pages so resident set stays bounded by the LRU cache, not
            # by the codestream size (pages are clean; re-faulted on a
            # future random access).  Raw .j2k maps at offset 0; a JP2's
            # jp2c box is a zero-copy view at self._cs_off into the map.
            pg = mmap.PAGESIZE
            for p in self._by_tile[t]:
                lo = (self._cs_off + p.data_start) // pg * pg
                hi = self._cs_off + p.data_end
                ln = min((hi - lo + pg - 1) // pg * pg,
                         len(self._mm) - lo)
                self._mm.madvise(mmap.MADV_DONTNEED, lo, ln)
        if self.cache_tiles is None or self.cache_tiles > 0:
            while self.cache_tiles is not None \
                    and len(self._cache) >= self.cache_tiles:
                self._cache.pop(next(iter(self._cache)))
            self._cache[key] = out
        return out

    def decompress(self) -> Image:
        """Decode all (window-intersecting) tiles into a full Image.

        Delegates to the one-shot path with the ORIGINAL input so JP2
        color metadata (palette/cdef/ICC/color space) is applied; the
        per-tile cache serves decompress_tile callers."""
        from grok_tpu.api import decompress as _full

        return _full(self._data, self.params)

    def cache_info(self) -> dict:
        return {"tiles_cached": len(self._cache)}

    def close(self):
        """Release the mapped file (no-op for bytes sources)."""
        if isinstance(getattr(self, "_cs", None), memoryview):
            self._cs.release()     # else mmap.close() raises BufferError
            self._cs = b""
        if self._mm is not None:
            self._mm.close()
            self._mm = None
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Compressor:
    """Streaming tile-incremental encoder: the opj_write_tile /
    opj_end_compress surface (SURVEY.md §1.1) — gigapixel encodes feed
    one tile at a time under constant memory.

    Usage:
        enc = Compressor("out.j2k", width=W, height=H, numcomps=1,
                         params=CompressParams(...))
        for t in range(enc.num_tiles):
            enc.write_tile(t, tile_array)      # any order; resumable
        enc.finish()

    The main header goes out immediately (with a zeroed TLM slot when
    params.write_tlm, patched in finish()); each write_tile appends one
    complete tile-part and updates a sidecar resume manifest
    (<path>.manifest.json), so a crashed batch encode restarts exactly
    where it stopped (resume=True).  PPM/PLM and multi-tile-part
    splitting are whole-stream features and are rejected here.

    Reference parity: [grok: opj_write_tile / grk_compress streaming
    surface] per SURVEY.md §1.1 and §5 checkpoint/resume.
    """

    def __init__(self, path, *, width: int, height: int, numcomps: int = 1,
                 prec: int = 8, sgnd: bool = False, x0: int = 0, y0: int = 0,
                 subsampling=None, params=None, resume: bool = False):
        import hashlib
        import json
        import struct

        from grok_tpu.api import (_build_main_header, _main_header_bytes,
                                  CompressParams)
        from grok_tpu.transform.mct_np import mct_component_norms

        self.params = params or CompressParams()
        if self.params.write_ppm or self.params.write_plm:
            raise ValueError("PPM/PLM need the whole stream: use compress()")
        from grok_tpu.core.params import MCTMode
        if self.params.mct == MCTMode.AUTO_RD:
            raise ValueError(
                "MCTMode.AUTO_RD compares whole encodes; the streaming "
                "Compressor writes its main header before the first "
                "tile — pick RCT_OR_ICT or NONE explicitly (or use "
                "compress())")
        if self.params.max_tile_parts != 1:
            raise ValueError("streaming encode emits one tile-part per tile")
        if self.params.roi_rect is not None or self.params.fixed_quality:
            raise ValueError("ROI rect / fixed-quality targets are "
                             "whole-stream features: use compress()")
        if self.params.jp2:
            raise ValueError("JP2 boxes need the stream length: wrap the "
                             "finished file with jp2.wrap_jp2")
        sub = subsampling or [(1, 1)] * numcomps
        comps = [Component(data=np.zeros((0, 0), np.int32), dx=dx, dy=dy,
                           prec=prec, sgnd=sgnd) for (dx, dy) in sub]
        shell = Image(components=comps, x0=x0, y0=y0,
                      x1=x0 + width, y1=y0 + height)
        self._hdr = _build_main_header(shell, self.params)
        siz = self._hdr.siz
        self.num_tiles = siz.num_tiles
        self._raw_bytes = sum((siz.xsiz - siz.xosiz) * (siz.ysiz - siz.yosiz)
                              * c.prec / 8.0 / (c.dx * c.dy)
                              for c in self._hdr.comps)
        self._total_pixels = (siz.xsiz - siz.xosiz) * (siz.ysiz - siz.yosiz)
        self._mct_norms = None
        if self._hdr.cod.mct:
            self._mct_norms = mct_component_norms(self.params.irreversible)

        tlm = [(t, 0) for t in range(self.num_tiles)] \
            if self.params.write_tlm else None
        mh = _main_header_bytes(self._hdr, self.params, tlm)
        self._header_overhead = len(mh) + self.num_tiles * 14 + 2
        # locate the zeroed TLM slot by its full segment bytes (marker
        # matching alone could false-hit inside another payload)
        self._tlm_off = mh.find(j2k.write_tlm(tlm)) if tlm is not None \
            else -1
        self._path = os.fspath(path)
        self._manifest_path = self._path + ".manifest.json"
        self._hdr_hash = hashlib.sha256(mh).hexdigest()
        self._done: dict[int, int] = {}
        self._pos = len(mh)
        self._finished = False

        if resume and os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                m = json.load(f)
            if m.get("hdr") != self._hdr_hash:
                raise ValueError("resume manifest does not match header")
            self._done = {int(k): v for k, v in m["tiles"].items()}
            self._pos = m["pos"]
            self._fh = open(self._path, "r+b")
            self._fh.truncate(self._pos)     # drop any torn tail
            self._fh.seek(self._pos)
        else:
            self._fh = open(self._path, "w+b")
            self._fh.write(mh)
            self._save_manifest()

    def _save_manifest(self):
        import json
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"hdr": self._hdr_hash, "pos": self._pos,
                       "tiles": self._done}, f)
        os.replace(tmp, self._manifest_path)

    def tile_written(self, t: int) -> bool:
        return t in self._done

    def write_tile(self, t: int, data) -> None:
        """Encode and append tile t.  data: one (h, w[, numcomps]) array
        covering the tile's canvas region, or a per-component list of
        (comp_h, comp_w) arrays for subsampled layouts."""
        import struct

        if self._finished:
            raise ValueError("finish() already called")
        if not (0 <= t < self.num_tiles):
            raise ValueError(f"tile {t} out of range")
        if t in self._done:
            return                           # resumed: already on disk
        geo = tile_pipe.TileGeometry.build(self._hdr, t)
        if isinstance(data, np.ndarray):
            if data.ndim == 2:
                arrays = [data]
            else:
                arrays = [data[:, :, c] for c in range(data.shape[2])]
        else:
            arrays = list(data)
        if len(arrays) != len(self._hdr.comps):
            raise ValueError(f"expected {len(self._hdr.comps)} components")
        comps = []
        for c, arr in enumerate(arrays):
            cr = geo.comp_rects[c]
            arr = np.asarray(arr)
            if arr.shape[0] < cr.h or arr.shape[1] < cr.w:
                raise ValueError(
                    f"tile {t} comp {c}: need {cr.h}x{cr.w} samples, "
                    f"got {arr.shape[0]}x{arr.shape[1]}")
            ci = self._hdr.comps[c]
            comps.append(Component(data=arr[:cr.h, :cr.w], dx=ci.dx,
                                   dy=ci.dy, prec=ci.prec, sgnd=ci.sgnd))
        timg = Image(components=comps, x0=geo.rect.x0, y0=geo.rect.y0,
                     x1=geo.rect.x1, y1=geo.rect.y1)

        frac = (geo.rect.w * geo.rect.h) / max(self._total_pixels, 1)
        targets: list = []
        for l in range(self.params.num_layers):
            if self.params.rates and self.params.rates[l] > 1:
                budget = self._raw_bytes / self.params.rates[l] - \
                    self._header_overhead
                targets.append(max(budget, 100.0) * frac)
            else:
                targets.append(None)
        res = None
        if self.params.backend == "jax":
            # fused device encode (serving path); same-shaped tiles of
            # the grid share one compiled program
            from grok_tpu.pipeline.serve_enc import try_encode_serving
            res = try_encode_serving(timg, self._hdr, t, self.params,
                                     self._hdr.pocs)
        if res is None:
            res = tile_pipe.encode_tile(timg, geo, targets,
                                        self._mct_norms,
                                        backend=self.params.backend,
                                        pocs=self._hdr.pocs,
                                        mesh=self.params.mesh,
                                        ht_planes=self.params.ht_planes,
                                        ht_mixed=self.params.ht_mixed)
        plt_seg = j2k.write_plt(res.packet_lens) if self.params.write_plt \
            else b""
        plt_seg = res.com + plt_seg
        psot = 12 + len(plt_seg) + 2 + len(res.body)
        tp = j2k.write_sot(t, psot, 0, 1) + plt_seg + \
            struct.pack(">H", j2k.SOD) + res.body
        self._fh.seek(self._pos)
        self._fh.write(tp)
        self._fh.flush()
        self._pos += len(tp)
        self._done[t] = len(tp)
        self._save_manifest()

    def finish(self) -> None:
        """Append EOC, patch the TLM slot, drop the resume manifest."""
        import struct

        missing = [t for t in range(self.num_tiles) if t not in self._done]
        if missing:
            raise ValueError(f"tiles not written: {missing[:8]}"
                             f"{'...' if len(missing) > 8 else ''}")
        self._fh.seek(self._pos)
        self._fh.write(struct.pack(">H", j2k.EOC))
        if self._tlm_off >= 0:
            entries = [(t, self._done[t]) for t in range(self.num_tiles)]
            self._fh.seek(self._tlm_off)
            self._fh.write(j2k.write_tlm(entries))
        self._fh.flush()
        self._fh.close()
        if os.path.exists(self._manifest_path):
            os.remove(self._manifest_path)
        self._finished = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if not self._finished and not self._fh.closed:
            # keep the manifest: the encode is resumable
            self._fh.close()
