"""Tile pipeline: per-tile encode/decode orchestration (scalar host path).

Encode: DC shift -> MCT -> forward DWT -> quantize -> T1 block coding ->
PCRD layer allocation -> T2 packet assembly.
Decode: T2 packet parse -> T1 block decode -> dequantize -> inverse DWT ->
inverse MCT -> DC unshift/clip.

This is the behavioral reference; the device (JAX/Pallas) pipeline in
grok_tpu/ops replaces the transform/T1 stages with batched kernels but goes
through the same T2/codestream host stages.

Reference parity: [grok: src/lib/core/tile/TileProcessor.cpp ::
compressTile/decompressTile] — behavior normative per ISO 15444-1.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from grok_tpu.codestream.bitio import BitReader
from grok_tpu.codestream.j2k import (CodingStyle, CodingStyleComp, MainHeader,
                                     QuantStyle, TileHeader)
from grok_tpu.core.geometry import (BAND_LL, Rect, SizGrid, TileCompGeom,
                                    build_tilecomp_geometry)
from grok_tpu.core.image import Image
from grok_tpu.core.params import CBLK_HT, DecompressParams
from grok_tpu.core.quant import (QSTYLE_NONE, Quantizer, band_level,
                                 band_norm, dequantize_band,
                                 quantize_band, quantize_frac)
from grok_tpu.t1.t1_scalar import decode_block, encode_block
from grok_tpu.t2.packet import EPH_MARKER, SOP_MARKER, PrecinctCtx
from grok_tpu.t2.progression import iter_packets
from grok_tpu.t2.rate import Hull, allocate_layers, convex_hull
from grok_tpu import native as _native
from grok_tpu.transform import dwt_np, mct_np
from grok_tpu.util.msg import warn
from grok_tpu.util.trace import count, trace


def quantizer_from_style(q: QuantStyle, cs: CodingStyleComp,
                         prec: int) -> Quantizer:
    return Quantizer(style=q.style, guard_bits=q.guard_bits, steps=q.steps,
                     num_resolutions=cs.num_resolutions, prec=prec)


@dataclass
class TileGeometry:
    """Geometry + coding state shared by encode and decode for one tile."""

    t: int
    rect: Rect
    comp_rects: list[Rect]
    tcgs: list[TileCompGeom]
    styles: list[CodingStyleComp]
    quants: list[Quantizer]
    cod: CodingStyle
    subsampling: list[tuple[int, int]]
    rgn: dict = field(default_factory=dict)      # comp -> ROI Maxshift
    custom_mct: object = None                    # Part-2 matrix or None

    @staticmethod
    def build(hdr: MainHeader, t: int,
              tile_hdr: TileHeader | None = None) -> "TileGeometry":
        th = tile_hdr or TileHeader()
        rect = hdr.siz.tile_rect(t)
        cod = th.cod or hdr.cod
        rgn = dict(hdr.rgn)
        rgn.update(th.rgn)
        comp_rects, tcgs, styles, quants, subs = [], [], [], [], []
        for c, ci in enumerate(hdr.comps):
            cs = hdr.style_for(c, th.coc, th.cod)
            q = hdr.quant_for(c, th.qcc, th.qcd)
            cr = rect.ceil_scale(ci.dx, ci.dy)
            tcg = build_tilecomp_geometry(
                cr, cs.num_resolutions, cs.cblk_w_exp, cs.cblk_h_exp,
                cs.prec_exps)
            tcg.comp = c
            comp_rects.append(cr)
            tcgs.append(tcg)
            styles.append(cs)
            # RCT chroma expansion is absorbed by the guard bits (upstream
            # convention): Rb stays prec + gain.
            quants.append(quantizer_from_style(q, cs, ci.prec))
            subs.append((ci.dx, ci.dy))
        return TileGeometry(t=t, rect=rect, comp_rects=comp_rects, tcgs=tcgs,
                            styles=styles, quants=quants, cod=cod,
                            subsampling=subs, rgn=rgn,
                            custom_mct=hdr.custom_mct)

    def make_contexts(self, seg_style_mask: int = -1) \
            -> dict[tuple[int, int, int], PrecinctCtx]:
        """seg_style_mask: AND-mask on the T2 segmentation style.  HT
        MIXED streams pass ~CBLK_HT: their HT blocks are single-pass
        cleanup whose packet-header wire equals the default Part-1
        single-segment rule, so T2 parses/emits every block with MQ
        segmentation while the per-block COM bitmap routes T1."""
        ctxs: dict[tuple[int, int, int], PrecinctCtx] = {}
        for c, tcg in enumerate(self.tcgs):
            style = self.styles[c].cblk_style & seg_style_mask
            for rg in tcg.resolutions:
                for p in range(rg.num_precincts):
                    bands = [(bg.orient, bg.precincts[p]) for bg in rg.bands]
                    ctxs[(c, rg.r, p)] = PrecinctCtx(bands, style)
        return ctxs


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

@dataclass
class TileEncodeResult:
    packets: list[bytes]             # in progression order
    packet_lens: list[int]
    body: bytes                      # concatenated packets
    dist_total: float = 0.0
    headers: bytes = b""             # packed headers (PPM mode only)
    com: bytes = b""                 # tile-header COM segments (HT MIXED
                                     # per-block coder bitmap, round 4)


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "native" if _native.available() else "scalar"
    return backend


def _forward_transform(image: Image, geo: TileGeometry,
                       mesh=None) -> list[list]:
    """DC shift + MCT + DWT for all components; returns bands per comp.
    mesh: shard each forward level's rows across the mesh (halo
    exchange over ICI), bit-exact for 5/3."""
    samples = []
    for c, comp in enumerate(image.components):
        cr = geo.comp_rects[c]
        gx0 = -(-image.x0 // comp.dx)      # component grid origin
        gy0 = -(-image.y0 // comp.dy)
        sl = comp.data[cr.y0 - gy0:cr.y1 - gy0, cr.x0 - gx0:cr.x1 - gx0]
        samples.append(mct_np.dc_shift_fwd(sl, comp.prec, comp.sgnd))
    irrev = geo.styles[0].irreversible
    if geo.custom_mct is not None:
        samples = mct_np.custom_mct_fwd(samples, geo.custom_mct)
    elif geo.cod.mct and len(samples) >= 3:
        if irrev:
            s0, s1, s2 = mct_np.ict_fwd(samples[0], samples[1], samples[2])
        else:
            s0, s1, s2 = mct_np.rct_fwd(samples[0], samples[1], samples[2])
        samples[0], samples[1], samples[2] = s0, s1, s2
    out = []
    for c, s in enumerate(samples):
        irr = geo.styles[c].irreversible
        if irr:
            s = np.asarray(s, dtype=np.float64)
        if mesh is not None:
            from grok_tpu.parallel.sharding import fwd_2d_level_sharded
            numres = geo.styles[c].num_resolutions
            nl = numres - 1
            rect = geo.comp_rects[c]
            cur = s if irr else np.asarray(s, dtype=np.int64)
            bands: list = [None] * numres
            for r in range(nl, 0, -1):
                sc = 1 << (nl - r)
                rrect = rect.ceil_scale(sc, sc)
                ll, hl, lh, hh = fwd_2d_level_sharded(cur, rrect, irr, mesh)
                bands[r] = (hl, lh, hh)
                cur = ll
            bands[0] = cur
            out.append(bands)
            continue
        out.append(_fwd_multilevel_fast(
            s, geo.comp_rects[c], geo.styles[c].num_resolutions, irr))
    return out


def _fwd_multilevel_fast(samples, tc_rect: Rect, num_resolutions: int,
                         irreversible: bool) -> list:
    """fwd_multilevel with the C level kernels when available
    (bit-identical to dwt_np for both 5/3 int and 9/7 f64)."""
    if not _native.available():
        return dwt_np.fwd_multilevel(samples, tc_rect, num_resolutions,
                                     irreversible)
    nl = num_resolutions - 1
    if irreversible:
        cur = np.asarray(samples, dtype=np.float64)
        out: list = [None] * num_resolutions
        for r in range(nl, 0, -1):
            rect = tc_rect.ceil_scale(1 << (nl - r), 1 << (nl - r))
            ll, hl, lh, hh = _native.fwd97_level(cur, rect.x0, rect.y0)
            out[r] = (hl, lh, hh)
            cur = ll
        out[0] = cur
        return out
    cur = np.asarray(samples, dtype=np.int32)
    out: list = [None] * num_resolutions
    for r in range(nl, 0, -1):
        rect = tc_rect.ceil_scale(1 << (nl - r), 1 << (nl - r))
        ll, hl, lh, hh = _native.fwd53_level(cur, rect.x0, rect.y0)
        out[r] = (hl.astype(np.int64), lh.astype(np.int64),
                  hh.astype(np.int64))
        cur = ll
    out[0] = cur.astype(np.int64)
    return out


def _band_array(bands: list, r: int, orient: int) -> np.ndarray:
    if r == 0:
        return bands[0]
    hl, lh, hh = bands[r]
    return (hl, lh, hh)[orient - 1]


def band_window(sub: Rect, nl: int, r: int, orient: int,
                dilate: int = 4) -> Rect:
    """Map a tile-component-coordinate rect into band coordinates, dilated
    by the synthesis filter support (used for ROI masks and region-decode
    block selection; a conservative (larger) window is always safe)."""
    s = 1 << (nl - r)
    rr = Rect(sub.x0 // s - dilate, sub.y0 // s - dilate,
              -(-sub.x1 // s) + dilate, -(-sub.y1 // s) + dilate)
    if r == 0 or orient == BAND_LL:
        return rr
    from grok_tpu.core.geometry import map_interval_to_band
    xob = 1 if orient in (1, 3) else 0
    yob = 1 if orient in (2, 3) else 0
    x0, x1 = map_interval_to_band(rr.x0, rr.x1, xob)
    y0, y1 = map_interval_to_band(rr.y0, rr.y1, yob)
    return Rect(x0, y0, x1, y1)


def apply_roi_shift_decode(mag2: np.ndarray, shift: int) -> np.ndarray:
    """Maxshift restore (ISO 15444-1 G.1): magnitudes at or above 2^shift
    are ROI samples scaled up by the encoder; shift them back down.

    The threshold applies to the half-bit-scaled reconstruction (2q + h),
    matching the upstream decoder exactly; proper Maxshift encoding uses
    shift >= the background's magnitude bitplane count."""
    if shift <= 0:
        return mag2
    is_roi = mag2 >= (1 << shift)
    return np.where(is_roi, mag2 >> shift, mag2)


def canon_block_indices(geo: "TileGeometry") -> dict[tuple, int]:
    """Canonical flat index of every code-block in the tile: nested
    (component, resolution, band, precinct, cblk) enumeration over the
    FULL geometry — independent of reduce/window —, shared by the HT
    MIXED bitmap writer and reader (j2k.TileHeader.ht_mixed_bitmap).
    Key: (c, r, band_i, p, cblk_i)."""
    idx: dict[tuple, int] = {}
    n = 0
    for c, tcg in enumerate(geo.tcgs):
        for rg in tcg.resolutions:
            for band_i, bg in enumerate(rg.bands):
                for p in range(rg.num_precincts):
                    for cblk_i in range(len(bg.precincts[p].cblks)):
                        idx[(c, rg.r, band_i, p, cblk_i)] = n
                        n += 1
    return idx


def encode_tile(image: Image, geo: TileGeometry,
                layer_targets: list[float | None],
                mct_norms: np.ndarray | None = None,
                backend: str = "scalar",
                roi_rect: tuple | None = None,
                pocs: list | None = None,
                quality_targets: list | None = None,
                split_headers: bool = False,
                mesh=None, ht_planes: int = 0,
                ht_mixed: bool = False) -> TileEncodeResult:
    """Full encode of one tile; layer_targets are cumulative byte budgets
    per layer for this tile (None = all remaining passes).  backend="jax"
    runs default-style blocks through the batched device encoder.
    roi_rect: canvas-coordinate Maxshift ROI (geo.rgn holds the shifts).
    mesh: shard the forward DWT rows and the T1 encode batch across the
    mesh, with the PCRD slope bracket reduced collectively — the
    codestream is byte-identical to the host encoder (5/3 path)."""
    backend = _resolve_backend(backend)
    with trace("dwt_fwd"):
        all_bands = _forward_transform(image, geo, mesh=mesh)

    # collect per-block encode jobs
    _roi_warned: set[int] = set()
    ejobs: list[dict] = []
    for c, tcg in enumerate(geo.tcgs):
        quant = geo.quants[c]
        irrev = geo.styles[c].irreversible
        style = geo.styles[c].cblk_style
        wc = float(mct_norms[c]) if mct_norms is not None and \
            c < len(mct_norms) else 1.0
        for rg in tcg.resolutions:
            for band_i, bg in enumerate(rg.bands):
                orient = bg.orient
                delta = quant.delta(rg.r, orient)
                mb = quant.mb(rg.r, orient)
                lvl = band_level(geo.styles[c].num_resolutions, rg.r) \
                    if rg.r > 0 else geo.styles[c].num_resolutions - 1
                bnorm = band_norm(irrev, max(lvl, 0), orient) if lvl > 0 \
                    else 1.0
                w = (delta * bnorm * wc) ** 2
                arr = _band_array(all_bands[c], rg.r, orient)
                mag, neg = quantize_band(arr, delta, not irrev)
                # irreversible: sub-step residual feeds the PCRD
                # distortion model (true value = mag + frac); the
                # reversible path's integer model is already exact
                frac = quantize_frac(arr, mag, delta) if irrev else None
                roi_shift = geo.rgn.get(c, 0)
                if roi_shift > 0:
                    nl = geo.styles[c].num_resolutions - 1
                    if roi_rect is not None:
                        dx, dy = geo.subsampling[c]
                        sub = Rect(*roi_rect).intersect(geo.rect) \
                            .ceil_scale(dx, dy)
                        bw = band_window(sub, nl, rg.r, orient) \
                            .intersect(bg.rect)
                    else:
                        bw = bg.rect            # whole-component ROI
                    if not bw.empty:
                        sl = (slice(bw.y0 - bg.rect.y0, bw.y1 - bg.rect.y0),
                              slice(bw.x0 - bg.rect.x0, bw.x1 - bg.rect.x0))
                        bgmax = mag.max(initial=0)
                        if bgmax >> roi_shift and c not in _roi_warned:
                            # Maxshift requires s >= background bitplane
                            # count, else the decoder's threshold test
                            # cannot separate ROI from background
                            _roi_warned.add(c)
                            warn(f"RGN shift {roi_shift} < background "
                                 f"magnitude bits "
                                 f"({int(bgmax).bit_length()}); decode "
                                 "will be ambiguous (raise -R shift)")
                        mag = mag.copy()
                        mag[sl] = mag[sl] << roi_shift
                        if frac is not None:
                            frac = frac.copy()
                            frac[sl] = frac[sl] * (1 << roi_shift)
                for p in range(rg.num_precincts):
                    bp = bg.precincts[p]
                    for cblk_i, cb in enumerate(bp.cblks):
                        r0 = cb.rect
                        by0, bx0 = bg.rect.y0, bg.rect.x0
                        m = mag[r0.y0 - by0:r0.y1 - by0,
                                r0.x0 - bx0:r0.x1 - bx0]
                        n = neg[r0.y0 - by0:r0.y1 - by0,
                                r0.x0 - bx0:r0.x1 - bx0]
                        ejobs.append(dict(
                            mag=m, neg=n, orient=orient, w=r0.w, h=r0.h,
                            style=style, weight=w, mb=mb,
                            frac=None if frac is None else
                            frac[r0.y0 - by0:r0.y1 - by0,
                                 r0.x0 - bx0:r0.x1 - bx0],
                            key=(c, rg.r, p, band_i, cblk_i)))

    # run the block coder
    encs: list = [None] * len(ejobs)
    if (backend == "jax" or mesh is not None) and ejobs:
        from grok_tpu.ops.t1_enc import encode_blocks as _dev_encode
        dev_idx = [i for i, j in enumerate(ejobs) if j["style"] == 0]
        if dev_idx:
            for i, e in zip(dev_idx, _dev_encode([ejobs[i]
                                                  for i in dev_idx],
                                                 mesh=mesh)):
                encs[i] = e
    with trace("t1_encode", backend=backend):
        ht_idx = [i for i, j in enumerate(ejobs)
                  if j["style"] & CBLK_HT and encs[i] is None]
        if ht_idx:
            done = False
            if backend == "jax":
                from grok_tpu.ops.pallas_ht import (_ht_interpret,
                                                    ht_pallas_enabled)
                if ht_pallas_enabled():
                    from grok_tpu.ops.pallas_ht_enc import encode_ht_blocks
                    for i, e in zip(ht_idx, encode_ht_blocks(
                            [ejobs[i] for i in ht_idx],
                            interpret=_ht_interpret(),
                            ht_planes=ht_planes)):
                        encs[i] = e
                    done = True
            if not done:
                from grok_tpu.t1ht import ht_encode_block
                for i in ht_idx:
                    j = ejobs[i]
                    encs[i] = ht_encode_block(j["mag"], j["neg"],
                                              j["orient"], j["style"],
                                              p=ht_planes)
        rest = [i for i, e in enumerate(encs) if e is None]
        if backend in ("native", "jax") and rest and _native.available():
            for i, e in zip(rest, _native.encode_tile_blocks(
                    [ejobs[i] for i in rest])):
                encs[i] = e
        else:
            for i in rest:
                j = ejobs[i]
                encs[i] = encode_block(j["mag"], j["neg"], j["orient"],
                                       j["style"], frac=j.get("frac"))

    com = b""
    if ht_mixed:
        # HT MIXED sets: every block also coded with the Part-1 MQ
        # coder; the smaller stream wins (total <= pure-MQ and <=
        # pure-HT up to the ~1 bit/block bitmap).  Choice rides a
        # binary COM bitmap in the tile-part header (canonical block
        # order); Ccap15 bit 5 is set by the main header writer.
        # Reference parity: mixed HT sets [grok: HTJ2K mixed
        # code-block styles] (SURVEY §2 row 8).
        with trace("t1_encode_mq_mixed", backend=backend):
            mq_jobs = [dict(j, style=0) for j in ejobs]
            if backend in ("native", "jax") and _native.available():
                mq_encs = _native.encode_tile_blocks(mq_jobs)
            else:
                mq_encs = [encode_block(j["mag"], j["neg"], j["orient"],
                                        0) for j in mq_jobs]
        canon = canon_block_indices(geo)
        bitmap = bytearray((len(canon) + 7) // 8)
        for i, j in enumerate(ejobs):
            c, r, p, band_i, cblk_i = j["key"]
            ci = canon[(c, r, band_i, p, cblk_i)]
            if len(encs[i].data) <= len(mq_encs[i].data):
                bitmap[ci >> 3] |= 1 << (ci & 7)     # HT block
            else:
                encs[i] = mq_encs[i]
                j["style"] = 0
        from grok_tpu.codestream import j2k as _j2k
        com = _j2k.write_com(b"GRKTPU_HTMIX=" + bytes(bitmap),
                             binary=True)

    res = finish_tile_encode(geo, ejobs, encs, layer_targets,
                             quality_targets=quality_targets, pocs=pocs,
                             split_headers=split_headers, mesh=mesh,
                             seg_style_mask=~CBLK_HT if ht_mixed else -1)
    res.com = com
    return res


def finish_tile_encode(geo: TileGeometry, ejobs: list[dict], encs: list,
                       layer_targets: list | None,
                       quality_targets: list | None = None,
                       pocs: list | None = None,
                       split_headers: bool = False,
                       mesh=None,
                       seg_style_mask: int = -1) -> TileEncodeResult:
    """Rate allocation + Tier-2 emission over already-coded blocks:
    the host half of "device does the bitplane math, host does the
    bytes".  ejobs need only key/weight/mb per block; encs are the
    EncodedBlocks (any backend — the fused device encoder feeds this
    directly, pipeline/serve_enc.py).  Runs PCRD (byte or quality
    targets), the prepared C emitter when available, and the PPM
    header-split mode, exactly as the host encoder does."""
    ctxs = geo.make_contexts(seg_style_mask)
    num_layers = geo.cod.num_layers
    # the serving hot shape — one layer, no byte/quality target — needs
    # no rate allocation at all: every pass ships.  Skip the per-block
    # convex hulls and the prepared-emitter flattening (measured ~80 ms
    # of host time per 512^2 frame) and emit directly.
    trivial = (quality_targets is None and num_layers == 1
               and (not layer_targets or all(t is None
                                             for t in layer_targets)))
    hulls: list[Hull] = []
    rate_tables: list[np.ndarray] = []   # cumulative bytes per pass
    entry_keys: list[tuple] = []     # (c, r, p, band_i, cblk_i)
    for j, enc in zip(ejobs, encs):
        c, r, p, band_i, cblk_i = j["key"]
        mb = j["mb"]
        if enc.numbps > mb:
            raise ValueError(
                f"block overflows Mb: {enc.numbps} > {mb} "
                f"(band r={r}); raise guard bits")
        ctxs[(c, r, p)].set_block(band_i, cblk_i, enc, mb)
        if not trivial:
            rates = np.array([pi.rate for pi in enc.passes],
                             dtype=np.float64)
            dists = np.array([pi.dist * j["weight"] for pi in enc.passes],
                             dtype=np.float64)
            hulls.append(convex_hull(rates, dists))
            rate_tables.append(rates)
        entry_keys.append(j["key"])

    pkt_overhead = (6 if geo.cod.sop else 0) + (2 if geo.cod.eph else 0)

    def apply_layer_cum(cs: dict, layer_cum: list[list[int]]):
        for (key, cums) in zip(entry_keys, layer_cum):
            c, r, p, band_i, cblk_i = key
            st = cs[(c, r, p)].eblocks[band_i][cblk_i]
            st.layer_cum = cums

    def emit(cs: dict, nlayers: int) -> list[bytes]:
        pkt_cs = list(iter_packets(geo.tcgs, geo.subsampling, nlayers,
                                   geo.cod.prog_order, geo.rect.x0,
                                   geo.rect.y0, pocs or None))
        if not pocs and _native.available():
            # native fast path: the whole packet sequence in one C call
            # (POC-reordered streams keep the Python emitter, whose lazy
            # layer-0 tree priming matches per-segment ordering)
            keys = list(cs.keys())
            kidx = {k: i for i, k in enumerate(keys)}
            res = _native.t2_emit(
                cs, keys,
                [(kidx[(pc.comp, pc.res, pc.prec)], pc.layer)
                 for pc in pkt_cs],
                nlayers, geo.cod.sop, geo.cod.eph)
            if res is not None:
                return res
        pkts = []
        for pc in pkt_cs:
            ctx = cs[(pc.comp, pc.res, pc.prec)]
            header, body = ctx.encode_packet(pc.layer)
            pkt = bytearray()
            if geo.cod.sop:
                idx = len(pkts) & 0xFFFF
                pkt += SOP_MARKER + bytes([0, 4, idx >> 8, idx & 0xFF])
            pkt += header
            if geo.cod.eph:
                pkt += EPH_MARKER
            pkt += body
            pkts.append(bytes(pkt))
        return pkts

    # prepared emitter: the static arrays (geometry, zb, pass tables,
    # codeword bytes) are flattened ONCE; every PCRD bisection step and
    # the final emission then cost one numpy scatter + one C call
    emit_prep = None
    if _native.available() and not pocs and entry_keys and not trivial:
        ctx_keys_all = list(ctxs.keys())
        _prep = _native.t2_emit_prepare(ctxs, ctx_keys_all)
        if _prep is not None:
            _gidx = {(k, b, cb): i
                     for i, (k, b, cb) in enumerate(_prep["order"])}
            _e2g = np.asarray(
                [_gidx[((c, r, p), band_i, cblk_i)]
                 for (c, r, p, band_i, cblk_i) in entry_keys], np.int64)
            _kidx = {k: i for i, k in enumerate(ctx_keys_all)}
            _pkt_cache: dict[int, tuple] = {}

            def _pkts_for(nl: int):
                if nl not in _pkt_cache:
                    pl = list(iter_packets(geo.tcgs, geo.subsampling, nl,
                                           geo.cod.prog_order, geo.rect.x0,
                                           geo.rect.y0, None))
                    _pkt_cache[nl] = (
                        np.asarray([_kidx[(pc.comp, pc.res, pc.prec)]
                                    for pc in pl], np.int32),
                        np.asarray([pc.layer for pc in pl], np.int32))
                return _pkt_cache[nl]

            def emit_prepared(layer_cum, nlayers):
                lc = np.zeros((_prep["n_blks"], nlayers), np.int32)
                lc[_e2g] = np.asarray(layer_cum, np.int32)
                pc_a, pl_a = _pkts_for(nlayers)
                return _native.t2_emit_prepared(
                    _prep, pc_a, pl_a, lc, nlayers, geo.cod.sop,
                    geo.cod.eph)
            emit_prep = emit_prepared

    def simulate(layer_cum: list[list[int]]) -> int:
        nlayers = len(layer_cum[0]) if layer_cum else num_layers
        if emit_prep is not None:
            pkts = emit_prep(layer_cum, nlayers)
            if pkts is not None:
                return sum(len(p) for p in pkts)
        cs = geo.make_contexts(seg_style_mask)
        for i, key in enumerate(entry_keys):
            c, r, p, band_i, cblk_i = key
            src = ctxs[(c, r, p)].eblocks[band_i][cblk_i]
            mbv = src.enc.numbps + src.zb
            cs[(c, r, p)].set_block(band_i, cblk_i, src.enc, mbv)
            cs[(c, r, p)].eblocks[band_i][cblk_i].layer_cum = layer_cum[i]
        return sum(len(p) for p in emit(cs, nlayers))

    if trivial:
        if not entry_keys:
            return TileEncodeResult(packets=[], packet_lens=[], body=b"")
        for i, key in enumerate(entry_keys):
            c, r, p, band_i, cblk_i = key
            st = ctxs[(c, r, p)].eblocks[band_i][cblk_i]
            st.layer_cum = [st.enc.numpasses]
        if split_headers:
            headers = bytearray()
            bodies = []
            for pc in iter_packets(geo.tcgs, geo.subsampling, num_layers,
                                   geo.cod.prog_order, geo.rect.x0,
                                   geo.rect.y0, pocs or None):
                hd, bd = ctxs[(pc.comp, pc.res,
                               pc.prec)].encode_packet(pc.layer)
                headers += hd
                bodies.append(bd)
            return TileEncodeResult(packets=bodies,
                                    packet_lens=[len(p) for p in bodies],
                                    body=b"".join(bodies),
                                    headers=bytes(headers))
        with trace("t2_emit"):
            packets = emit(ctxs, num_layers)
        return TileEncodeResult(packets=packets,
                                packet_lens=[len(p) for p in packets],
                                body=b"".join(packets))

    if not hulls:
        return TileEncodeResult(packets=[], packet_lens=[], body=b"")

    _pcrd = trace("pcrd"); _pcrd.__enter__()
    totals = []
    for key in entry_keys:
        c, r, p, band_i, cblk_i = key
        totals.append(ctxs[(c, r, p)].eblocks[band_i][cblk_i].enc.numpasses)
    if quality_targets is not None:
        from grok_tpu.t2.rate import allocate_layers_quality
        dists_list = []
        for j, enc in zip(ejobs, encs):
            dists_list.append(np.array(
                [pi.dist * j["weight"] for pi in enc.passes]))
        # targets arrive as ALLOWED total squared error; convert to the
        # required distortion reduction against the maximal achievable
        e0 = sum(float(d[-1]) for d in dists_list if len(d))
        conv = [None if q is None else max(e0 - float(q), 0.0)
                for q in quality_targets]
        layer_cum = allocate_layers_quality(
            hulls, num_layers, conv, totals, dists_list)
    else:
        bounds = None
        if mesh is not None:
            # the PCRD collective: global slope bracket reduced across
            # the mesh, feeding the single lambda all shards share
            from grok_tpu.parallel.sharding import pcrd_slope_bounds_sharded
            bounds = pcrd_slope_bounds_sharded(hulls, mesh)
        layer_cum = allocate_layers(hulls, num_layers, layer_targets,
                                    simulate, totals, slope_bounds=bounds,
                                    pass_rates=rate_tables)

    _pcrd.__exit__(None, None, None)

    # Round-4 minimal-flush refinement: non-terminated pass rates carry
    # the MQ flush pessimism (+5 B watermark, scalar _EncCtl.end_pass
    # and native t1.c alike).  After allocation, shrink each
    # single-segment block's FINAL truncation to the smallest prefix
    # that still decodes its chosen passes bit-exactly (trial decode,
    # tail-linear scan) — reclaims ~1% of rate-targeted streams at
    # zero quality cost.  Deterministic given the codewords, so all
    # backends stay byte-identical.
    refined = False
    if not trivial:
        from grok_tpu.t1.t1_scalar import decode_block as _dec_scalar
        use_nat = _native.available()
        for i, (j, enc) in enumerate(zip(ejobs, encs)):
            p = layer_cum[i][-1] if layer_cum[i] else 0
            # serving jobs carry only key/weight/mb (serve_enc — their
            # HT blocks are single-pass terminated anyway); HT and
            # multi-segment blocks keep their coder-reported rates
            if (p <= 0 or p >= len(enc.passes) or len(enc.seg_lens) != 1
                    or enc.passes[p - 1].term
                    or "style" not in j or "orient" not in j
                    or j["style"] & CBLK_HT):
                continue
            pi = enc.passes[p - 1]
            hi = min(pi.rate, len(enc.data))
            lo = max(enc.passes[p - 2].rate if p >= 2 else 2, hi - 8)

            def out_at(r):
                if use_nat:
                    return _native.decode_block(
                        enc.data[:r], [r], p, enc.numbps,
                        j["orient"], j["w"], j["h"], j["style"])
                return _dec_scalar(enc.data[:r], [r], p, enc.numbps,
                                   j["orient"], j["w"], j["h"],
                                   j["style"], False)
            try:
                ref_m, ref_n = out_at(hi)
            except Exception:
                continue
            sig = ref_m > 0
            best = hi
            for r in range(hi - 1, lo - 1, -1):   # tail is contiguous
                try:
                    m2, n2 = out_at(r)
                    if np.array_equal(m2, ref_m) and \
                            np.array_equal(n2[sig], ref_n[sig]):
                        best = r
                        continue
                except Exception:
                    pass
                break
            if best < pi.rate:
                pi.rate = best
                refined = True

    with trace("t2_emit"):
        packets = None
        if emit_prep is not None and not split_headers and not refined:
            packets = emit_prep(layer_cum, num_layers)
        if packets is None:
            final_cs = geo.make_contexts(seg_style_mask)
            for i, key in enumerate(entry_keys):
                c, r, p, band_i, cblk_i = key
                src = ctxs[(c, r, p)].eblocks[band_i][cblk_i]
                mbv = src.enc.numbps + src.zb
                final_cs[(c, r, p)].set_block(band_i, cblk_i, src.enc,
                                              mbv)
                final_cs[(c, r, p)].eblocks[band_i][
                    cblk_i].layer_cum = layer_cum[i]
            packets = emit(final_cs, num_layers)
    if split_headers:
        # PPM: re-emit with headers and bodies separated (headers go to the
        # main header; bodies stay in the tile-part)
        cs2 = geo.make_contexts(seg_style_mask)
        for i, key in enumerate(entry_keys):
            c, r, p, band_i, cblk_i = key
            src = ctxs[(c, r, p)].eblocks[band_i][cblk_i]
            mbv = src.enc.numbps + src.zb
            cs2[(c, r, p)].set_block(band_i, cblk_i, src.enc, mbv)
            cs2[(c, r, p)].eblocks[band_i][cblk_i].layer_cum = layer_cum[i]
        headers = bytearray()
        bodies = []
        for pc in iter_packets(geo.tcgs, geo.subsampling, num_layers,
                               geo.cod.prog_order, geo.rect.x0, geo.rect.y0,
                               pocs or None):
            hd, bd = cs2[(pc.comp, pc.res, pc.prec)].encode_packet(pc.layer)
            headers += hd
            bodies.append(bd)
        body = b"".join(bodies)
        return TileEncodeResult(packets=bodies,
                                packet_lens=[len(p) for p in bodies],
                                body=body, headers=bytes(headers))
    body = b"".join(packets)
    return TileEncodeResult(packets=packets,
                            packet_lens=[len(p) for p in packets], body=body)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def decode_tile(body: bytes, geo: TileGeometry, hdr: MainHeader,
                tile_hdr: TileHeader | None = None,
                dparams: DecompressParams | None = None) -> list[np.ndarray]:
    """Decode one tile's packet body into per-component sample arrays.

    body: concatenated tile-part data (past SOD).  Returns tile-component
    arrays (full resolution, after inverse DWT/MCT/DC-shift, clipped).
    """
    dp = dparams or DecompressParams()
    import dataclasses
    if dp.strict is None:      # pipeline-level default matches decompress()
        dp = dataclasses.replace(dp, strict=True)
    if dp.backend == "auto":
        dp = dataclasses.replace(dp, backend=_resolve_backend(dp.backend))
    th = tile_hdr or TileHeader()
    mix_bitmap = th.ht_mixed_bitmap()
    mix_canon = canon_block_indices(geo) if mix_bitmap is not None \
        else None
    # HT MIXED: T2 parses every block with the default single-segment
    # rule (HT blocks are single-pass cleanup — identical wire); the
    # bitmap routes T1 per block below
    ctxs = geo.make_contexts(~CBLK_HT if mix_bitmap is not None else -1)
    num_layers = geo.cod.num_layers
    ht_p_ext = hdr.ht_planes_ext()
    if dp.max_layers:
        num_layers = min(num_layers, dp.max_layers)

    sop, eph = geo.cod.sop, geo.cod.eph
    use_ppt = th.ppt is not None
    hdr_buf = th.ppt if use_ppt else body
    hdr_pos = 0
    body_pos = 0

    pocs = (th.pocs or hdr.pocs) or None
    _t2span = trace("t2_parse"); _t2span.__enter__()
    packet_list = list(iter_packets(geo.tcgs, geo.subsampling,
                                    geo.cod.num_layers, geo.cod.prog_order,
                                    geo.rect.x0, geo.rect.y0, pocs))
    # PLT-seeded packet skipping: when per-packet lengths are signalled
    # (and headers are in-stream), packets that cannot contribute —
    # discarded resolutions, layers past the cap, precincts wholly
    # outside the decode window — are jumped over without parsing.
    # T2 state is per-precinct, so skipping every packet of an unneeded
    # precinct is safe.  Lengths include SOP/EPH (they are part of the
    # emitted packet).
    plt_lens = None
    if th.plt and not use_ppt and len(th.plt) == len(packet_list) and \
            (dp.reduce or dp.window is not None or
             (dp.max_layers and dp.max_layers < geo.cod.num_layers)):
        plt_lens = th.plt
        _win_pre: dict[tuple, bool] = {}

        def _pkt_needed(pc) -> bool:
            cs = geo.styles[pc.comp]
            numres = cs.num_resolutions
            rl = max(numres - dp.reduce, 1) if dp.reduce else numres
            if pc.res >= rl:
                return False
            if dp.max_layers and pc.layer >= dp.max_layers:
                return False
            if dp.window is not None:
                key = (pc.comp, pc.res, pc.prec)
                if key not in _win_pre:
                    dx, dy = geo.subsampling[pc.comp]
                    sub = Rect(*dp.window).intersect(geo.rect) \
                        .ceil_scale(dx, dy)
                    need = False
                    for orient, bp in ctxs[key].bands:
                        if not bp.rect.intersect(band_window(
                                sub, numres - 1, pc.res, orient)).empty:
                            need = True
                            break
                    _win_pre[key] = need
                if not _win_pre[key]:
                    return False
            return True

    # Native fast path: one C call parses the whole packet sequence
    # (tag trees + numpasses + segment lengths).  Declines (-> Python
    # parser, which owns SOP resync and permissive truncation) on PPT/PPM
    # headers, engaged PLT skipping, truncation, or marker mismatch.
    native_done = False
    if not use_ppt and plt_lens is None and dp.backend != "scalar":
        from grok_tpu import native as _native
        if _native.available():
            ctx_keys = list(ctxs.keys())
            ctx_idx = {k: i for i, k in enumerate(ctx_keys)}
            ctxs_flat = []
            for k in ctx_keys:
                ctx = ctxs[k]
                bands = []
                for (_o, bp) in ctx.bands:
                    bands.append((bp.cblk_grid_w, bp.cblk_grid_h,
                                  [g.idx_in_prec for g in bp.cblks]))
                ctxs_flat.append((ctx.style, bands))
            packets = [(ctx_idx[(pc.comp, pc.res, pc.prec)], pc.layer)
                       for pc in packet_list]
            parsed = _native.t2_parse(body, ctxs_flat, packets, sop, eph)
            if parsed is not None:
                incl_a, zb_a, np_a, chunk_rows, _endpos = parsed
                from grok_tpu.t2.packet import Chunk
                blocks_flat = [st for k in ctx_keys
                               for bl in ctxs[k].dblocks for st in bl]
                gi = 0
                for st in blocks_flat:
                    st.included = bool(incl_a[gi])
                    st.zb = int(zb_a[gi])
                    st.numpasses = int(np_a[gi])
                    gi += 1
                for (bi, lay, segno, npk, off, ln) in chunk_rows.tolist():
                    blocks_flat[bi].chunks.append(Chunk(
                        layer=lay, segno=segno, numpasses=npk,
                        offset=off, length=ln))
                native_done = True

    pk_i = 0
    import copy as _copy
    while not native_done and pk_i < len(packet_list):
        pc = packet_list[pk_i]
        pk_i += 1
        pkt_start = body_pos
        if plt_lens is not None and not _pkt_needed(pc):
            body_pos = pkt_start + plt_lens[pk_i - 1]
            if body_pos > len(body):
                break           # truncated: nothing further to decode
            continue
        ctx = ctxs[(pc.comp, pc.res, pc.prec)]
        # in permissive mode with SOP resilience, snapshot the precinct
        # state so a corrupt packet can be rolled back before resyncing
        snap = (_copy.deepcopy(ctx) if (sop and not dp.strict) else None)
        try:
            if not use_ppt:
                hdr_pos = body_pos
            if sop and not use_ppt:
                # SOP is per-packet when signalled: a missing marker or a
                # sequence-number mismatch means we lost sync
                if hdr_buf[hdr_pos:hdr_pos + 2] != SOP_MARKER:
                    raise ValueError("expected SOP marker")
                nsop = (hdr_buf[hdr_pos + 4] << 8) | hdr_buf[hdr_pos + 5]
                if nsop != (pk_i - 1) % 65536:
                    raise ValueError("SOP sequence mismatch")
                hdr_pos += 6
                body_pos += 6
            elif sop and hdr_buf[hdr_pos:hdr_pos + 2] == SOP_MARKER:
                hdr_pos += 6
            br = BitReader(hdr_buf, hdr_pos)
            nchunks0 = [len(st.chunks) for bl in ctx.dblocks for st in bl]
            blen = ctx.decode_packet(br, pc.layer, 0)
            hdr_end = br.pos
            if eph:
                if hdr_buf[hdr_end:hdr_end + 2] != EPH_MARKER:
                    if dp.strict:
                        raise ValueError("missing EPH marker")
                else:
                    hdr_end += 2
            if use_ppt:
                hdr_pos = hdr_end
                base = body_pos
            else:
                base = hdr_end
            # adjust chunk offsets recorded relative to 0
            it = iter(nchunks0)
            for bl in ctx.dblocks:
                for st in bl:
                    n0 = next(it)
                    for chk in st.chunks[n0:]:
                        chk.offset += base
            body_pos = base + blen
            if body_pos > len(body):
                raise EOFError("packet body past end of tile data")
        except (EOFError, IndexError, ValueError) as e:
            if dp.strict:
                raise
            from grok_tpu.util.msg import warn
            if snap is not None:
                ctxs[(pc.comp, pc.res, pc.prec)] = snap
            if sop:
                # resync on the next SOP marker (B.10.5 error resilience):
                # its Nsop field tells which packet the stream resumes at
                nxt = body.find(SOP_MARKER, pkt_start + 2)
                if nxt >= 0 and nxt + 6 <= len(body):
                    nsop = (body[nxt + 4] << 8) | body[nxt + 5]
                    target = None
                    for cand in range(pk_i, len(packet_list)):
                        if cand % 65536 == nsop:
                            target = cand
                            break
                    if target is not None:
                        warn(f"tile {geo.t}: corrupt packet "
                             f"({type(e).__name__}); resync at SOP "
                             f"#{nsop} (offset {nxt})")
                        body_pos = nxt
                        pk_i = target
                        continue
            warn(f"tile {geo.t}: truncated/corrupt packet stream "
                 f"({type(e).__name__}); decoding what is present")
            break   # truncated stream: decode what we have
    _t2span.__exit__(None, None, None)

    # -- T1 decode (batched on device or scalar) -----------------------------
    use_jax = dp.backend == "jax"
    jobs: list[dict] = []       # block descriptors + placement info
    for c, tcg in enumerate(geo.tcgs):
        quant = geo.quants[c]
        cs = geo.styles[c]
        numres = cs.num_resolutions
        r_lim = max(numres - dp.reduce, 1) if dp.reduce else numres
        win_bands = None
        if dp.window is not None:
            dx, dy = geo.subsampling[c]
            sub = Rect(*dp.window).intersect(geo.rect).ceil_scale(dx, dy)
            nl = numres - 1
            win_bands = {}
            for rg in tcg.resolutions:
                for bg in rg.bands:
                    win_bands[(rg.r, bg.orient)] = band_window(
                        sub, nl, rg.r, bg.orient).intersect(bg.rect)
        for rg in tcg.resolutions:
            if rg.r >= r_lim:
                continue
            for band_i, bg in enumerate(rg.bands):
                orient = bg.orient
                mb = quant.mb(rg.r, orient)
                for p in range(rg.num_precincts):
                    ctx = ctxs[(c, rg.r, p)]
                    bp = ctx.bands[band_i][1]
                    for cblk_i, cb in enumerate(bp.cblks):
                        st = ctx.dblocks[band_i][cblk_i]
                        if not st.included:
                            continue
                        if win_bands is not None and \
                                cb.rect.intersect(
                                    win_bands[(rg.r, orient)]).empty:
                            continue    # outside the decode window
                        data, seg_lens, npass = st.assemble(
                            body, dp.max_layers)
                        if npass <= 0:
                            continue
                        style = cs.cblk_style
                        if mix_bitmap is not None:
                            ci = mix_canon[(c, rg.r, band_i, p, cblk_i)]
                            in_map = ci >> 3 < len(mix_bitmap)
                            ht_bit = in_map and \
                                (mix_bitmap[ci >> 3] >> (ci & 7)) & 1
                            style = (style | CBLK_HT) if ht_bit \
                                else (style & ~CBLK_HT)
                        job = dict(
                            data=data, seg_lens=seg_lens, numpasses=npass,
                            numbps=mb - st.zb, orient=orient,
                            w=cb.rect.w, h=cb.rect.h,
                            style=style, comp=c, res=rg.r,
                            band_i=band_i, rect=cb.rect,
                            bx=cb.rect.x0 - bg.rect.x0,
                            by=cb.rect.y0 - bg.rect.y0)
                        if style & CBLK_HT:
                            # cleanup plane: standard rule from the pass
                            # count, or the ht_planes COM extension
                            from grok_tpu.t1ht.scalar import derive_p
                            job["ht_p"] = derive_p(npass, mb - st.zb,
                                                   ht_p_ext)
                        jobs.append(job)

    use_mesh = dp.mesh is not None
    # the fused device path buckets blocks into <=64-px lane windows;
    # larger (legal) code blocks must take the host/per-block paths
    fits = all(j["w"] <= 64 and j["h"] <= 64 for j in jobs)
    all_eligible = fits and all(j["style"] == 0 and len(j["seg_lens"]) <= 1
                                for j in jobs)
    if fits and not all_eligible and use_jax and jobs and not use_mesh \
            and not dp.strict:
        # HT blocks join the fused path through the Pallas HT kernel.
        # strict mode keeps the scalar HT decoder, which validates VLC
        # codewords and raises on corrupt segments (the branch-free
        # kernel decodes bad codes as garbage instead of bailing).
        from grok_tpu.ops.pallas_ht import (ht_block_eligible,
                                            ht_pallas_enabled)
        if ht_pallas_enabled():
            # the FUSED program's ht bucket is cleanup-only; multi-pass
            # (SigProp/MagRef) blocks take the per-block device route
            # below through the REFINE kernel variant
            all_eligible = all(
                (j["style"] == 0 and len(j["seg_lens"]) <= 1)
                or (j["style"] & CBLK_HT and j["numpasses"] == 1
                    and ht_block_eligible(j))
                for j in jobs)
    if use_jax and jobs and all_eligible and not geo.rgn and not use_mesh:
        # fused device path: T1 + dequant + band assembly + inverse DWT +
        # inverse MCT in one device program; single upload / download
        from grok_tpu.pipeline.device import run_device_decode
        return run_device_decode(jobs, geo, hdr, dp,
                                 keep_device=getattr(dp, "keep_device",
                                                     False))

    count("blocks", len(jobs))
    any_ht = any(j["style"] & CBLK_HT for j in jobs)
    if dp.backend == "native" and jobs and not any_ht:
        from grok_tpu import native as _native
        if _native.available():
            return _decode_tile_native(jobs, geo, hdr, dp)

    results: list = [None] * len(jobs)
    if use_mesh:
        # T1 batch sharded across the mesh (pure DP over the lane axis)
        from grok_tpu.parallel.sharding import decode_blocks_sharded_auto
        dev_idx = [i for i, j in enumerate(jobs)
                   if j["style"] == 0 and len(j["seg_lens"]) <= 1]
        if dev_idx:
            with trace("t1_sharded", blocks=len(dev_idx)):
                for i, r_ in zip(dev_idx, decode_blocks_sharded_auto(
                        [jobs[i] for i in dev_idx], dp.mesh)):
                    results[i] = r_
    elif use_jax:
        from grok_tpu.ops.pallas_t1 import t1_pallas_enabled
        from grok_tpu.ops.t1_dec import decode_blocks as _dev_decode
        # the Pallas kernel decodes every Part-1 mode switch in-kernel
        # (BYPASS raw segments, TERMALL multi-segment, RESET, VSC,
        # SEGSYM); the XLA fallback handles the default style only
        pallas_styled = t1_pallas_enabled()
        dev_idx = [i for i, j in enumerate(jobs)
                   if (j["style"] == 0 and len(j["seg_lens"]) <= 1)
                   or (pallas_styled and not j["style"] & CBLK_HT)]
        if dev_idx:
            dev_res = _dev_decode([jobs[i] for i in dev_idx])
            for i, r_ in zip(dev_idx, dev_res):
                results[i] = r_
    if use_jax and any_ht and not dp.strict:
        from grok_tpu.ops.pallas_ht import (_ht_interpret,
                                            decode_ht_blocks,
                                            ht_block_eligible,
                                            ht_pallas_enabled)
        if ht_pallas_enabled():
            ht_idx = [i for i, j in enumerate(jobs)
                      if results[i] is None and j["style"] & CBLK_HT
                      and ht_block_eligible(j)]
            if ht_idx:
                with trace("t1_ht_pallas", blocks=len(ht_idx)):
                    for i, r_ in zip(ht_idx, decode_ht_blocks(
                            [jobs[i] for i in ht_idx],
                            interpret=_ht_interpret())):
                        results[i] = r_
    use_native = dp.backend in ("native", "jax")
    if use_native:
        from grok_tpu import native as _native
        use_native = _native.available()
    for i, j in enumerate(jobs):
        if results[i] is None:
            if j["style"] & CBLK_HT:
                from grok_tpu.t1ht import ht_decode_block
                results[i] = ht_decode_block(
                    j["data"], j["seg_lens"], j["numpasses"], j["numbps"],
                    j["orient"], j["w"], j["h"], j["style"], dp.strict,
                    ht_planes=ht_p_ext)
            elif use_native:
                results[i] = _native.decode_block(
                    j["data"], j["seg_lens"], j["numpasses"], j["numbps"],
                    j["orient"], j["w"], j["h"], j["style"])
            else:
                results[i] = decode_block(
                    j["data"], j["seg_lens"], j["numpasses"], j["numbps"],
                    j["orient"], j["w"], j["h"], j["style"], dp.strict)

    # -- dequantize into band arrays + inverse DWT per component -------------
    out = []
    for c, tcg in enumerate(geo.tcgs):
        quant = geo.quants[c]
        cs = geo.styles[c]
        irrev = cs.irreversible
        numres = cs.num_resolutions
        r_lim = max(numres - dp.reduce, 1) if dp.reduce else numres
        bands_out: list = [None] * numres
        for rg in tcg.resolutions:
            if rg.r >= r_lim:
                continue
            per_orient = {}
            for band_i, bg in enumerate(rg.bands):
                orient = bg.orient
                delta = quant.delta(rg.r, orient)
                dt = np.float64 if irrev else np.int64
                arr = np.zeros((bg.rect.h, bg.rect.w), dtype=dt)
                roi_shift = geo.rgn.get(c, 0)
                for j, res_ in zip(jobs, results):
                    if (j["comp"] != c or j["res"] != rg.r
                            or j["band_i"] != band_i):
                        continue
                    mag2, neg = res_
                    if roi_shift:
                        mag2 = apply_roi_shift_decode(mag2, roi_shift)
                    vals = dequantize_band(mag2, neg, delta, not irrev)
                    r0 = j["rect"]
                    arr[r0.y0 - bg.rect.y0:r0.y1 - bg.rect.y0,
                        r0.x0 - bg.rect.x0:r0.x1 - bg.rect.x0] = vals
                per_orient[orient] = arr
            if rg.r == 0:
                bands_out[0] = per_orient[BAND_LL]
            else:
                bands_out[rg.r] = (per_orient[1], per_orient[2],
                                   per_orient[3])
        nl = numres - 1
        if use_mesh:
            # giant-tile synthesis: every level row-sharded over the mesh
            # with ppermute halos (ragged rows mirror-padded, both filters)
            from grok_tpu.parallel.sharding import inv_2d_level_sharded
            cur = bands_out[0]
            with trace("dwt_inv_sharded"):
                for r in range(1, r_lim):
                    rect = geo.comp_rects[c].ceil_scale(1 << (nl - r),
                                                        1 << (nl - r))
                    hl, lh, hh = bands_out[r]
                    cur = inv_2d_level_sharded(cur, hl, lh, hh, rect,
                                               irrev, dp.mesh)
        elif use_jax:
            from grok_tpu.ops import dwt as dwt_dev
            dt = "float32" if irrev else "int32"
            flat = [np.asarray(bands_out[0], dtype=dt)]
            for r in range(1, r_lim):
                flat += [np.asarray(b, dtype=dt) for b in bands_out[r]]
            rect = geo.comp_rects[c]
            cur = np.asarray(dwt_dev.inv_multilevel_flat(
                tuple(flat), (rect.x0, rect.y0, rect.x1, rect.y1),
                numres, irrev, r_lim))
        else:
            cur = bands_out[0]
            for r in range(1, r_lim):
                rect = geo.comp_rects[c].ceil_scale(1 << (nl - r),
                                                    1 << (nl - r))
                hl, lh, hh = bands_out[r]
                cur = dwt_np.inv_2d_level(cur, hl, lh, hh, rect, irrev)
        out.append(cur)

    # -- inverse MCT + DC unshift -------------------------------------------
    if geo.custom_mct is not None:
        out = mct_np.custom_mct_inv(out, geo.custom_mct)
    elif geo.cod.mct and len(out) >= 3:
        if geo.styles[0].irreversible:
            y, cb_, cr_ = out[0], out[1], out[2]
            r_, g_, b_ = mct_np.ict_inv(y, cb_, cr_)
        else:
            r_, g_, b_ = mct_np.rct_inv(out[0], out[1], out[2])
        out[0], out[1], out[2] = r_, g_, b_
    res = []
    for c, arr in enumerate(out):
        ci = hdr.comps[c]
        if geo.styles[c].irreversible:
            arr = np.rint(np.asarray(arr, dtype=np.float64))
        arr = np.asarray(arr, dtype=np.int64)
        res.append(mct_np.dc_shift_inv(arr, ci.prec, ci.sgnd).astype(np.int32))
    return res


def _decode_tile_native(jobs, geo, hdr, dp) -> list[np.ndarray]:
    """Fused native host path: one C call for T1+dequant+band placement,
    C inverse 5/3 levels (numpy for 9/7), then inverse MCT/DC unshift."""
    from grok_tpu import native as _native

    band_arrays: dict = {}
    band_meta: dict = {}
    r_lims = []
    for c, tcg in enumerate(geo.tcgs):
        cs = geo.styles[c]
        quant = geo.quants[c]
        numres = cs.num_resolutions
        r_lim = max(numres - dp.reduce, 1) if dp.reduce else numres
        r_lims.append(r_lim)
        roi = geo.rgn.get(c, 0)
        for rg in tcg.resolutions:
            if rg.r >= r_lim:
                continue
            for bg in rg.bands:
                key = (c, rg.r, bg.orient)
                dt = np.float32 if cs.irreversible else np.int32
                band_arrays[key] = np.zeros((bg.rect.h, bg.rect.w),
                                            dtype=dt)
                band_meta[key] = (quant.delta(rg.r, bg.orient),
                                  cs.irreversible, roi)
    with trace("t1_decode", backend="native"):
        _native.decode_tile_blocks(jobs, band_arrays, band_meta)

    out = []
    _dwtspan = trace("dwt_inv"); _dwtspan.__enter__()
    for c, tcg in enumerate(geo.tcgs):
        cs = geo.styles[c]
        irrev = cs.irreversible
        numres = cs.num_resolutions
        nl = numres - 1
        r_lim = r_lims[c]
        cur = band_arrays[(c, 0, BAND_LL)]
        for r in range(1, r_lim):
            rect = geo.comp_rects[c].ceil_scale(1 << (nl - r), 1 << (nl - r))
            hl = band_arrays[(c, r, 1)]
            lh = band_arrays[(c, r, 2)]
            hh = band_arrays[(c, r, 3)]
            if irrev:
                cur = _native.inv97_level(cur, hl, lh, hh,
                                          rect.w, rect.h, rect.x0,
                                          rect.y0)
            else:
                cur = _native.inv53_level(cur, hl, lh, hh, rect.w, rect.h,
                                          rect.x0, rect.y0)
        out.append(cur)
    _dwtspan.__exit__(None, None, None)

    if geo.custom_mct is not None:
        out = mct_np.custom_mct_inv(out, geo.custom_mct)
    elif geo.cod.mct and len(out) >= 3:
        if geo.styles[0].irreversible:
            r_, g_, b_ = mct_np.ict_inv(out[0], out[1], out[2])
        else:
            r_, g_, b_ = mct_np.rct_inv(out[0], out[1], out[2])
        out[0], out[1], out[2] = r_, g_, b_
    res = []
    for c, arr in enumerate(out):
        ci = hdr.comps[c]
        if geo.styles[c].irreversible or geo.custom_mct is not None:
            arr = np.rint(np.asarray(arr, dtype=np.float64))
        arr = np.asarray(arr, dtype=np.int64)
        res.append(mct_np.dc_shift_inv(arr, ci.prec, ci.sgnd)
                   .astype(np.int32))
    return res
