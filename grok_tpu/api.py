"""Public codec API: compress / decompress / read_header.

The library-level entry points with capability parity to the reference's
grk_compress_init/grk_compress and grk_decompress_init/read_header/
decompress family (upstream opj_* surface verified in SURVEY.md §1.1).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field, replace

import numpy as np

from grok_tpu.codestream import j2k, jp2
from grok_tpu.codestream.j2k import (CodestreamError, CodingStyle,
                                     CodingStyleComp, CompInfo, MainHeader,
                                     QuantStyle, TileHeader)
from grok_tpu.core.geometry import SizGrid
from grok_tpu.core.image import ColorSpace, Image
from grok_tpu.core.params import CompressParams, DecompressParams, MCTMode
from grok_tpu.core.quant import make_quantizer
from grok_tpu.pipeline import tile as tile_pipe
from grok_tpu.transform.mct_np import mct_component_norms


def _build_main_header(image: Image, params: CompressParams) -> MainHeader:
    params.validate()
    siz = SizGrid(xsiz=image.x1, ysiz=image.y1, xosiz=image.x0,
                  yosiz=image.y0, xtsiz=params.tile_w, ytsiz=params.tile_h,
                  xtosiz=params.tile_off_x, ytosiz=params.tile_off_y)
    comps = [CompInfo(prec=c.prec, sgnd=c.sgnd, dx=c.dx, dy=c.dy)
             for c in image.components]
    # Reversible coefficients live in int32 buffers end to end (dwt_np /
    # ops/dwt / native); cap input precision so RCT (+1 bit), DWT band gain
    # (+2 bits over the levels) and the T1 sign-magnitude shift can never
    # overflow 31 bits.  [grok: SIZ Ssiz supports up to 38, but the
    # reference's int32 pipeline has the same practical bound.]
    for c in comps:
        if c.prec > 27:
            raise ValueError(
                f"component precision {c.prec} exceeds the supported "
                "27-bit bound for the int32 coefficient pipeline")

    mct_mode = params.mct
    if mct_mode is None:
        mct_mode = MCTMode.RCT_OR_ICT if len(comps) >= 3 else MCTMode.NONE
    if mct_mode == MCTMode.CUSTOM:
        if params.custom_mct is None:
            raise ValueError("MCTMode.CUSTOM requires custom_mct matrix")
        if not params.irreversible:
            raise ValueError("custom MCT requires the irreversible path")
    use_mct = 1 if (mct_mode == MCTMode.RCT_OR_ICT and len(comps) >= 3
                    and len({(c.dx, c.dy) for c in comps[:3]}) == 1) else 0

    prec_exps = None
    if params.prec_w_exps:
        prec_exps = list(zip(params.prec_w_exps, params.prec_h_exps))
    cblk_style = params.cblk_style
    if params.ht or params.ht_mixed:
        from grok_tpu.core.params import CBLK_HT
        cblk_style |= CBLK_HT
    cs = CodingStyleComp(num_resolutions=params.num_resolutions,
                         cblk_w_exp=params.cblk_w_exp,
                         cblk_h_exp=params.cblk_h_exp,
                         cblk_style=cblk_style,
                         irreversible=params.irreversible,
                         prec_exps=prec_exps)
    cod = CodingStyle(prog_order=params.prog_order,
                      num_layers=params.num_layers, mct=use_mct,
                      sop=params.sop, eph=params.eph, comp=cs)

    hdr = MainHeader(siz=siz, rsiz=int(params.rsiz), comps=comps, cod=cod)
    if params.ht or params.ht_mixed:
        # CAP (A.5.2 / ISO 15444-15): Pcap bit for Part 15 capabilities
        # + one Ccap15 entry (0 = HT-only code-blocks, defaults; bit 5
        # = HT and Part-1 code-blocks MIXED in the same tile);
        # Rsiz bit 14 signals CAP-extended capabilities
        hdr.cap = (1 << (32 - 15), [0x20 if params.ht_mixed else 0])
        hdr.rsiz |= 0x4000
    if mct_mode == MCTMode.CUSTOM:
        hdr.custom_mct = np.asarray(params.custom_mct, dtype=float)
        hdr.rsiz |= 0x8000 | 0x0100      # Part-2 extended + MCT extension
    for c, ci in enumerate(comps):
        q = make_quantizer(params.num_resolutions, ci.prec,
                           params.irreversible, params.num_guard_bits,
                           params.quant_step,
                           derived=not params.quant_style_expounded
                           and params.irreversible)
        steps = q.steps if q.style != 1 else q.steps[:1]
        if (c == params.roi_comp and params.roi_shift > 0
                and not params.irreversible):
            # Maxshift headroom: raise the signalled exponents so
            # Mb = guard + eps - 1 covers the upshifted ROI planes
            # (reversible eps carries no step size, only dynamic range)
            from grok_tpu.core.quant import StepSize
            steps = [StepSize(expn=s.expn + params.roi_shift, mant=s.mant)
                     for s in steps]
        qs = QuantStyle(style=q.style, guard_bits=q.guard_bits, steps=steps)
        if c == 0:
            hdr.qcd = qs
        elif qs != hdr.qcd:
            hdr.qcc[c] = qs
    if params.roi_shift > 0 and params.roi_comp >= 0:
        hdr.rgn[params.roi_comp] = params.roi_shift
    hdr.pocs = list(params.pocs)
    return hdr


def _main_header_bytes(hdr: MainHeader, params: CompressParams,
                       tlm_entries: list[tuple[int, int]] | None,
                       ppm_chunks: list[bytes] | None = None,
                       plm_lists: list[list[int]] | None = None) -> bytes:
    out = bytearray(struct.pack(">H", j2k.SOC))
    out += j2k.write_siz(hdr.siz, hdr.rsiz, hdr.comps)
    if hdr.cap is not None:
        out += j2k.write_cap(*hdr.cap)
    out += j2k.write_cod(hdr.cod)
    for c, cs in hdr.coc.items():
        out += j2k.write_coc(c, len(hdr.comps), cs)
    out += j2k.write_qcd(hdr.qcd)
    for c, q in hdr.qcc.items():
        out += j2k.write_qcc(c, len(hdr.comps), q)
    for c, s in hdr.rgn.items():
        out += j2k.write_rgn(c, len(hdr.comps), s)
    if hdr.pocs:
        out += j2k.write_poc(hdr.pocs, len(hdr.comps))
    if hdr.custom_mct is not None:
        out += j2k.write_mct_set(hdr.custom_mct)
    if tlm_entries is not None:
        out += j2k.write_tlm(tlm_entries)
    if plm_lists is not None:
        out += j2k.write_plm(plm_lists)
    if ppm_chunks is not None:
        payload = bytearray(struct.pack(">B", 0))   # Zppm
        for chunk in ppm_chunks:
            payload += struct.pack(">I", len(chunk)) + chunk
        out += struct.pack(">HH", j2k.PPM, len(payload) + 2) + payload
    if params.comment:
        out += j2k.write_com(params.comment)
    if params.ht_planes:
        # ht_planes >= 1 extension: the global HT cleanup plane P is
        # signalled ONCE here (the segments stay standard-framed);
        # decoders compute the per-block plane min(P, numbps-1)
        # (t1ht/scalar.py derive_p).  Standard readers skip the COM.
        out += j2k.write_com("GRKTPU_HTP=%d" % params.ht_planes)
    return bytes(out)


def compress(image_or_array, params: CompressParams | None = None) -> bytes:
    """Encode an Image (or numpy array) to a J2K codestream / JP2 file."""
    params = params or CompressParams()
    image = (image_or_array if isinstance(image_or_array, Image)
             else Image.from_array(np.asarray(image_or_array)))
    if params.mct == MCTMode.AUTO_RD and len(image.components) >= 3:
        # R-D transform selection: encode with and without the color
        # transform, keep the winner — smaller stream when lossless,
        # lower true MSE at the (matched) byte budget when lossy.  The
        # ICT's 2.9x error amplification loses on covariance that
        # departs from the YCbCr model (docs/PERF.md config[1]), and
        # no cheap estimator survives the low-rate deadzone regime, so
        # the selection is by actual outcome.
        from dataclasses import replace as _replace
        cand = []
        for mode in (MCTMode.RCT_OR_ICT, MCTMode.NONE):
            data = compress(image, _replace(params, mct=mode))
            if not params.irreversible and not params.rates \
                    and not params.quality:
                cand.append((len(data), data))
            else:
                out = decompress(data).to_array().astype(np.float64)
                ref = image.to_array().astype(np.float64)
                cand.append((float(((out - ref) ** 2).sum()), data))
        return min(cand, key=lambda t: t[0])[1]
    hdr = _build_main_header(image, params)
    siz = hdr.siz

    from grok_tpu.t2.rate import layer_budget_consts
    _budget_consts = layer_budget_consts(hdr, params)

    mct_norms = None
    if hdr.cod.mct:
        mct_norms = mct_component_norms(params.irreversible)
    elif hdr.custom_mct is not None:
        import numpy as _np
        mct_norms = mct_component_norms(
            True, custom_inv=_np.linalg.inv(hdr.custom_mct))

    tiles_out: list[bytes] = []
    tlm_entries: list[tuple[int, int]] = []
    plm_lists: list[list[int]] = []          # per tile-part, stream order
    ppm_chunks: list[bytes] = []
    from grok_tpu.codestream.profiles import validate_profile
    errs = validate_profile(params, siz.xsiz - siz.xosiz,
                            siz.ysiz - siz.yosiz, len(hdr.comps),
                            frame_rate=params.frame_rate,
                            mainlevel=params.mainlevel,
                            sublevel=params.sublevel)
    if errs:
        raise ValueError("profile violations: " + "; ".join(errs))
    from grok_tpu.t2.rate import layer_targets_for_tile
    for t in range(siz.num_tiles):
        geo = tile_pipe.TileGeometry.build(hdr, t)
        targets = layer_targets_for_tile(_budget_consts, geo.rect, params)
        quality_targets = None
        if params.fixed_quality and params.quality:
            # PSNR target -> required cumulative weighted-squared-error
            # reduction; E0 approximated by the maximal achievable
            # reduction of this tile
            npix = sum(geo.comp_rects[c].w * geo.comp_rects[c].h
                       for c in range(len(hdr.comps)))
            quality_targets = []
            for q in params.quality:
                if q <= 0:
                    quality_targets.append(None)
                else:
                    peak = (1 << hdr.comps[0].prec) - 1
                    mse = peak * peak / (10.0 ** (q / 10.0))
                    # required reduction = E0 - allowed error; E0 is
                    # resolved inside encode_tile from the hull maxima
                    quality_targets.append(mse * npix)
        res = None
        if params.backend == "jax":
            # serving fast path: fused device encode (HT, single layer)
            from grok_tpu.pipeline.serve_enc import try_encode_serving
            res = try_encode_serving(image, hdr, t, params, hdr.pocs)
        if res is None:
            res = tile_pipe.encode_tile(image, geo, targets, mct_norms,
                                        backend=params.backend,
                                        roi_rect=params.roi_rect,
                                        pocs=hdr.pocs,
                                        quality_targets=quality_targets,
                                        split_headers=params.write_ppm,
                                        mesh=params.mesh,
                                        ht_planes=params.ht_planes,
                                        ht_mixed=params.ht_mixed)
        if params.write_ppm:
            ppm_chunks.append(res.headers)
        nparts = max(1, min(params.max_tile_parts, len(res.packets) or 1))
        if nparts == 1:
            plt_seg = j2k.write_plt(res.packet_lens) if params.write_plt \
                else b""
            plt_seg = res.com + plt_seg
            psot = 12 + len(plt_seg) + 2 + len(res.body)
            tp = j2k.write_sot(t, psot, 0, 1) + plt_seg + \
                struct.pack(">H", j2k.SOD) + res.body
            tiles_out.append(tp)
            tlm_entries.append((t, len(tp)))
            plm_lists.append(list(res.packet_lens))
        else:
            # split the packet sequence across tile-parts at packet
            # boundaries (packets never straddle a tile-part boundary)
            per = -(-len(res.packets) // nparts)
            for pi in range(nparts):
                pkts = res.packets[pi * per:(pi + 1) * per]
                lens = res.packet_lens[pi * per:(pi + 1) * per]
                bodyp = b"".join(pkts)
                plt_seg = j2k.write_plt(lens, zplt=pi) if params.write_plt \
                    else b""
                if pi == 0:          # tile-header markers in part 0 only
                    plt_seg = res.com + plt_seg
                psot = 12 + len(plt_seg) + 2 + len(bodyp)
                tp = j2k.write_sot(t, psot, pi, nparts) + plt_seg + \
                    struct.pack(">H", j2k.SOD) + bodyp
                tiles_out.append(tp)
                tlm_entries.append((t, len(tp)))
                plm_lists.append(list(lens))

    mh = _main_header_bytes(hdr, params,
                            tlm_entries if params.write_tlm else None,
                            ppm_chunks if params.write_ppm else None,
                            plm_lists if params.write_plm else None)
    stream = mh + b"".join(tiles_out) + struct.pack(">H", j2k.EOC)
    if params.jp2:
        c0 = image.components[0]
        per_comp = [(c.prec, c.sgnd) for c in image.components]
        return jp2.wrap_jp2(
            stream, width=image.w, height=image.h,
            numcomps=len(image.components), prec=c0.prec, sgnd=c0.sgnd,
            color_space=image.color_space, icc_profile=image.icc_profile,
            capture_resolution=image.capture_resolution,
            per_comp_prec=per_comp)
    return stream


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

@dataclass
class HeaderInfo:
    """grk_header_info analog."""

    width: int
    height: int
    x0: int
    y0: int
    numcomps: int
    prec: list[int]
    sgnd: list[bool]
    subsampling: list[tuple[int, int]]
    num_tiles: int
    tile_size: tuple[int, int]
    num_resolutions: int
    num_layers: int
    prog_order: int
    irreversible: bool
    mct: int
    cblk_size: tuple[int, int]
    color_space: ColorSpace = ColorSpace.UNSPECIFIED
    comments: list[bytes] = field(default_factory=list)
    is_jp2: bool = False
    rsiz: int = 0


def _locate_codestream_span(data: bytes, permissive: bool = False):
    """(codestream_start, codestream_end, jp2_meta|None) without copying.

    The offset form lets mapped-file callers (codec.Decompressor) keep
    the codestream as a view over the mapping — gigapixel JP2 inputs
    must not materialize the jp2c box as a bytes copy."""
    if jp2.is_jp2(data):
        return jp2.parse_jp2(data, permissive)
    if jp2.is_j2k(data):
        return 0, len(data), None
    raise CodestreamError("not a JPEG 2000 codestream or JP2 file")


def _locate_codestream(data: bytes, permissive: bool = False):
    s, e, meta = _locate_codestream_span(data, permissive)
    if s == 0 and e == len(data):
        return data, meta
    if isinstance(data, (bytes, bytearray)):
        return data[s:e], meta
    # mapped/buffer source: a memoryview slice keeps JP2 decode
    # zero-copy (the parsers are buffer-protocol clean; Reader.take
    # copies only small marker segments)
    return memoryview(data)[s:e], meta


def compress_device(arrays, params: CompressParams | None = None,
                    prec: int = 8, sgnd: bool = False) -> bytes:
    """Encode DEVICE-RESIDENT component arrays to a codestream.

    The encode mirror of decompress_device: `arrays` is a list of (h, w)
    jax arrays (one per component, e.g. straight from decompress_device
    or a model's output in HBM) — or numpy arrays, which are uploaded.
    All the sample math (DC shift, MCT, DWT, quantization, entropy
    coding, stream compaction) runs on device; only the compressed bytes
    come down.  Serving shapes: HT configs (any layering — the kernel
    ships exact distortion stats) and Part-1 default-style single-layer
    configs (round 4: the Pallas MQ encoder; rate-targeted Part-1 falls
    back).  Other configs fall back to the host encoder, downloading
    the pixels.

    Reference parity: device-input analog of grk_compress with the
    plugin batch path [grok: grk_plugin_batch_compress] (SURVEY §3.5).
    """
    from grok_tpu.core.image import Component
    params = params or CompressParams(ht=True)
    params = replace(params, backend="jax")
    if not isinstance(arrays, (list, tuple)):
        if getattr(arrays, "ndim", 2) == 3:
            arrays = [arrays[:, :, c] for c in range(arrays.shape[2])]
        else:
            arrays = [arrays]
    comps = [Component(data=a, prec=prec, sgnd=sgnd) for a in arrays]
    color = ColorSpace.GRAY if len(comps) == 1 else ColorSpace.SRGB
    img = Image(components=comps, color_space=color)
    return compress(img, params)


def compress_device_batch(arrays_list, params: CompressParams | None = None,
                          prec: int = 8, sgnd: bool = False) -> list[bytes]:
    """Encode N same-geometry frames to N codestreams in one fused
    device program — the encode mirror of decompress_device_batch.

    arrays_list: one entry per frame, each a list of (h, w) component
    arrays (jax device arrays stay on device; numpy uploads), or a
    single (h, w) / (h, w, c) array.  All frames' code-blocks pack into
    shared kernel launches of one cached program, amortizing per-frame
    host staging and dispatch (a frame sequence or dataset shard).

    Requirements: same shape/components across frames and a single-tile
    serving shape (HT, or Part-1 default-style single-layer); anything
    else encodes frame-by-frame via the general path.

    Reference parity: batch analog of the reference's plugin batch
    compress surface [grok: grk_plugin_batch_compress] (SURVEY §3.5).
    """
    from grok_tpu.core.image import Component
    params = params or CompressParams(ht=True)
    params = replace(params, backend="jax")
    if not arrays_list:
        return []
    imgs = []
    for arrays in arrays_list:
        if not isinstance(arrays, (list, tuple)):
            if getattr(arrays, "ndim", 2) == 3:
                arrays = [arrays[:, :, c] for c in range(arrays.shape[2])]
            else:
                arrays = [arrays]
        comps = [Component(data=a, prec=prec, sgnd=sgnd) for a in arrays]
        color = ColorSpace.GRAY if len(comps) == 1 else ColorSpace.SRGB
        imgs.append(Image(components=comps, color_space=color))

    hdr = _build_main_header(imgs[0], params)
    same = all(im.w == imgs[0].w and im.h == imgs[0].h
               and len(im.components) == len(imgs[0].components)
               for im in imgs)
    results = None
    if same and hdr.siz.num_tiles == 1 and params.max_tile_parts == 1 \
            and not params.write_ppm:
        from grok_tpu.pipeline.serve_enc import try_encode_serving_batch
        results = try_encode_serving_batch(imgs, hdr, 0, params, hdr.pocs)
    if results is None:
        return [compress(im, params) for im in imgs]

    out = []
    for res in results:
        plt_seg = j2k.write_plt(res.packet_lens) if params.write_plt \
            else b""
        psot = 12 + len(plt_seg) + 2 + len(res.body)
        tp = j2k.write_sot(0, psot, 0, 1) + plt_seg + \
            struct.pack(">H", j2k.SOD) + res.body
        mh = _main_header_bytes(
            hdr, params, [(0, len(tp))] if params.write_tlm else None)
        stream = mh + tp + struct.pack(">H", j2k.EOC)
        if params.jp2:
            im = imgs[0]
            c0 = im.components[0]
            per_comp = [(c.prec, c.sgnd) for c in im.components]
            stream = jp2.wrap_jp2(
                stream, width=im.w, height=im.h,
                numcomps=len(im.components), prec=c0.prec, sgnd=c0.sgnd,
                color_space=im.color_space, icc_profile=im.icc_profile,
                capture_resolution=im.capture_resolution,
                per_comp_prec=per_comp)
        out.append(stream)
    return out


def decompress_device_batch(streams: list[bytes],
                            dparams: DecompressParams | None = None) -> list:
    """Decode N same-geometry codestreams in one fused device program.

    The batched serving surface: all N streams' code-blocks share kernel
    launches, the N bodies go up as one transfer, and every stream's
    inverse DWT/MCT runs in the same jit — amortizing dispatch and host
    staging across the batch (a frame sequence or dataset shard).
    Returns a list of N per-component device-array lists.

    Requirements: single-tile streams sharing one main header geometry
    (SIZ/COD/QCD), serving-eligible (HT, full-frame).  Anything else
    decodes stream-by-stream via decompress_device.

    Default mode is PERMISSIVE, like `decompress_device` (the serving
    surfaces validate framing via the C scan, not per-pass payloads).

    Reference parity: batch analog of the reference's plugin batch
    decompress surface [grok: grk_plugin_batch_decompress] (SURVEY §3.5).
    """
    dp = dparams or DecompressParams()
    if dp.strict is None:
        dp = replace(dp, strict=False)
    if not streams:
        return []
    from grok_tpu.pipeline.serve import try_decode_serving_batch
    first_cs, _ = _locate_codestream(streams[0], permissive=not dp.strict)
    hdr = j2k.read_main_header(first_cs)
    mh = bytes(first_cs[:hdr.main_header_end])

    bodies = []
    ths = []
    ok = True
    th0 = None
    for s in streams:
        cs, _ = _locate_codestream(s, permissive=not dp.strict)
        if bytes(cs[:hdr.main_header_end]) != mh:
            ok = False
            break
        parts = j2k.read_tile_parts(cs, hdr, strict=dp.strict)
        if hdr.siz.num_tiles != 1 or \
                {p.tile_index for p in parts} != {0}:
            ok = False
            break
        th = TileHeader()
        chunks = []
        for p in sorted(parts, key=lambda p: p.part_index):
            j2k.read_tile_part_header(cs, p, hdr, th)
            chunks.append(cs[p.data_start:p.data_end])
        if (th.cod is not None or th.qcd is not None or th.coc or th.qcc
                or th.rgn or th.pocs or th.ppt is not None):
            ok = False
            break
        bodies.append(b"".join(chunks))
        ths.append(th)       # per-stream: HT MIXED bitmaps vary
        th0 = th0 or th
    if ok:
        out = try_decode_serving_batch(mh, hdr, 0, th0, bodies, dp,
                                       ths=ths)
        if out is not None:
            return out
    return [decompress_device(s, dp) for s in streams]


def read_header(data: bytes) -> HeaderInfo:
    cs, meta = _locate_codestream(data)
    hdr = j2k.read_main_header(cs)
    return _header_info_from(hdr, meta)


def _header_info_from(hdr, meta) -> HeaderInfo:
    """HeaderInfo from an already-parsed MainHeader (+ JP2 meta or None)
    — lets codec.Decompressor reuse its parse instead of re-locating
    (which would copy a mapped JP2's codestream)."""
    g = hdr.siz.normalized()
    color = ColorSpace.UNSPECIFIED
    if meta is not None:
        color = meta.color_space
    elif hdr.numcomps == 1:
        color = ColorSpace.GRAY
    elif hdr.numcomps == 3 and hdr.cod.mct:
        color = ColorSpace.SRGB
    return HeaderInfo(
        width=g.xsiz - g.xosiz, height=g.ysiz - g.yosiz,
        x0=g.xosiz, y0=g.yosiz,
        numcomps=hdr.numcomps,
        prec=[c.prec for c in hdr.comps],
        sgnd=[c.sgnd for c in hdr.comps],
        subsampling=[(c.dx, c.dy) for c in hdr.comps],
        num_tiles=hdr.siz.num_tiles,
        tile_size=(g.xtsiz, g.ytsiz),
        num_resolutions=hdr.cod.comp.num_resolutions,
        num_layers=hdr.cod.num_layers,
        prog_order=int(hdr.cod.prog_order),
        irreversible=hdr.cod.comp.irreversible,
        mct=hdr.cod.mct,
        cblk_size=(1 << hdr.cod.comp.cblk_w_exp,
                   1 << hdr.cod.comp.cblk_h_exp),
        color_space=color,
        comments=[c for (_r, c) in hdr.comments],
        is_jp2=meta is not None,
        rsiz=hdr.rsiz,
    )


def decompress(data: bytes,
               dparams: DecompressParams | None = None) -> Image:
    """Decode a J2K codestream or JP2 file to an Image."""
    dp = dparams or DecompressParams()
    if dp.strict is None:
        dp = replace(dp, strict=True)
    cs, meta = _locate_codestream(data, permissive=not dp.strict)
    hdr = j2k.read_main_header(cs)
    parts = j2k.read_tile_parts(cs, hdr, strict=dp.strict)

    by_tile: dict[int, list] = {}
    for p in parts:
        by_tile.setdefault(p.tile_index, []).append(p)

    g = hdr.siz.normalized()
    scale = 1 << dp.reduce if dp.reduce else 1
    comps_sel = dp.components if dp.components is not None \
        else list(range(hdr.numcomps))

    # allocate full-image component arrays at (possibly reduced) resolution
    out_arrays: list[np.ndarray] = []
    origins: list[tuple[int, int]] = []
    for c, ci in enumerate(hdr.comps):
        x0 = -(-g.xosiz // ci.dx)
        y0 = -(-g.yosiz // ci.dy)
        x1 = -(-g.xsiz // ci.dx)
        y1 = -(-g.ysiz // ci.dy)
        rx0, ry0 = -(-x0 // scale), -(-y0 // scale)
        rx1, ry1 = -(-x1 // scale), -(-y1 // scale)
        out_arrays.append(np.zeros((ry1 - ry0, rx1 - rx0), dtype=np.int32))
        origins.append((rx0, ry0))

    tiles = sorted(by_tile)
    if dp.tile_index is not None:
        if dp.tile_index not in by_tile:
            raise CodestreamError(f"tile {dp.tile_index} not in codestream")
        tiles = [dp.tile_index]
    if dp.window is not None:
        from grok_tpu.core.geometry import Rect
        win = Rect(*dp.window)
        tiles = [t for t in tiles
                 if not hdr.siz.tile_rect(t).intersect(win).empty]

    # PPM (A.7.4): packed packet headers in the main header, one
    # Nppm-prefixed blob per tile-part in stream order
    ppm_blobs: dict[int, bytes] = {}
    if hdr.ppm is not None:
        r = j2k.Reader(hdr.ppm)
        order = sorted(parts, key=lambda p: p.header_start)
        for p in order:
            if r.remaining < 4:
                break
            n = r.u32()
            ppm_blobs[p.header_start] = r.take(min(n, r.remaining))

    # PLM (A.4.6): main-header packet lengths, one list per tile-part in
    # stream order — usable exactly like per-tile PLT for packet skipping
    plm_by_start: dict[int, list[int]] = {}
    if hdr.plm:
        order = sorted(parts, key=lambda p: p.header_start)
        if len(hdr.plm) == len(order):
            for p, lens in zip(order, hdr.plm):
                plm_by_start[p.header_start] = lens

    for t in tiles:
        th = TileHeader()
        chunks = []
        ppm_parts = []
        plm_lens: list[int] = []
        for p in sorted(by_tile[t], key=lambda p: p.part_index):
            j2k.read_tile_part_header(cs, p, hdr, th)
            chunks.append(cs[p.data_start:p.data_end])
            plm_lens += plm_by_start.get(p.header_start, [])
            if p.header_start in ppm_blobs:
                ppm_parts.append(ppm_blobs[p.header_start])
        if not th.plt and plm_lens:
            th.plt = plm_lens
        if ppm_parts:
            th.ppt = b"".join(ppm_parts)
        body = b"".join(chunks)
        geo = tile_pipe.TileGeometry.build(hdr, t, th)
        comp_arrays = tile_pipe.decode_tile(body, geo, hdr, th, dp)
        for c in range(hdr.numcomps):
            nl = geo.styles[c].num_resolutions - 1
            eff_reduce = min(dp.reduce, nl) if dp.reduce else 0
            rect = geo.comp_rects[c].ceil_scale(1 << eff_reduce,
                                                1 << eff_reduce)
            ox, oy = origins[c]
            arr = comp_arrays[c]
            out_arrays[c][rect.y0 - oy:rect.y1 - oy,
                          rect.x0 - ox:rect.x1 - ox] = \
                arr[:rect.h, :rect.w]

    img_x0, img_y0 = -(-g.xosiz // scale), -(-g.yosiz // scale)
    img_x1, img_y1 = -(-g.xsiz // scale), -(-g.ysiz // scale)
    if dp.window is not None:
        wx0, wy0, wx1, wy1 = dp.window
        img_x0 = max(img_x0, wx0 // scale)
        img_y0 = max(img_y0, wy0 // scale)
        img_x1 = min(img_x1, -(-wx1 // scale))
        img_y1 = min(img_y1, -(-wy1 // scale))

    comps = []
    from grok_tpu.core.image import Component
    for c in comps_sel:
        ci = hdr.comps[c]
        arr = out_arrays[c]
        if dp.window is not None:
            ox, oy = origins[c]
            cx0 = -(-img_x0 // ci.dx)
            cy0 = -(-img_y0 // ci.dy)
            cx1 = -(-img_x1 // ci.dx)
            cy1 = -(-img_y1 // ci.dy)
            arr = arr[cy0 - oy:cy1 - oy, cx0 - ox:cx1 - ox]
        comps.append(Component(data=arr, dx=ci.dx * scale,
                               dy=ci.dy * scale, prec=ci.prec, sgnd=ci.sgnd))
    color = meta.color_space if meta is not None else (
        ColorSpace.GRAY if len(comps) == 1 else ColorSpace.SRGB)
    img = Image(components=comps,
                x0=img_x0, y0=img_y0, x1=img_x1, y1=img_y1,
                color_space=color)
    if meta is not None:
        img.icc_profile = meta.icc_profile
        img.capture_resolution = meta.capture_resolution
    from grok_tpu.pipeline.postproc import postprocess
    return postprocess(img, meta, dp)


def decompress_device(data: bytes,
                      dparams: DecompressParams | None = None) -> list:
    """Decode a codestream to DEVICE-RESIDENT component arrays.

    The serving path for accelerator consumers (a model eating decoded
    pixels): host does T2/byte work, the device does all bitplane and
    wavelet math, and the decoded int32 component planes stay in device
    memory — no HBM->host download.  Returns a list of jax.Array, one
    per component, at full (non-windowed) tile-grid resolution.

    Requires the jax backend; falls back to a host decode + upload when a
    tile is not fused-path eligible (non-default coding styles other than
    HT, ROI, multi-segment blocks).  Postprocessing (force_rgb, ICC,
    upsample) is host-side and not applied here.

    Default mode is PERMISSIVE (unlike `decompress`): the serving fast
    path validates stream framing with the C scan but decodes bodies
    in-kernel without per-pass validation, so malformed payloads yield
    best-effort pixels rather than raising.  Pass
    DecompressParams(strict=True) for a validating (host-coder) decode.

    Reference parity: device analog of the tile-cache decode surface
    [grok: grk_decompress_tile] (SURVEY.md §1.1).
    """
    import jax
    import jax.numpy as jnp

    dp = dparams or DecompressParams()
    dp = replace(dp, backend="jax", keep_device=True,
                 strict=False if dp.strict is None else dp.strict)
    cs, meta = _locate_codestream(data, permissive=not dp.strict)
    hdr = j2k.read_main_header(cs)
    parts = j2k.read_tile_parts(cs, hdr, strict=dp.strict)
    by_tile: dict[int, list] = {}
    for p in parts:
        by_tile.setdefault(p.tile_index, []).append(p)

    g = hdr.siz.normalized()
    scale = 1 << dp.reduce if dp.reduce else 1
    tiles = sorted(by_tile)

    out_arrays: list = []
    origins: list[tuple[int, int]] = []
    single_tile = len(tiles) == 1
    for ci in hdr.comps:
        x0, y0 = -(-g.xosiz // ci.dx), -(-g.yosiz // ci.dy)
        x1, y1 = -(-g.xsiz // ci.dx), -(-g.ysiz // ci.dy)
        rx0, ry0 = -(-x0 // scale), -(-y0 // scale)
        rx1, ry1 = -(-x1 // scale), -(-y1 // scale)
        origins.append((rx0, ry0))
        if not single_tile:
            out_arrays.append(jnp.zeros((ry1 - ry0, rx1 - rx0), jnp.int32))

    for t in tiles:
        th = TileHeader()
        chunks = []
        for p in sorted(by_tile[t], key=lambda p: p.part_index):
            j2k.read_tile_part_header(cs, p, hdr, th)
            chunks.append(cs[p.data_start:p.data_end])
        body = b"".join(chunks)
        # serving fast path: cached plan + device-side staging (HT)
        from grok_tpu.pipeline.serve import try_decode_serving
        served = try_decode_serving(cs, hdr, t, th, body, dp)
        if served is not None:
            comp_arrays = served
            if single_tile:
                return comp_arrays
            geo = tile_pipe.TileGeometry.build(hdr, t, th)
        else:
            geo = tile_pipe.TileGeometry.build(hdr, t, th)
            comp_arrays = tile_pipe.decode_tile(body, geo, hdr, th, dp)
            comp_arrays = [jnp.asarray(a) for a in comp_arrays]
        if single_tile:
            return comp_arrays
        for c in range(hdr.numcomps):
            nl = geo.styles[c].num_resolutions - 1
            eff_reduce = min(dp.reduce, nl) if dp.reduce else 0
            rect = geo.comp_rects[c].ceil_scale(1 << eff_reduce,
                                                1 << eff_reduce)
            ox, oy = origins[c]
            out_arrays[c] = jax.lax.dynamic_update_slice(
                out_arrays[c], comp_arrays[c][:rect.h, :rect.w],
                (rect.y0 - oy, rect.x0 - ox))
    return out_arrays
