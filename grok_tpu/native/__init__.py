"""Native host runtime: C Tier-1 block coder, built on demand with the
system toolchain and bound via ctypes.

`available()` gates use; everything falls back to the Python scalar model
when no compiler is present.  The .so is cached next to the source and
rebuilt when t1.c changes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "t1.c")
_SRC_T2 = os.path.join(_HERE, "t2.c")
_SRC_HTW = os.path.join(_HERE, "ht_wire.c")
_SO = os.path.join(_HERE, f"_t1_{sys.platform}.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    try:
        src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_T2),
                        os.path.getmtime(_SRC_HTW))
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return _SO
        cc = os.environ.get("CC", "gcc")
        cmd = [cc, "-O3", "-march=native", "-funroll-loops",
               "-ffp-contract=off",     # 9/7 f64 must match NumPy exactly
               "-shared", "-fPIC", "-pthread", "-o", _SO, _SRC, _SRC_T2,
               _SRC_HTW]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.grk_t1_decode_fast.restype = ctypes.c_int
            lib.grk_t1_decode.restype = ctypes.c_int
            lib.grk_t1_decode_fast.argtypes = \
                lib.grk_t1_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            ip = ctypes.POINTER(ctypes.c_int)
            lib.grk_t1_decode_tile.restype = ctypes.c_int
            lib.grk_t1_decode_tile.argtypes = [
                ctypes.c_char_p] + [ip] * 13 + [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p), ip,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float), ip,
                ctypes.c_int, ctypes.c_int]
            ipp = ctypes.POINTER(ctypes.c_int)
            lib.grk_t2_parse.restype = ctypes.c_int
            lib.grk_t2_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.c_int, ipp, ipp,           # n_ctx, style, band_start
                ipp, ipp, ipp,                    # ttw, tth, blk_start
                ipp, ipp,                         # blk_x, blk_y
                ctypes.c_int, ipp, ipp,           # n_pkts, pkt_ctx, pkt_layer
                ctypes.c_int, ctypes.c_int,       # sop, eph
                ipp, ipp, ipp,                    # blk out arrays
                ipp, ctypes.c_int, ipp,           # chunks, cap, counts
            ]
            lib.grk_inv53_level.restype = ctypes.c_int
            lib.grk_t1_encode.restype = ctypes.c_int
            lib.grk_fwd53_level.restype = ctypes.c_int
            lib.grk_t1_encode_tile.restype = ctypes.c_int
            llp = ctypes.POINTER(ctypes.c_longlong)
            dp_ = ctypes.POINTER(ctypes.c_double)
            lib.grk_fwd97_level.restype = ctypes.c_int
            lib.grk_fwd97_level.argtypes = [
                dp_, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, dp_, dp_, dp_, dp_]
            lib.grk_inv97_level.restype = ctypes.c_int
            lib.grk_inv97_level.argtypes = [
                dp_, dp_, dp_, dp_,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, dp_]
            u8p_ = ctypes.POINTER(ctypes.c_uint8)
            lib.grk_ht_scan2.restype = ctypes.c_int
            lib.grk_ht_scan2.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong,
                llp, ipp, ctypes.c_int, ipp,
                u8p_, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_longlong)]
            lib.grk_ht_assemble_batch.restype = ctypes.c_int
            lib.grk_ht_assemble_batch.argtypes = [
                u8p_, llp, llp, llp, llp, llp, llp,
                ipp, ctypes.c_int, u8p_, ctypes.c_longlong, llp]
            lib.grk_ht_raw_batch.restype = ctypes.c_int
            lib.grk_ht_raw_batch.argtypes = [
                u8p_, llp, llp, ctypes.c_int,
                u8p_, ctypes.c_longlong, llp]
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.grk_t2_emit.restype = ctypes.c_int
            lib.grk_t2_emit.argtypes = [
                ctypes.c_int, ipp, ipp, ipp, ipp, ipp, ipp,
                ctypes.c_int, ipp, ipp,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ipp, ipp, ipp, ipp, u8p,
                llp, ctypes.c_char_p,
                u8p, ctypes.c_longlong, ipp]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def decode_block(data: bytes, seg_lens: list[int], numpasses: int,
                 numbps: int, orient: int, w: int, h: int,
                 style: int = 0):
    """Native analog of t1_scalar.decode_block -> (mag2, neg)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native T1 not available")
    mag2 = np.zeros(h * w, dtype=np.int32)
    neg = np.zeros(h * w, dtype=np.uint8)
    lens = (ctypes.c_int * max(len(seg_lens), 1))(*(seg_lens or [0]))
    rc = lib.grk_t1_decode_fast(
        data, len(data), lens, len(seg_lens), numpasses, numbps, orient,
        w, h, style,
        mag2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        neg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise RuntimeError(f"grk_t1_decode failed: {rc}")
    return (mag2.reshape(h, w).astype(np.int64),
            neg.reshape(h, w).astype(bool))


def _ip(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def decode_tile_blocks(jobs: list[dict], band_arrays: dict,
                       band_meta: dict) -> None:
    """Batched T1 decode + dequant + placement, one C call.

    jobs: pipeline block descriptors (with comp/res/band_i/rect).
    band_arrays: {(c, r, orient): np int32 or float32 contiguous array}
    band_meta: {(c, r, orient): (delta, irrev, roi_shift)}
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native T1 not available")
    keys = sorted(band_arrays.keys())
    kidx = {k: i for i, k in enumerate(keys)}
    nb = len(jobs)
    data = bytearray()
    off = np.zeros(nb, np.int32)
    seg_off = np.zeros(nb, np.int32)
    seg_cnt = np.zeros(nb, np.int32)
    seg_flat: list[int] = []
    numpasses = np.zeros(nb, np.int32)
    numbps = np.zeros(nb, np.int32)
    orient = np.zeros(nb, np.int32)
    style = np.zeros(nb, np.int32)
    bw = np.zeros(nb, np.int32)
    bh = np.zeros(nb, np.int32)
    band_id = np.zeros(nb, np.int32)
    bx = np.zeros(nb, np.int32)
    by = np.zeros(nb, np.int32)
    max_w = max_h = 1
    for i, j in enumerate(jobs):
        off[i] = len(data)
        data.extend(j["data"])
        seg_off[i] = len(seg_flat)
        seg_flat.extend(j["seg_lens"])
        seg_cnt[i] = len(j["seg_lens"])
        numpasses[i] = j["numpasses"]
        numbps[i] = j["numbps"]
        orient[i] = j["orient"]
        style[i] = j["style"]
        bw[i] = j["w"]
        bh[i] = j["h"]
        band_id[i] = kidx[(j["comp"], j["res"], j["orient"]
                           if j["res"] > 0 else 0)]
        bx[i] = j["bx"]
        by[i] = j["by"]
        max_w = max(max_w, j["w"])
        max_h = max(max_h, j["h"])
    seg_flat_a = np.asarray(seg_flat or [0], np.int32)
    nbands = len(keys)
    bptr = (ctypes.c_void_p * nbands)(
        *[band_arrays[k].ctypes.data for k in keys])
    bstride = np.asarray(
        [band_arrays[k].shape[1] if band_arrays[k].ndim == 2 else 1
         for k in keys], np.int32)
    birrev = np.asarray([1 if band_meta[k][1] else 0 for k in keys],
                        np.uint8)
    bdelta = np.asarray([band_meta[k][0] for k in keys], np.float32)
    broi = np.asarray([band_meta[k][2] for k in keys], np.int32)
    rc = lib.grk_t1_decode_tile(
        bytes(data), _ip(off), _ip(seg_off), _ip(seg_cnt), _ip(seg_flat_a),
        _ip(numpasses), _ip(numbps), _ip(orient), _ip(style),
        _ip(bw), _ip(bh), _ip(band_id), _ip(bx), _ip(by), nb,
        bptr, _ip(bstride),
        birrev.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bdelta.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _ip(broi), max_w, max_h)
    if rc != 0:
        raise RuntimeError(f"grk_t1_decode_tile failed: {rc}")


def inv53_level(ll, hl, lh, hh, w, h, x0, y0):
    """C inverse 5/3 2D level; int32 arrays; returns (h, w) int32."""
    lib = _load()
    a = lambda v: np.ascontiguousarray(v, np.int32)
    llc, hlc, lhc, hhc = a(ll), a(hl), a(lh), a(hh)
    out = np.zeros((h, w), np.int32)
    I32P = ctypes.POINTER(ctypes.c_int32)
    rc = lib.grk_inv53_level(
        llc.ctypes.data_as(I32P), hlc.ctypes.data_as(I32P),
        lhc.ctypes.data_as(I32P), hhc.ctypes.data_as(I32P),
        llc.shape[1], llc.shape[0], w, h, x0, y0,
        out.ctypes.data_as(I32P))
    if rc != 0:
        raise RuntimeError("grk_inv53_level failed")
    return out


def encode_block(mag, neg, orient: int, style: int = 0, frac=None):
    """Native analog of t1_scalar.encode_block -> EncodedBlock."""
    from grok_tpu.t1.t1_scalar import EncodedBlock, PassInfo

    lib = _load()
    if lib is None:
        raise RuntimeError("native T1 not available")
    mag = np.ascontiguousarray(mag, np.int32)
    negb = np.ascontiguousarray(neg, np.uint8)
    h, w = mag.shape
    cap = w * h * 8 + 1024
    out = np.zeros(cap, np.uint8)
    rates = np.zeros(96, np.int32)
    dists = np.zeros(96, np.float64)
    terms = np.zeros(96, np.uint8)
    seg_lens = np.zeros(128, np.int32)
    seg_passes = np.zeros(128, np.int32)
    total_len = ctypes.c_int(0)
    nsegs = ctypes.c_int(0)
    numbps = ctypes.c_int(0)
    I32P = ctypes.POINTER(ctypes.c_int32)
    DP = ctypes.POINTER(ctypes.c_double)
    fr = None if frac is None else np.ascontiguousarray(frac, np.float64)
    npass = lib.grk_t1_encode(
        mag.ctypes.data_as(I32P),
        negb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        None if fr is None else fr.ctypes.data_as(DP),
        orient, w, h, style,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(total_len),
        rates.ctypes.data_as(I32P),
        dists.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        terms.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        seg_lens.ctypes.data_as(I32P), seg_passes.ctypes.data_as(I32P),
        ctypes.byref(nsegs), ctypes.byref(numbps))
    if npass < 0:
        raise RuntimeError("grk_t1_encode failed")
    if npass == 0:
        return EncodedBlock()
    passes = [PassInfo(rate=int(rates[i]), dist=float(dists[i]),
                       term=bool(terms[i])) for i in range(npass)]
    return EncodedBlock(data=bytes(out[:total_len.value]),
                        numbps=int(numbps.value), passes=passes,
                        seg_lens=[int(v) for v in
                                  seg_lens[:nsegs.value]],
                        seg_passes=[int(v) for v in
                                    seg_passes[:nsegs.value]])


def fwd53_level(x, x0, y0):
    """C forward 5/3 2D level -> (ll, hl, lh, hh) int32 arrays."""
    lib = _load()
    xin = np.ascontiguousarray(x, np.int32)
    h, w = xin.shape
    ylo = (h + (0 if (y0 & 1) else 1)) // 2
    xlo = (w + (0 if (x0 & 1) else 1)) // 2
    ll = np.zeros((ylo, xlo), np.int32)
    hl = np.zeros((ylo, w - xlo), np.int32)
    lh = np.zeros((h - ylo, xlo), np.int32)
    hh = np.zeros((h - ylo, w - xlo), np.int32)
    I32P = ctypes.POINTER(ctypes.c_int32)
    rc = lib.grk_fwd53_level(
        xin.ctypes.data_as(I32P), w, h, x0, y0,
        ll.ctypes.data_as(I32P), hl.ctypes.data_as(I32P),
        lh.ctypes.data_as(I32P), hh.ctypes.data_as(I32P))
    if rc != 0:
        raise RuntimeError("grk_fwd53_level failed")
    return ll, hl, lh, hh


def t2_prepare(ctxs_flat: list, packets: list[tuple[int, int]]):
    """Build the flat descriptor arrays grk_t2_parse consumes.  The result
    is reusable across streams of the same geometry (the serving path
    caches it in its per-geometry plan)."""
    n_ctx = len(ctxs_flat)
    ctx_style = np.zeros(n_ctx, np.int32)
    ctx_band_start = np.zeros(n_ctx + 1, np.int32)
    band_ttw, band_tth, band_blk_start = [], [], [0]
    blk_x, blk_y = [], []
    for ci, (style, bands) in enumerate(ctxs_flat):
        ctx_style[ci] = style
        ctx_band_start[ci + 1] = ctx_band_start[ci] + len(bands)
        for (tw, th_, xys) in bands:
            band_ttw.append(tw)
            band_tth.append(th_)
            band_blk_start.append(band_blk_start[-1] + len(xys))
            for (x, y) in xys:
                blk_x.append(x)
                blk_y.append(y)
    return (n_ctx, ctx_style, ctx_band_start,
            np.asarray(band_ttw, np.int32), np.asarray(band_tth, np.int32),
            np.asarray(band_blk_start, np.int32),
            np.asarray(blk_x, np.int32), np.asarray(blk_y, np.int32),
            np.asarray([p[0] for p in packets], np.int32),
            np.asarray([p[1] for p in packets], np.int32))


def t2_parse(body: bytes, ctxs_flat: list, packets: list[tuple[int, int]],
             sop: bool, eph: bool):
    """Native Tier-2 parse of a tile's whole packet sequence.

    ctxs_flat: list of (style, bands) per precinct context, each band a
    (tt_w, tt_h, [(x, y), ...]) tuple in decode order.
    packets: [(ctx_index, layer), ...] in progression order.
    Returns (blk_included, blk_zb, blk_numpasses, chunks ndarray (N, 6)
    [blk, layer, segno, numpasses, offset, length], body_pos) or None if
    the fast path declined (caller falls back to the Python parser).
    """
    lib = _load()
    if lib is None:
        return None
    return t2_parse_prepared(body, t2_prepare(ctxs_flat, packets), sop, eph)


def t2_parse_prepared(body: bytes, prep, sop: bool, eph: bool):
    """t2_parse over prebuilt descriptor arrays (see t2_prepare)."""
    lib = _load()
    if lib is None:
        return None
    (n_ctx, ctx_style, ctx_band_start, band_ttw, band_tth,
     band_blk_start, blk_x, blk_y, pkt_ctx, pkt_layer) = prep
    n_blks = len(blk_x)
    n_pkts = len(pkt_ctx)
    blk_included = np.zeros(n_blks, np.int32)
    blk_zb = np.zeros(n_blks, np.int32)
    blk_np = np.zeros(n_blks, np.int32)
    counts = np.zeros(2, np.int32)
    cap = max(256, n_blks * max(1, n_pkts // max(n_ctx, 1)) * 2 + 64)
    while True:
        chunks = np.zeros((cap, 6), np.int32)
        rc = lib.grk_t2_parse(
            body, len(body), n_ctx, _ip(ctx_style), _ip(ctx_band_start),
            _ip(band_ttw), _ip(band_tth), _ip(band_blk_start),
            _ip(blk_x), _ip(blk_y),
            n_pkts, _ip(pkt_ctx), _ip(pkt_layer),
            int(sop), int(eph),
            _ip(blk_included), _ip(blk_zb), _ip(blk_np),
            _ip(chunks), cap, _ip(counts))
        if rc == 3:          # chunk table overflow: grow and retry
            cap *= 4
            continue
        if rc != 0:
            return None
        break
    return (blk_included, blk_zb, blk_np, chunks[:counts[0]],
            int(counts[1]))


def encode_tile_blocks(jobs: list[dict]) -> list:
    """Batched (threaded) T1 encode of a tile's blocks -> EncodedBlock list.

    jobs: dicts with mag (h, w nonneg int), neg (bool), orient, style.
    Thread count: GROK_NUM_THREADS env, default = online CPUs.
    """
    from grok_tpu.t1.t1_scalar import EncodedBlock, PassInfo

    lib = _load()
    if lib is None:
        raise RuntimeError("native T1 not available")
    nb = len(jobs)
    if nb == 0:
        return []
    moff = np.zeros(nb, np.int64)
    ooff = np.zeros(nb, np.int64)
    ori = np.zeros(nb, np.int32)
    sty = np.zeros(nb, np.int32)
    bw = np.zeros(nb, np.int32)
    bh = np.zeros(nb, np.int32)
    tot_elems = 0
    tot_bytes = 0
    for i, j in enumerate(jobs):
        h, w = j["mag"].shape
        moff[i] = tot_elems
        ooff[i] = tot_bytes
        ori[i] = j["orient"]
        sty[i] = j["style"]
        bw[i] = w
        bh[i] = h
        tot_elems += h * w
        tot_bytes += 8 * h * w + 1024
    mag_flat = np.empty(tot_elems, np.int32)
    neg_flat = np.empty(tot_elems, np.uint8)
    any_frac = any(j.get("frac") is not None for j in jobs)
    frac_flat = np.zeros(tot_elems, np.float64) if any_frac else None
    for i, j in enumerate(jobs):
        n = int(bw[i]) * int(bh[i])
        mag_flat[moff[i]:moff[i] + n] = \
            np.ascontiguousarray(j["mag"], np.int32).ravel()
        neg_flat[moff[i]:moff[i] + n] = \
            np.ascontiguousarray(j["neg"], np.uint8).ravel()
        if any_frac and j.get("frac") is not None:
            frac_flat[moff[i]:moff[i] + n] = \
                np.ascontiguousarray(j["frac"], np.float64).ravel()
    out_flat = np.zeros(tot_bytes, np.uint8)
    total_len = np.zeros(nb, np.int32)
    rates = np.zeros(nb * 96, np.int32)
    dists = np.zeros(nb * 96, np.float64)
    terms = np.zeros(nb * 96, np.uint8)
    seg_lens = np.zeros(nb * 128, np.int32)
    seg_passes = np.zeros(nb * 128, np.int32)
    nsegs = np.zeros(nb, np.int32)
    numbps = np.zeros(nb, np.int32)
    npass = np.zeros(nb, np.int32)
    I32P = ctypes.POINTER(ctypes.c_int32)
    I64P = ctypes.POINTER(ctypes.c_longlong)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    DP = ctypes.POINTER(ctypes.c_double)
    rc = lib.grk_t1_encode_tile(
        mag_flat.ctypes.data_as(I32P), neg_flat.ctypes.data_as(U8P),
        None if frac_flat is None else frac_flat.ctypes.data_as(DP),
        moff.ctypes.data_as(I64P), _ip(ori), _ip(sty), _ip(bw), _ip(bh),
        nb, out_flat.ctypes.data_as(U8P), ooff.ctypes.data_as(I64P),
        _ip(total_len), _ip(rates),
        dists.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        terms.ctypes.data_as(U8P), _ip(seg_lens), _ip(seg_passes),
        _ip(nsegs), _ip(numbps), _ip(npass))
    if rc != 0:
        raise RuntimeError(f"grk_t1_encode_tile failed: {rc}")
    out = []
    for i in range(nb):
        np_ = int(npass[i])
        if np_ == 0:
            out.append(EncodedBlock())
            continue
        passes = [PassInfo(rate=int(rates[i * 96 + k]),
                           dist=float(dists[i * 96 + k]),
                           term=bool(terms[i * 96 + k]))
                  for k in range(np_)]
        ns = int(nsegs[i])
        out.append(EncodedBlock(
            data=bytes(out_flat[ooff[i]:ooff[i] + total_len[i]]),
            numbps=int(numbps[i]), passes=passes,
            seg_lens=[int(seg_lens[i * 128 + k]) for k in range(ns)],
            seg_passes=[int(seg_passes[i * 128 + k]) for k in range(ns)]))
    return out


def _llp(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))


def _u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def ht_scan2(body: bytes, off: np.ndarray, lens: np.ndarray):
    """Scan + split HT cleanup segments into clean sub-streams.

    Returns (out7 (n, 7) int32 [ok, ms_off, ms_len, suf_off, suf_len,
    n_ff, n_7f], digest uint8 array) — offsets index the digest; ok = 0
    for a valid framing, -1 otherwise.  None if the digest overflowed
    (never for well-formed input: capacity is 3*len + 16 per block)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not available")
    n = len(off)
    off = np.ascontiguousarray(off, np.int64)
    lens = np.ascontiguousarray(lens, np.int32)
    out = np.zeros((n, 7), np.int32)
    dcap = int(3 * int(lens.sum()) + 24 * n + 64)
    digest = np.zeros(dcap, np.uint8)
    used = ctypes.c_longlong(0)
    rc = lib.grk_ht_scan2(body, len(body), _llp(off), _ip(lens), n,
                          _ip(out), _u8p(digest), dcap,
                          ctypes.byref(used))
    if rc:
        return None
    return out, digest[:int(used.value)]


def ht_assemble_batch(buf: np.ndarray, ms_off, ms_bits, mel_off, mel_bits,
                      vlc_off, vlc_bits, pvals):
    """Assemble n wire cleanup segments from clean streams in `buf`
    (byte offsets / bit counts per stream; pvals[k] < 0 skips lane k).
    Returns (out bytes buffer uint8, lens (n,) int64) — segments are
    back-to-back; byte-identical to t1ht.scalar.assemble_cleanup."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not available")
    n = len(pvals)
    a = [np.ascontiguousarray(x, np.int64) for x in
         (ms_off, ms_bits, mel_off, mel_bits, vlc_off, vlc_bits)]
    pvals = np.ascontiguousarray(pvals, np.int32)
    buf = np.ascontiguousarray(buf, np.uint8)
    ocap = int((a[1].sum() + a[3].sum() + a[5].sum()) // 7
               + (a[1].sum() + a[3].sum() + a[5].sum() + 7) // 8
               + 32 * n + 64)
    out = np.zeros(ocap, np.uint8)
    olens = np.zeros(n, np.int64)
    rc = lib.grk_ht_assemble_batch(
        _u8p(buf), _llp(a[0]), _llp(a[1]), _llp(a[2]), _llp(a[3]),
        _llp(a[4]), _llp(a[5]), _ip(pvals), n, _u8p(out), ocap,
        _llp(olens))
    if rc:
        return None
    return out, olens


def ht_raw_batch(buf: np.ndarray, offs, bits):
    """Stuff n raw (HT SigProp / HT MagRef) clean streams into wire
    segments (0xFF stuffing + non-0xFF terminator), back-to-back.
    Returns (out uint8 buffer, lens (n,) int64); byte-identical to
    t1ht.scalar._finish_raw."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not available")
    n = len(offs)
    offs = np.ascontiguousarray(offs, np.int64)
    bits = np.ascontiguousarray(bits, np.int64)
    buf = np.ascontiguousarray(buf, np.uint8)
    ocap = int(bits.sum() // 7 + int(bits.sum() + 7) // 8 + 16 * n + 64)
    out = np.zeros(ocap, np.uint8)
    olens = np.zeros(n, np.int64)
    rc = lib.grk_ht_raw_batch(_u8p(buf), _llp(offs), _llp(bits), n,
                              _u8p(out), ocap, _llp(olens))
    if rc:
        raise ValueError("raw segment capacity overflow")
    return out, olens


def ht_assemble(ms, msbits: int, mel, melbits: int,
                vlc, vlcbits: int) -> bytes:
    """Single-segment clean -> wire assembly (C mirror of
    t1ht.scalar.assemble_cleanup)."""
    buf = np.concatenate([
        np.frombuffer(bytes(ms), np.uint8),
        np.frombuffer(bytes(mel), np.uint8),
        np.frombuffer(bytes(vlc), np.uint8),
        np.zeros(1, np.uint8)])
    o1, o2 = len(ms), len(ms) + len(mel)
    res = ht_assemble_batch(buf, [0], [msbits], [o1], [melbits],
                            [o2], [vlcbits], [0])
    if res is None:
        raise ValueError("HT cleanup suffix too long")
    out, olens = res
    return bytes(out[:int(olens[0])])


def t2_emit_prepare(ctxs: dict, ctx_keys: list):
    """Flatten the static emitter inputs (geometry, zero-bitplanes, pass
    rates/terms, codeword bytes) ONCE for a tile.  The result is reused
    across every layer allocation of the PCRD bisection and the final
    emission — only the per-layer pass counts (blk_lc) vary per call.
    Returns a dict, or None if any block state is missing."""
    n_ctx = len(ctx_keys)
    ctx_band_start = np.zeros(n_ctx + 1, np.int32)
    band_ttw, band_tth, band_blk_start = [], [], [0]
    blk_x, blk_y, blk_zb = [], [], []
    pass_off, pass_rates, pass_terms = [], [], []
    data_off = []
    data = bytearray()
    order = []                 # global block index -> (ctx_key, band, cblk)
    for ci, k in enumerate(ctx_keys):
        ctx = ctxs[k]
        ctx_band_start[ci + 1] = ctx_band_start[ci] + len(ctx.bands)
        for band_i, (_o, bp) in enumerate(ctx.bands):
            band_ttw.append(bp.cblk_grid_w)
            band_tth.append(bp.cblk_grid_h)
            band_blk_start.append(band_blk_start[-1] + len(bp.cblks))
            for cblk_i, g in enumerate(bp.cblks):
                st = ctx.eblocks[band_i][cblk_i]
                if st is None:
                    return None
                x, y = g.idx_in_prec
                blk_x.append(x)
                blk_y.append(y)
                blk_zb.append(st.zb)
                pass_off.append(len(pass_rates))
                for p in st.enc.passes:
                    pass_rates.append(p.rate)
                    pass_terms.append(1 if p.term else 0)
                data_off.append(len(data))
                data.extend(st.enc.data)
                order.append((k, band_i, cblk_i))
    a = lambda v, dt=np.int32: np.asarray(v or [0], dt)
    return dict(
        n_ctx=n_ctx, n_blks=len(blk_x),
        ctx_idx={k: i for i, k in enumerate(ctx_keys)},
        ctx_band_start=ctx_band_start,
        band_ttw=a(band_ttw), band_tth=a(band_tth),
        band_blk_start=np.asarray(band_blk_start, np.int32),
        blk_x=a(blk_x), blk_y=a(blk_y), blk_zb=a(blk_zb),
        pass_off=a(pass_off), pass_rates=a(pass_rates),
        pass_terms=np.asarray(pass_terms or [0], np.uint8),
        data_off=np.asarray(data_off or [0], np.int64),
        enc_data=bytes(data), order=order)


def t2_emit_prepared(prep: dict, pkt_ctx: np.ndarray, pkt_layer: np.ndarray,
                     blk_lc: np.ndarray, n_layers: int,
                     sop: bool, eph: bool):
    """Run the C emitter over prepared arrays.  blk_lc: (n_blks, n_layers)
    int32 cumulative passes per layer in GLOBAL block order.  Returns the
    list of packet byte strings, or None if the emitter declined."""
    lib = _load()
    if lib is None:
        return None
    n_pkts = len(pkt_ctx)
    blk_lc = np.ascontiguousarray(blk_lc, np.int32)
    pkt_lens = np.zeros(max(n_pkts, 1), np.int32)
    cap = (len(prep["enc_data"]) + n_pkts * 64
           + prep["n_blks"] * 24 + 65536)
    while True:
        out = np.zeros(cap, np.uint8)
        rc = lib.grk_t2_emit(
            prep["n_ctx"], _ip(prep["ctx_band_start"]),
            _ip(prep["band_ttw"]), _ip(prep["band_tth"]),
            _ip(prep["band_blk_start"]),
            _ip(prep["blk_x"]), _ip(prep["blk_y"]),
            n_pkts, _ip(pkt_ctx), _ip(pkt_layer),
            n_layers, int(sop), int(eph),
            _ip(prep["blk_zb"]), _ip(blk_lc),
            _ip(prep["pass_off"]), _ip(prep["pass_rates"]),
            prep["pass_terms"].ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            _llp(prep["data_off"]), prep["enc_data"],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_longlong(cap), _ip(pkt_lens))
        if rc == 3:
            cap *= 4
            continue
        if rc != 0:
            return None
        break
    pkts = []
    pos = 0
    buf = out.tobytes()
    for i in range(n_pkts):
        ln = int(pkt_lens[i])
        pkts.append(buf[pos:pos + ln])
        pos += ln
    return pkts


def t2_emit(ctxs: dict, ctx_keys: list, packets: list[tuple[int, int]],
            n_layers: int, sop: bool, eph: bool):
    """Native Tier-2 packet emission for a whole tile (one-shot wrapper
    over t2_emit_prepare + t2_emit_prepared; layer_cum read from the
    block states)."""
    lib = _load()
    if lib is None:
        return None
    prep = t2_emit_prepare(ctxs, ctx_keys)
    if prep is None:
        return None
    blk_lc = np.zeros((prep["n_blks"], n_layers), np.int32)
    for gi, (k, band_i, cblk_i) in enumerate(prep["order"]):
        lc = list(ctxs[k].eblocks[band_i][cblk_i].layer_cum)
        if len(lc) < n_layers:
            lc = lc + [lc[-1] if lc else 0] * (n_layers - len(lc))
        blk_lc[gi] = lc[:n_layers]
    pkt_ctx = np.asarray([p[0] for p in packets] or [0], np.int32)
    pkt_layer = np.asarray([p[1] for p in packets] or [0], np.int32)
    return t2_emit_prepared(prep, pkt_ctx[:len(packets)],
                            pkt_layer[:len(packets)], blk_lc, n_layers,
                            sop, eph)


def _dp(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def fwd97_level(x, x0: int, y0: int):
    """C forward 9/7 2D level (f64), bit-identical to dwt_np.fwd_2d_level."""
    lib = _load()
    xin = np.ascontiguousarray(x, np.float64)
    h, w = xin.shape
    ylo = (h + (0 if (y0 & 1) else 1)) // 2
    xlo = (w + (0 if (x0 & 1) else 1)) // 2
    ll = np.zeros((ylo, xlo), np.float64)
    hl = np.zeros((ylo, w - xlo), np.float64)
    lh = np.zeros((h - ylo, xlo), np.float64)
    hh = np.zeros((h - ylo, w - xlo), np.float64)
    rc = lib.grk_fwd97_level(_dp(xin), w, h, x0, y0,
                             _dp(ll), _dp(hl), _dp(lh), _dp(hh))
    if rc != 0:
        raise RuntimeError("grk_fwd97_level failed")
    return ll, hl, lh, hh


def inv97_level(ll, hl, lh, hh, w: int, h: int, x0: int, y0: int):
    """C inverse 9/7 2D level (f64), bit-identical to dwt_np.inv_2d_level."""
    lib = _load()
    llc = np.ascontiguousarray(ll, np.float64)
    hlc = np.ascontiguousarray(hl, np.float64)
    lhc = np.ascontiguousarray(lh, np.float64)
    hhc = np.ascontiguousarray(hh, np.float64)
    out = np.zeros((h, w), np.float64)
    rc = lib.grk_inv97_level(_dp(llc), _dp(hlc), _dp(lhc), _dp(hhc),
                             llc.shape[1], llc.shape[0], w, h, x0, y0,
                             _dp(out))
    if rc != 0:
        raise RuntimeError("grk_inv97_level failed")
    return out
