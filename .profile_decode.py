import time, numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from grok_tpu import compress, decompress, CompressParams, DecompressParams
from grok_tpu.util.oracle import synthetic_image
from grok_tpu.codestream import j2k
from grok_tpu.pipeline import tile as tp
from grok_tpu.pipeline.device import run_device_decode, _build_decode_fn

img = synthetic_image(512, 512, 1, seed=7)
data = compress(img, CompressParams(num_resolutions=5))
dp = DecompressParams(backend="jax")

hdr = j2k.read_main_header(data)
parts = j2k.read_tile_parts(data, hdr)
th = j2k.TileHeader(); j2k.read_tile_part_header(data, parts[0], hdr, th)
body = data[parts[0].data_start:parts[0].data_end]
geo = tp.TileGeometry.build(hdr, 0, th)

# warmup full
out = decompress(data, dp)

t0 = time.perf_counter()
hdr2 = j2k.read_main_header(data)
parts2 = j2k.read_tile_parts(data, hdr2)
t_hdr = time.perf_counter() - t0

# T2 parse timing: replicate decode_tile's packet loop
from grok_tpu.codestream.bitio import BitReader
from grok_tpu.t2.progression import iter_packets
t0 = time.perf_counter()
geo2 = tp.TileGeometry.build(hdr, 0, th)
ctxs = geo2.make_contexts()
pos = 0
for pc in iter_packets(geo2.tcgs, geo2.subsampling, geo2.cod.num_layers, geo2.cod.prog_order, geo2.rect.x0, geo2.rect.y0, None):
    ctx = ctxs[(pc.comp, pc.res, pc.prec)]
    br = BitReader(body, pos)
    n0 = [len(st.chunks) for bl in ctx.dblocks for st in bl]
    blen = ctx.decode_packet(br, pc.layer, 0)
    base = br.pos
    it = iter(n0)
    for bl in ctx.dblocks:
        for st in bl:
            k = next(it)
            for ch in st.chunks[k:]: ch.offset += base
    pos = base + blen
t_t2 = time.perf_counter() - t0

# jobs assembly
t0 = time.perf_counter()
jobs = []
for c, tcg in enumerate(geo2.tcgs):
    quant = geo2.quants[c]
    cs = geo2.styles[c]
    for rg in tcg.resolutions:
        for band_i, bg in enumerate(rg.bands):
            mb = quant.mb(rg.r, bg.orient)
            for p in range(rg.num_precincts):
                ctx = ctxs[(c, rg.r, p)]
                bp_ = ctx.bands[band_i][1]
                for cblk_i, cb in enumerate(bp_.cblks):
                    st = ctx.dblocks[band_i][cblk_i]
                    if not st.included: continue
                    d, lens, npass = st.assemble(body, 0)
                    if npass <= 0: continue
                    jobs.append(dict(data=d, seg_lens=lens, numpasses=npass,
                                     numbps=mb-st.zb, orient=bg.orient,
                                     w=cb.rect.w, h=cb.rect.h, style=0,
                                     comp=c, res=rg.r, band_i=band_i, rect=cb.rect))
t_jobs = time.perf_counter() - t0
print(f"njobs={len(jobs)} sizes={sorted(set((j['w'],j['h']) for j in jobs))}")

# device call (includes upload+exec+download)
t0 = time.perf_counter()
res = run_device_decode(jobs, geo2, hdr, dp)
t_dev = time.perf_counter() - t0
t0 = time.perf_counter()
res = run_device_decode(jobs, geo2, hdr, dp)
t_dev2 = time.perf_counter() - t0

print(f"hdr={t_hdr*1e3:.0f}ms t2={t_t2*1e3:.0f}ms jobs={t_jobs*1e3:.0f}ms dev(first)={t_dev*1e3:.0f}ms dev(again)={t_dev2*1e3:.0f}ms")
