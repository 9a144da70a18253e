"""Object-lifecycle API (Decompressor) + jax-backend pipeline coverage."""

import numpy as np

from grok_tpu import CompressParams, DecompressParams, compress, decompress
from grok_tpu.codec import Decompressor
from grok_tpu.util.oracle import psnr, synthetic_image


def test_decompressor_lifecycle_and_tile_cache():
    img = synthetic_image(96, 96, 1, seed=70)
    data = compress(img, CompressParams(num_resolutions=3, tile_w=32,
                                        tile_h=32))
    dec = Decompressor(data)
    assert dec.num_tiles == 9
    assert (dec.header.width, dec.header.height) == (96, 96)
    t4 = dec.decompress_tile(4)[0]
    assert np.array_equal(t4, img[32:64, 32:64])
    assert dec.cache_info()["tiles_cached"] == 1
    t4b = dec.decompress_tile(4)[0]       # cached path
    assert t4b is t4
    full = dec.decompress().to_array()
    assert np.array_equal(full, img)


def test_jax_backend_full_pipeline():
    img = synthetic_image(64, 64, 1, seed=5)
    data = compress(img, CompressParams(num_resolutions=3))
    out = decompress(data, DecompressParams(backend="jax")).to_array()
    assert np.array_equal(out, img)


def test_jax_backend_lossy_matches_scalar():
    img = synthetic_image(64, 64, 1, seed=6)
    data = compress(img, CompressParams(num_resolutions=3,
                                        irreversible=True, rates=[8.0]))
    a = decompress(data).to_array()
    b = decompress(data, DecompressParams(backend="jax")).to_array()
    assert np.array_equal(a, b)


def test_tlm_seeded_tile_part_framing():
    """TLM-present streams frame tile-parts by signalled lengths; a
    corrupt TLM falls back to the SOT scan with identical results."""
    import numpy as np

    from grok_tpu.api import compress, decompress
    from grok_tpu.codestream import j2k
    from grok_tpu.core.params import CompressParams
    from grok_tpu.util.oracle import synthetic_image
    img = synthetic_image(128, 128, 1, seed=4)
    d = compress(img, CompressParams(num_resolutions=3, tile_w=64,
                                     tile_h=64, write_tlm=True))
    hdr = j2k.read_main_header(d)
    assert hdr.tlm
    via_tlm = j2k.tile_parts_from_tlm(d, hdr)
    assert via_tlm is not None and len(via_tlm) == 4
    hdr_noscan = j2k.read_main_header(d)
    hdr_noscan.tlm = []
    scan = j2k.read_tile_parts(d, hdr_noscan)
    assert [(p.tile_index, p.data_start, p.data_end) for p in via_tlm] \
        == [(p.tile_index, p.data_start, p.data_end) for p in scan]
    bad = bytearray(d)
    i = bad.find(b"\xff\x55")
    bad[i + 8] ^= 0x40
    hdr3 = j2k.read_main_header(bytes(bad))
    assert j2k.tile_parts_from_tlm(bytes(bad), hdr3) is None
    assert np.array_equal(decompress(bytes(bad)).to_array(), img)


def test_plt_seeded_packet_skip():
    """With PLT lengths, window/reduce/layer-limited decode skips
    non-contributing packets without parsing; results must be identical
    to the full parse."""
    import numpy as np

    from grok_tpu.api import compress, decompress
    from grok_tpu.core.params import CompressParams, DecompressParams
    from grok_tpu.util.oracle import synthetic_image
    img = synthetic_image(256, 256, 1, seed=9)
    kw = dict(num_resolutions=5, num_layers=3, rates=[8, 2, 0],
              prec_w_exps=[6] * 5, prec_h_exps=[6] * 5)
    d = compress(img, CompressParams(write_plt=True, **kw))
    d0 = compress(img, CompressParams(**kw))
    for dp_kw in (dict(window=(10, 10, 70, 70)), dict(reduce=2),
                  dict(max_layers=1),
                  dict(window=(200, 200, 256, 256), reduce=1,
                       max_layers=2)):
        a = decompress(d, DecompressParams(**dp_kw)).to_array()
        b = decompress(d0, DecompressParams(**dp_kw)).to_array()
        assert np.array_equal(a, b), dp_kw
    # full decode unaffected
    assert np.array_equal(decompress(d).to_array(), img)


def test_plm_main_header_packet_lengths():
    """PLM (A.4.6): packet lengths signalled in the MAIN header drive
    the same packet skipping as PLT; oracle still decodes the stream."""
    import numpy as np

    from grok_tpu.api import compress, decompress
    from grok_tpu.codestream import j2k
    from grok_tpu.core.params import CompressParams, DecompressParams
    from grok_tpu.util.oracle import oracle_decode, synthetic_image
    img = synthetic_image(256, 256, 1, seed=9)
    kw = dict(num_resolutions=5, num_layers=2, rates=[4, 0],
              prec_w_exps=[6] * 5, prec_h_exps=[6] * 5,
              tile_w=128, tile_h=128)
    d = compress(img, CompressParams(write_plm=True, **kw))
    d0 = compress(img, CompressParams(**kw))
    hdr = j2k.read_main_header(d)
    assert len(hdr.plm) == 4                 # one list per tile-part
    assert np.array_equal(decompress(d).to_array(), img)
    for dpkw in (dict(window=(10, 10, 70, 70)), dict(reduce=2),
                 dict(max_layers=1)):
        a = decompress(d, DecompressParams(**dpkw)).to_array()
        b = decompress(d0, DecompressParams(**dpkw)).to_array()
        assert np.array_equal(a, b), dpkw
    assert np.array_equal(oracle_decode(d), img)


def test_crg_marker_roundtrip():
    """CRG (A.4.7) parses into hdr.crg and never disturbs decode."""
    import numpy as np

    from grok_tpu.api import compress, decompress
    from grok_tpu.codestream import j2k
    from grok_tpu.core.params import CompressParams
    from grok_tpu.util.oracle import synthetic_image
    img = synthetic_image(48, 48, 1, seed=0)
    d = compress(img, CompressParams(num_resolutions=3))
    siz_end = 4 + int.from_bytes(d[4:6], "big")
    d2 = d[:siz_end] + j2k.write_crg([(32768, 16384)]) + d[siz_end:]
    hdr = j2k.read_main_header(d2)
    assert hdr.crg == [(32768, 16384)]
    assert np.array_equal(decompress(d2).to_array(), img)


def test_decompressor_mmap_path_source(tmp_path):
    """Opening by path memory-maps the file; tile access + full decode
    match the bytes-source decoder; close() releases the mapping."""
    import numpy as np

    from grok_tpu.api import compress
    from grok_tpu.codec import Decompressor
    from grok_tpu.core.params import CompressParams
    from grok_tpu.util.oracle import synthetic_image
    img = synthetic_image(192, 192, 1, seed=8)
    d = compress(img, CompressParams(num_resolutions=3, tile_w=64,
                                     tile_h=64, write_tlm=True))
    p = tmp_path / "t.j2k"
    p.write_bytes(d)
    with Decompressor(str(p)) as dec:
        assert dec.num_tiles == 9
        out = dec.decompress_tile(4)
        assert np.array_equal(out[0], img[64:128, 64:128])
        assert np.array_equal(dec.decompress().to_array(), img)


class TestStreamingCompressor:
    """opj_write_tile-analog surface: tile-incremental encode with the
    sidecar resume manifest (SURVEY §1.1, §5 checkpoint/resume)."""

    def _tiles(self, img, ntx, tw):
        for t in range(100):
            ty, tx = divmod(t, ntx)
            sub = img[ty * tw:(ty + 1) * tw, tx * tw:(tx + 1) * tw]
            if sub.size == 0:
                return
            yield t, sub

    def test_byte_identical_and_resumable(self, tmp_path):
        from grok_tpu.api import compress, decompress
        from grok_tpu.codec import Compressor
        from grok_tpu.core.params import CompressParams
        from grok_tpu.util.oracle import synthetic_image

        img = synthetic_image(256, 192, 1, seed=9)
        cp = CompressParams(tile_w=64, tile_h=64, num_resolutions=3,
                            write_tlm=True)
        ref = compress(img, cp)
        ntx = 3

        p = str(tmp_path / "s.j2k")
        enc = Compressor(p, width=192, height=256, numcomps=1, params=cp)
        for t in range(enc.num_tiles):
            ty, tx = divmod(t, ntx)
            enc.write_tile(t, img[ty * 64:(ty + 1) * 64,
                                  tx * 64:(tx + 1) * 64])
        enc.finish()
        got = open(p, "rb").read()
        assert got == ref
        assert np.array_equal(decompress(got).to_array(), img)

        # crash after 4 tiles -> resume -> identical bytes
        p2 = str(tmp_path / "r.j2k")
        enc = Compressor(p2, width=192, height=256, numcomps=1, params=cp)
        for t in range(4):
            ty, tx = divmod(t, ntx)
            enc.write_tile(t, img[ty * 64:(ty + 1) * 64,
                                  tx * 64:(tx + 1) * 64])
        enc._fh.close()
        enc2 = Compressor(p2, width=192, height=256, numcomps=1, params=cp,
                          resume=True)
        assert sum(enc2.tile_written(t)
                   for t in range(enc2.num_tiles)) == 4
        for t in range(enc2.num_tiles):
            ty, tx = divmod(t, ntx)
            enc2.write_tile(t, img[ty * 64:(ty + 1) * 64,
                                   tx * 64:(tx + 1) * 64])
        enc2.finish()
        assert open(p2, "rb").read() == ref

    def test_rejects_whole_stream_features(self, tmp_path):
        import pytest

        from grok_tpu.codec import Compressor
        from grok_tpu.core.params import CompressParams

        with pytest.raises(ValueError):
            Compressor(str(tmp_path / "x.j2k"), width=64, height=64,
                       params=CompressParams(write_ppm=True))


def test_decompressor_applies_jp2_metadata():
    """Regression: Decompressor.decompress() used to pass the bare
    codestream to the one-shot path, dropping JP2 color metadata
    (palette/cdef/ICC/color space)."""
    from grok_tpu import (CompressParams, Decompressor, compress,
                          decompress)
    from grok_tpu.util.oracle import synthetic_image
    img = synthetic_image(48, 56, 4, seed=8)         # RGBA -> cdef box
    data = compress(img, CompressParams(num_resolutions=3, jp2=True))
    ref = decompress(data)
    with Decompressor(data) as dec:
        got = dec.decompress()
    assert got.color_space == ref.color_space
    assert len(got.components) == len(ref.components)
    import numpy as np
    assert np.array_equal(got.to_array(), ref.to_array())
