"""Post-decode image operations: palette, cdef, upsample, force-rgb, ICC.

[grok: FileFormatDecompress color handling + GrkDecompress post-ops]
"""

import io
import struct

import numpy as np

from grok_tpu.api import compress, decompress
from grok_tpu.codestream.jp2 import JP2_SIGNATURE, _box
from grok_tpu.core.image import Component, Image
from grok_tpu.core.params import CompressParams, DecompressParams


def _jp2(cs: bytes, jp2h_boxes: bytes) -> bytes:
    ftyp = _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    return JP2_SIGNATURE + ftyp + _box(b"jp2h", jp2h_boxes) + \
        _box(b"jp2c", cs)


def test_palette_cmap_expansion():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 7, (40, 40)).astype(np.int32)
    pal = rng.integers(0, 256, (7, 3)).astype(np.int64)
    cs = compress(Image.from_array(idx, prec=8),
                  CompressParams(num_resolutions=3))
    ihdr = _box(b"ihdr", struct.pack(">IIHBBBB", 40, 40, 1, 7, 7, 0, 0))
    colr = _box(b"colr", struct.pack(">BBBI", 1, 0, 0, 16))
    pclr = struct.pack(">HB", 7, 3) + bytes([7, 7, 7])
    for row in pal:
        pclr += bytes(int(v) for v in row)
    cmap = _box(b"cmap", b"".join(struct.pack(">HBB", 0, 1, c)
                                  for c in range(3)))
    data = _jp2(cs, ihdr + colr + _box(b"pclr", pclr) + cmap)
    out = decompress(data)
    assert len(out.components) == 3
    expect = pal[idx]
    assert np.array_equal(out.to_array(), expect)
    # the oracle's view of the same file agrees
    from PIL import Image as PILImage
    pim = PILImage.open(io.BytesIO(data)).convert("RGB")
    assert np.array_equal(np.asarray(pim).astype(np.int64), expect)


def test_cdef_channel_reorder():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (24, 24, 4)).astype(np.int32)
    stored = np.stack([px[..., 3], px[..., 2], px[..., 1], px[..., 0]],
                      axis=-1)                    # stored as A,B,G,R
    cs = compress(Image.from_array(stored, prec=8),
                  CompressParams(num_resolutions=3))
    ihdr = _box(b"ihdr", struct.pack(">IIHBBBB", 24, 24, 4, 7, 7, 0, 0))
    colr = _box(b"colr", struct.pack(">BBBI", 1, 0, 0, 16))
    cdef = _box(b"cdef", struct.pack(">H", 4) +
                struct.pack(">HHH", 0, 1, 0) +    # ch0 = alpha
                struct.pack(">HHH", 1, 0, 3) +    # ch1 -> B
                struct.pack(">HHH", 2, 0, 2) +    # ch2 -> G
                struct.pack(">HHH", 3, 0, 1))     # ch3 -> R
    out = decompress(_jp2(cs, ihdr + colr + cdef))
    assert np.array_equal(out.to_array(), px)     # back to R,G,B,A


def test_upsample_and_force_rgb():
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (32, 32)).astype(np.int32)
    cb = rng.integers(0, 256, (16, 16)).astype(np.int32)
    img = Image(components=[Component(data=y, dx=1, dy=1, prec=8),
                            Component(data=cb, dx=2, dy=2, prec=8),
                            Component(data=cb.copy(), dx=2, dy=2, prec=8)])
    d = compress(img, CompressParams(num_resolutions=3))
    out = decompress(d, DecompressParams(upsample=True))
    assert all(c.data.shape == (32, 32) and c.dx == c.dy == 1
               for c in out.components)
    assert np.array_equal(out.components[1].data[::2, ::2], cb)

    g = rng.integers(0, 256, (20, 20)).astype(np.int32)
    d2 = compress(Image.from_array(g, prec=8),
                  CompressParams(num_resolutions=2))
    out2 = decompress(d2, DecompressParams(force_rgb=True))
    assert len(out2.components) == 3
    assert all(np.array_equal(c.data, g) for c in out2.components)


def test_apply_icc_srgb_and_garbage():
    from PIL import ImageCms
    prof = ImageCms.ImageCmsProfile(ImageCms.createProfile("sRGB")).tobytes()
    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (32, 32, 3)).astype(np.int32)
    img = Image.from_array(px, prec=8)
    img.icc_profile = prof
    d = compress(img, CompressParams(num_resolutions=3, jp2=True))
    out = decompress(d, DecompressParams(apply_icc=True)).to_array()
    assert np.abs(out - px).max() <= 1            # sRGB->sRGB ~identity
    img2 = Image.from_array(px, prec=8)
    img2.icc_profile = b"not an icc profile"
    d2 = compress(img2, CompressParams(num_resolutions=3, jp2=True))
    out2 = decompress(d2, DecompressParams(apply_icc=True))
    assert np.array_equal(out2.to_array(), px)    # graceful fallback


def test_pam_io_and_initialize(tmp_path):
    import grok_tpu
    from grok_tpu.util.imageio import read_image, write_image
    assert grok_tpu.initialize(2) in (True, False)
    import os
    assert os.environ.get("GROK_NUM_THREADS") == "2"
    grok_tpu.initialize(0)
    grok_tpu.deinitialize()
    rng = np.random.default_rng(0)
    for depth in (1, 2, 3, 4):
        px = rng.integers(0, 256, (11, 13, depth)).astype(np.int32)
        img = Image.from_array(px if depth > 1 else px[..., 0], prec=8)
        p = str(tmp_path / f"t{depth}.pam")
        write_image(p, img)
        back = read_image(p)
        assert len(back.components) == depth
        for i in range(depth):
            assert np.array_equal(back.components[i].data, px[..., i])
