"""Stream-level fault tolerance (SURVEY.md §5): malformed and truncated
codestreams must degrade or error cleanly — never crash or hang."""

import numpy as np
import pytest

from grok_tpu import (CompressParams, DecompressParams, compress, decompress)
from grok_tpu.util.oracle import synthetic_image


@pytest.fixture(scope="module")
def stream():
    img = synthetic_image(96, 96, 1, seed=77)
    return img, compress(img, CompressParams(num_resolutions=4))


def test_truncation_ladder_never_crashes(stream):
    img, data = stream
    dp = DecompressParams(strict=False)
    prev = -1.0
    for frac in (0.95, 0.8, 0.6, 0.4, 0.2, 0.08, 0.03):
        out = decompress(data[:int(len(data) * frac)], dp).to_array()
        assert out.shape == img.shape


@pytest.mark.parametrize("seed", range(8))
def test_random_corruption_no_crash(stream, seed):
    img, data = stream
    rng = np.random.default_rng(seed)
    buf = bytearray(data)
    # corrupt a few bytes in the tile body (past the main header)
    for _ in range(4):
        pos = int(rng.integers(len(buf) // 3, len(buf)))
        buf[pos] = int(rng.integers(0, 256))
    try:
        out = decompress(bytes(buf), DecompressParams(strict=False))
        assert out.to_array().shape == img.shape
    except (ValueError, IndexError, KeyError):
        pass    # clean decode error is acceptable; crash/hang is not


def test_garbage_headers_rejected():
    for garbage in (b"", b"\x00" * 64, b"\xff\x4f" + bytes(range(50)),
                    b"\xff\x4f\xff\x51\x00\x03\x00"):
        with pytest.raises(Exception):
            decompress(garbage)


def test_dump_is_stable(stream):
    """compare_dump_files analog: dump output is deterministic and
    contains the structural facts."""
    import io

    from grok_tpu.cli.dump import dump_codestream
    _img, data = stream
    a, b = io.StringIO(), io.StringIO()
    dump_codestream(data, out=a, verbose=True)
    dump_codestream(data, out=b, verbose=True)
    assert a.getvalue() == b.getvalue()
    txt = a.getvalue()
    assert "SIZ: image [0,0]..[96,96]" in txt
    assert "resolutions=4" in txt
    assert "Tile parts: 1" in txt


def test_dump_json(stream):
    import json

    from grok_tpu.cli.dump import dump_json
    _img, data = stream
    doc = dump_json(data)
    json.dumps(doc)     # must be serializable
    assert doc["siz"]["image"] == [0, 0, 96, 96]
    assert doc["cod"]["num_resolutions"] == 4
    assert doc["cod"]["transform"] == "5/3"
    assert len(doc["tile_parts"]) == 1


def test_msg_handlers_surface(stream):
    from grok_tpu.util.msg import set_msg_handlers
    img, data = stream
    msgs = []
    set_msg_handlers(warning=msgs.append)
    try:
        decompress(data[:len(data) // 2], DecompressParams(strict=False))
    finally:
        set_msg_handlers()
    assert any("truncated" in m for m in msgs)


def test_batch_encode_resume(tmp_path):
    import json
    import os

    from grok_tpu.cli import compress as cc
    from grok_tpu.core.image import Image
    from grok_tpu.util.imageio import write_pnm
    din = tmp_path / "in"
    dout = tmp_path / "out"
    din.mkdir()
    for i in range(3):
        write_pnm(str(din / f"im{i}.pgm"),
                  Image.from_array(synthetic_image(32, 32, 1, seed=i)))
    assert cc.main(["-batch", str(din), "-out_dir", str(dout),
                    "-o", "x", "-n", "3"]) == 0
    manifest = json.loads((dout / ".grk_manifest.json").read_text())
    assert len(manifest) == 3
    (dout / "im1.jp2").unlink()
    keep = {p: p.stat().st_mtime for p in dout.glob("im[02].jp2")}
    assert cc.main(["-batch", str(din), "-out_dir", str(dout),
                    "-o", "x", "-n", "3"]) == 0
    assert (dout / "im1.jp2").exists()
    assert all(p.stat().st_mtime == t for p, t in keep.items())


def test_sop_resync_localizes_corruption():
    """B.10.5 error resilience: with SOP markers, a corrupt packet is
    rolled back and the parser resyncs at the next SOP; with snapshot
    rollback the damage stays local."""
    from grok_tpu.util.msg import set_msg_handlers
    img = synthetic_image(96, 96, 1, seed=44)
    p = CompressParams(num_resolutions=5, num_layers=3,
                       rates=[32.0, 8.0, 0.0], sop=True, eph=True)
    data = compress(img, p)
    assert np.array_equal(decompress(data).to_array(), img)
    pos = -1
    for _ in range(2):
        pos = data.find(b"\xff\x91", pos + 1)
    buf = bytearray(data)
    for k in range(6, 16):
        buf[pos + k] = 0xFF
    msgs = []
    set_msg_handlers(warning=msgs.append)
    try:
        out = decompress(bytes(buf),
                         DecompressParams(strict=False)).to_array()
    finally:
        set_msg_handlers()
    assert any("resync" in m for m in msgs)
    from grok_tpu.util.oracle import psnr
    assert psnr(out, img) > 20.0       # one packet lost, not the stream


def test_truncated_jp2_container_permissive():
    """A JP2 cut mid-jp2c must decode what is present with strict=False
    and raise cleanly with strict=True."""
    img = synthetic_image(96, 96, 1, seed=5)
    d = compress(img, CompressParams(num_resolutions=4, jp2=True))
    cut = d[:len(d) * 2 // 3]
    out = decompress(cut, DecompressParams(strict=False))
    assert out.to_array().shape == (96, 96)
    with pytest.raises(Exception):
        decompress(cut)


def test_dump_packet_index_matches_plt():
    from grok_tpu.cli.dump import tile_packet_index
    from grok_tpu.codestream import j2k
    img = synthetic_image(128, 128, 1, seed=3)
    d = compress(img, CompressParams(num_resolutions=4, num_layers=2,
                                     rates=[8, 0], write_plt=True))
    hdr = j2k.read_main_header(d)
    parts = j2k.read_tile_parts(d, hdr)
    th = j2k.TileHeader()
    j2k.read_tile_part_header(d, parts[0], hdr, th)
    idx = list(tile_packet_index(d, hdr, parts, 0))
    assert [ln for (_, _, _, ln) in idx] == th.plt
    assert sum(ln for (_, _, _, ln) in idx) == \
        parts[0].data_end - parts[0].data_start


def test_zero_subsampling_rejected_cleanly():
    """Round-5 fuzz finding (case 67395): a corrupt SIZ with XRsiz or
    YRsiz == 0 reached the canvas division (ZeroDivisionError).  A.5.1
    bounds them to [1, 255]; both modes must raise the sanctioned
    CodestreamError."""
    import numpy as np
    import pytest

    from grok_tpu import CompressParams, DecompressParams, compress, \
        decompress
    from grok_tpu.codestream.j2k import CodestreamError
    from grok_tpu.util.oracle import synthetic_image

    data = bytearray(compress(synthetic_image(32, 32, 1, seed=1),
                              CompressParams(num_resolutions=2)))
    # SIZ: FF51 len(2) Rsiz(2) Xsiz(4) Ysiz(4) XOsiz(4) YOsiz(4)
    # XTsiz(4) YTsiz(4) XTOsiz(4) YTOsiz(4) Csiz(2) then per-comp
    # Ssiz(1) XRsiz(1) YRsiz(1) — zero the first component's YRsiz
    pos = bytes(data).find(b"\xff\x51")
    yr = pos + 4 + 2 + 8 * 4 + 2 + 2
    assert data[yr] == 1
    data[yr] = 0
    for strict in (True, False):
        with pytest.raises(CodestreamError):
            decompress(bytes(data), DecompressParams(strict=strict))
