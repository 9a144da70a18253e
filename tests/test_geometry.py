"""Canvas geometry: tiles, resolutions, bands, precincts, code-blocks."""

from grok_tpu.core.geometry import (
    BAND_HH, BAND_HL, BAND_LH, BAND_LL, Rect, SizGrid, band_rect,
    build_tilecomp_geometry,
)


def test_single_tile_grid():
    g = SizGrid(xsiz=512, ysiz=512).normalized()
    assert g.num_tiles == 1
    assert g.tile_rect(0) == Rect(0, 0, 512, 512)


def test_tile_grid_with_offsets():
    g = SizGrid(xsiz=1000, ysiz=600, xosiz=10, yosiz=20,
                xtsiz=256, ytsiz=256)
    assert g.num_tiles_x == 4 and g.num_tiles_y == 3
    assert g.tile_rect(0) == Rect(10, 20, 256, 256)
    assert g.tile_rect(3) == Rect(768, 20, 1000, 256)
    last = g.tile_rect(g.num_tiles - 1)
    assert last == Rect(768, 512, 1000, 600)


def test_band_rects_partition_coefficients():
    """Across all levels, band sample counts must sum to tile-comp samples."""
    for rect in [Rect(0, 0, 512, 512), Rect(3, 5, 101, 77), Rect(17, 1, 120, 129)]:
        nl = 3
        total = 0
        # LL of resolution 0
        ll = band_rect(rect, nl, 0, BAND_LL)
        total += ll.w * ll.h
        for r in range(1, nl + 1):
            for orient in (BAND_HL, BAND_LH, BAND_HH):
                b = band_rect(rect, nl, r, orient)
                total += b.w * b.h
        assert total == rect.w * rect.h


def test_tilecomp_tree_default_precincts():
    tcg = build_tilecomp_geometry(Rect(0, 0, 512, 512), num_resolutions=6,
                                  cblk_w_exp=6, cblk_h_exp=6)
    assert len(tcg.resolutions) == 6
    r0 = tcg.resolutions[0]
    assert r0.rect == Rect(0, 0, 16, 16)
    assert r0.num_precincts == 1
    assert len(r0.bands) == 1 and r0.bands[0].orient == BAND_LL
    r5 = tcg.resolutions[5]
    assert r5.rect == Rect(0, 0, 512, 512)
    assert [b.orient for b in r5.bands] == [BAND_HL, BAND_LH, BAND_HH]
    # each band of r5 is 256x256 -> 4x4 code-blocks of 64x64
    for b in r5.bands:
        assert b.rect.w == 256 and b.rect.h == 256
        assert len(b.precincts) == 1
        p = b.precincts[0]
        assert p.cblk_grid_w == 4 and p.cblk_grid_h == 4
        assert len(p.cblks) == 16
        assert all(cb.rect.w == 64 and cb.rect.h == 64 for cb in p.cblks)


def test_tilecomp_tree_explicit_precincts():
    prec = [(6, 6)] * 4
    tcg = build_tilecomp_geometry(Rect(0, 0, 256, 256), num_resolutions=4,
                                  cblk_w_exp=6, cblk_h_exp=6, prec_exps=prec)
    r3 = tcg.resolutions[3]
    # resolution 256x256, precincts 64x64 -> 4x4 precincts
    assert r3.num_prec_x == 4 and r3.num_prec_y == 4
    # effective cblk in band coords: min(6, 6-1) = 5 -> 32x32
    assert r3.cblk_w_exp == 5
    for b in r3.bands:
        # band is 128x128; each precinct covers 32x32 band samples = 1 cblk
        for p in b.precincts:
            assert p.cblk_grid_w == 1 and p.cblk_grid_h == 1


def test_cblk_count_covers_band():
    tcg = build_tilecomp_geometry(Rect(5, 3, 300, 200), num_resolutions=5,
                                  cblk_w_exp=5, cblk_h_exp=5)
    for rg in tcg.resolutions:
        for bg in rg.bands:
            area = sum(cb.rect.w * cb.rect.h
                       for p in bg.precincts for cb in p.cblks)
            assert area == bg.rect.w * bg.rect.h


def test_odd_rects_no_empty_cblks():
    tcg = build_tilecomp_geometry(Rect(1, 1, 2, 2), num_resolutions=2,
                                  cblk_w_exp=6, cblk_h_exp=6)
    for rg in tcg.resolutions:
        for bg in rg.bands:
            for p in bg.precincts:
                for cb in p.cblks:
                    assert not cb.rect.empty
