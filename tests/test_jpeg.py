"""Baseline JPEG codec (TIFF compression 7) tests: spec goldens for the
canonical Huffman assignment, block-constant bit-exactness (the oracle
gate's property), lossy-error bounds on general images, restart markers,
abbreviated JPEGTables streams, the full TIFF layout matrix, catalog and
HTTP-transport parity, and fail-louds for every unsupported JPEG flavor.

Reference parity: the reference reads JPEG-in-TIFF through GDAL
(gdal/src/main/scala/geotrellis/contrib/vlm/gdal/GDALRasterSource.scala);
this engine decodes it from scratch (jpegcodec.py, ITU-T T.81)."""
import numpy as np
import pytest

from geotrellis_contrib_spark.sources import geotiff as GT
from geotrellis_contrib_spark.sources import jpegcodec as J

Q1 = np.ones((8, 8), dtype=np.int64)


def test_entropy_golden_all_128_block():
    """Spec golden pinning the canonical Huffman assignment (T.81 Annex
    C + K.3.1): a single all-128 block is DC diff 0 (category 0, code
    '00') + EOB (code '1010'), padded with 1-bits -> exactly 0x2B."""
    arr = np.full((8, 8), 128, dtype=np.uint8)
    s = J.jpeg_encode_gray(arr, Q1, inline_tables=False)
    # strip SOI(2) SOF0(2+19... no tables) SOS(2+8) header and EOI
    i = s.find(b"\xff\xda")
    assert i > 0
    ln = int.from_bytes(s[i + 2:i + 4], "big")
    entropy = s[i + 2 + ln:-2]
    assert entropy == b"\x2b"
    assert (J.jpeg_decode_gray(s, J.jpeg_tables_stream(Q1)) == arr).all()


def test_block_constant_bit_exact_and_general_bound():
    rng = np.random.default_rng(11)
    corner = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    bc = np.repeat(np.repeat(corner, 8, 0), 8, 1)
    assert (J.jpeg_decode_gray(J.jpeg_encode_gray(bc, Q1)) == bc).all()
    # general image: unit quant keeps the roundtrip within +-1
    g = rng.integers(0, 256, (50, 70), dtype=np.uint8)  # non-8-multiple
    d = J.jpeg_decode_gray(J.jpeg_encode_gray(g, Q1))
    assert d.shape == g.shape
    assert np.abs(d.astype(int) - g.astype(int)).max() <= 1
    # standard Annex-K table: lossy but decodes, smooth ramp stays close
    ramp = np.add.outer(np.arange(64), np.arange(64)).astype(np.uint8)
    d2 = J.jpeg_decode_gray(J.jpeg_encode_gray(ramp, J.STD_QUANT_LUMA))
    assert np.abs(d2.astype(int) - ramp.astype(int)).max() <= 12


def test_restart_markers_roundtrip_and_order_check():
    rng = np.random.default_rng(5)
    bc = np.repeat(np.repeat(
        rng.integers(0, 256, (4, 6), dtype=np.uint8), 8, 0), 8, 1)
    s = J.jpeg_encode_gray(bc, Q1, restart_interval=3)
    assert b"\xff\xd0" in s  # RST0 present
    assert (J.jpeg_decode_gray(s) == bc).all()
    # corrupt the first RST marker's index -> out-of-order fail-loud
    bad = bytearray(s)
    i = bad.find(b"\xff\xd0")
    bad[i + 1] = 0xD5
    with pytest.raises(ValueError, match="out of order"):
        J.jpeg_decode_gray(bytes(bad))


def test_fail_louds():
    arr = np.full((8, 8), 77, dtype=np.uint8)
    s = J.jpeg_encode_gray(arr, Q1, inline_tables=True)
    # progressive
    bad = bytearray(s)
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        J.jpeg_decode_gray(bytes(bad))
    # 12-bit precision
    bad = bytearray(s)
    bad[i + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        J.jpeg_decode_gray(bytes(bad))
    # unsupported component count (3 is now the YCbCr color surface)
    bad = bytearray(s)
    bad[i + 9] = 2
    with pytest.raises(ValueError, match="component count"):
        J.jpeg_decode_gray(bytes(bad))
    # subsampled component
    bad = bytearray(s)
    bad[i + 11] = 0x22
    with pytest.raises(ValueError, match="sampling"):
        J.jpeg_decode_gray(bytes(bad))
    # abbreviated stream without JPEGTables
    abbrev = J.jpeg_encode_gray(arr, Q1, inline_tables=False)
    with pytest.raises(ValueError, match="missing Huffman"):
        J.jpeg_decode_gray(abbrev)
    # bad dtype / shape at encode
    with pytest.raises(ValueError, match="uint8"):
        J.jpeg_encode_gray(arr.astype(np.int16), Q1)
    with pytest.raises(ValueError, match="2-D"):
        J.jpeg_encode_gray(arr[None, :, :], Q1)
    with pytest.raises(ValueError, match="quant"):
        J.jpeg_encode_gray(arr, np.zeros((8, 8), dtype=np.int64))


def _block_constant_scene(seed=3, nb=2, hw=256):
    rng = np.random.default_rng(seed)
    corner = rng.integers(1, 256, (nb, hw // 8, hw // 8), dtype=np.uint8)
    return np.repeat(np.repeat(corner, 8, 1), 8, 2)


@pytest.mark.parametrize("kw", [
    dict(byteorder="<", overviews=1),
    dict(byteorder=">", jpeg_tables_tag=False),
    dict(cog=True, jpeg_restart=5),
    dict(strips=True),
    dict(bigtiff=True),
])
def test_tiff_jpeg_layout_matrix(tmp_path, kw):
    img = _block_constant_scene()
    p = str(tmp_path / "j.tif")
    GT.write_geotiff(p, img, (0, 0, 256, 256), epsg=3857, nodata=0.0,
                     tile_size=64, compress="jpeg", jpeg_quant=Q1, **kw)
    arr, info = GT.read_geotiff(p)
    assert info["ifds"][0]["compression"] == 7
    assert (arr == img).all()
    expect_tag = kw.get("jpeg_tables_tag", True)
    jt = info["ifds"][0]["jpeg_tables"]
    if expect_tag:
        assert jt is not None and jt[:2] == b"\xff\xd8" \
            and jt[-2:] == b"\xff\xd9"
    else:
        assert jt is None
    if kw.get("overviews"):
        ov, _ = GT.read_geotiff(p, level=1)
        # decimated image is 4x4-block-constant: near-exact under Q1
        assert np.abs(ov.astype(int)
                      - img[:, ::2, ::2].astype(int)).max() <= 1


def test_catalog_and_http_parity(tmp_path, spark):
    from geotrellis_contrib_spark.sources import rangereader as RR

    img = _block_constant_scene(seed=9)
    p = str(tmp_path / "cat.tif")
    GT.write_geotiff(p, img, (0, 0, 256, 256), epsg=3857, nodata=0.0,
                     tile_size=64, compress="jpeg", jpeg_quant=Q1,
                     cog=True)
    spec = {"path": p, "source_id": "s", "source_idx": 0, "zoom": 6,
            "base_col": 0, "base_row": 0}
    cat = GT.geotiff_tile_catalog(spark, [spec])
    rows = GT.read_catalog_tiles(cat).collect()
    assert len(rows) == 2 * 16
    from geotrellis_contrib_spark.operators.pixels import unpack
    for r in rows:
        tile = unpack(r.px, r.dtype, 64)
        assert r.dtype == "uint8"
        ref = img[r.band, r.row * 64:(r.row + 1) * 64,
                  r.col * 64:(r.col + 1) * 64]
        assert (tile == ref).all()
    # same catalog over the HTTP transport: bit-identical tiles
    srv, base = RR.serve_directory(str(tmp_path))
    try:
        spec_http = dict(spec, path=f"{base}/cat.tif")
        cat_h = GT.geotiff_tile_catalog(spark, [spec_http])
        rows_h = {(r.band, r.col, r.row): r.px
                  for r in GT.read_catalog_tiles(cat_h).collect()}
        assert rows_h == {(r.band, r.col, r.row): r.px for r in rows}
    finally:
        srv.shutdown()


def test_color_conversion_grayscale_exact_and_general_bound():
    import numpy as np

    rng = np.random.default_rng(13)
    # grayscale-in-RGB: Y == v, Cb == Cr == 128 exactly, and back
    v = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    rgb = np.stack([v, v, v], axis=-1)
    ycc = J.rgb_to_ycbcr(rgb)
    assert (ycc[..., 0] == v).all()
    assert (ycc[..., 1] == 128).all() and (ycc[..., 2] == 128).all()
    assert (J.ycbcr_to_rgb(ycc) == rgb).all()
    # general RGB roundtrip: +-2 (rounding both ways)
    c = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
    back = J.ycbcr_to_rgb(J.rgb_to_ycbcr(c))
    assert np.abs(back.astype(int) - c.astype(int)).max() <= 2


@pytest.mark.parametrize("sub", [(1, 1), (2, 2)])
def test_color_jpeg_block_constant_exact(sub):
    import numpy as np

    rng = np.random.default_rng(17)
    g = np.repeat(np.repeat(
        rng.integers(0, 256, (6, 9), dtype=np.uint8), 16, 0), 16, 1)
    rgb = np.stack([g, g, g], axis=-1)
    s = J.jpeg_encode_color(rgb, Q1, Q1, subsampling=sub)
    assert (J.jpeg_decode_color(s) == rgb).all()
    # abbreviated + chroma tables in the JPEGTables stream
    tb = J.jpeg_tables_stream(Q1, Q1)
    s2 = J.jpeg_encode_color(rgb, Q1, Q1, subsampling=sub,
                             inline_tables=False)
    assert (J.jpeg_decode_color(s2, tb) == rgb).all()
    # restart markers
    s3 = J.jpeg_encode_color(rgb, Q1, Q1, subsampling=sub,
                             restart_interval=2)
    assert (J.jpeg_decode_color(s3) == rgb).all()


def test_color_jpeg_general_bound_and_fail_louds():
    import numpy as np

    rng = np.random.default_rng(23)
    c = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    d = J.jpeg_decode_color(J.jpeg_encode_color(c, Q1, Q1,
                                                subsampling=(1, 1)))
    assert np.abs(d.astype(int) - c.astype(int)).max() <= 5
    # gray decoder rejects color streams and vice versa
    s = J.jpeg_encode_color(c, Q1, Q1, subsampling=(1, 1))
    with pytest.raises(ValueError, match="grayscale"):
        J.jpeg_decode_gray(s)
    g = J.jpeg_encode_gray(c[..., 0].copy(), Q1)
    with pytest.raises(ValueError, match="3-component"):
        J.jpeg_decode_color(g)
    with pytest.raises(ValueError, match="subsampling"):
        J.jpeg_encode_color(c, Q1, Q1, subsampling=(2, 1))
    with pytest.raises(ValueError, match="uint8"):
        J.jpeg_encode_color(c.astype(np.int16), Q1, Q1)


def test_tiff_ycbcr_layouts_and_fail_louds(tmp_path):
    import numpy as np

    rng = np.random.default_rng(29)
    g = np.repeat(np.repeat(
        rng.integers(1, 256, (8, 16), dtype=np.uint8), 16, 0), 16, 1)
    rgb = np.stack([g, g, g], axis=0)
    for name, kw in [("a.tif", dict(jpeg_subsampling=(1, 1))),
                     ("b.tif", dict(jpeg_subsampling=(2, 2), cog=True,
                                    jpeg_restart=3)),
                     ("c.tif", dict(jpeg_subsampling=(1, 1),
                                    jpeg_tables_tag=False))]:
        p = str(tmp_path / name)
        GT.write_geotiff(p, rgb, (0, 0, 256, 128), epsg=3857,
                         nodata=0.0, tile_size=64, compress="jpeg",
                         photometric="ycbcr", planar=1, jpeg_quant=Q1,
                         jpeg_quant_chroma=Q1, **kw)
        arr, info = GT.read_geotiff(p)
        assert (arr == rgb).all()
        assert info["nbands"] == 3 and info["planar"] == 1
    with pytest.raises(ValueError, match="3 bands"):
        GT.write_geotiff(str(tmp_path / "x.tif"), rgb[:2], (0, 0, 1, 1),
                         compress="jpeg", photometric="ycbcr", planar=1,
                         nodata=0.0)
    with pytest.raises(ValueError, match="ycbcr"):
        GT.write_geotiff(str(tmp_path / "x.tif"), rgb, (0, 0, 1, 1),
                         compress="deflate", photometric="ycbcr",
                         nodata=0.0)
    with pytest.raises(ValueError, match="planar=2"):
        GT.write_geotiff(str(tmp_path / "x.tif"), rgb, (0, 0, 1, 1),
                         compress="jpeg", planar=1, nodata=0.0)


def test_tiff_ycbcr_catalog_band_slicing(tmp_path, spark):
    import numpy as np

    from geotrellis_contrib_spark.operators.pixels import unpack

    rng = np.random.default_rng(31)
    g = np.repeat(np.repeat(
        rng.integers(1, 256, (16, 16), dtype=np.uint8), 8, 0), 8, 1)
    rgb = np.stack([g, g, g], axis=0)
    p = str(tmp_path / "cat.tif")
    GT.write_geotiff(p, rgb, (0, 0, 128, 128), epsg=3857, nodata=0.0,
                     tile_size=64, compress="jpeg", photometric="ycbcr",
                     planar=1, jpeg_quant=Q1, jpeg_quant_chroma=Q1,
                     jpeg_subsampling=(2, 2))
    cat = GT.geotiff_tile_catalog(spark, [{
        "path": p, "source_id": "s", "source_idx": 0, "zoom": 6,
        "base_col": 0, "base_row": 0}])
    rows = GT.read_catalog_tiles(cat).collect()
    assert len(rows) == 3 * 4  # 3 bands x 2x2 tiles (chunky slicing)
    for r in rows:
        tile = unpack(r.px, r.dtype, 64)
        ref = rgb[r.band, r.row * 64:(r.row + 1) * 64,
                  r.col * 64:(r.col + 1) * 64]
        assert (tile == ref).all()


def test_catalog_overview_level(tmp_path, spark):
    """level>0 catalogs the overview IFD's own tile grid; tiles decode
    to the 2x-decimated image; out-of-range levels fail loud."""
    from geotrellis_contrib_spark.operators.pixels import unpack

    img = _block_constant_scene(seed=21)
    p = str(tmp_path / "ov.tif")
    GT.write_geotiff(p, img, (0, 0, 256, 256), epsg=3857, nodata=0.0,
                     tile_size=64, compress="jpeg", jpeg_quant=Q1,
                     overviews=1)
    spec = {"path": p, "source_id": "s", "source_idx": 0, "zoom": 5,
            "base_col": 0, "base_row": 0}
    rows = GT.read_catalog_tiles(
        GT.geotiff_tile_catalog(spark, [spec], level=1)).collect()
    assert len(rows) == 2 * 4  # 2 bands x 2x2 overview tiles
    ov = img[:, ::2, ::2]
    for r in rows:
        tile = unpack(r.px, r.dtype, 64)
        ref = ov[r.band, r.row * 64:(r.row + 1) * 64,
                 r.col * 64:(r.col + 1) * 64]
        # decimated block-constant is 4x4-constant: JPEG q=1 is +-1
        assert np.abs(tile.astype(int) - ref.astype(int)).max() <= 1
    import pytest as _pt
    with _pt.raises(ValueError, match="out of range"):
        GT.geotiff_tile_catalog(spark, [spec], level=2)
