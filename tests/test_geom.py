"""Geometry kernel tests against the reference's golden literals
(SURVEY.md §5.2; fixtures transcribed from the reference test sources)."""

import numpy as np

from geotrellis_contrib_spark import geom

# EWKB golden from /root/reference/slick/src/test/.../PostGisProjectionSupportSpec.scala:94-108
GOLDEN_EWKB_HEX = (
    "002000000300000f110000000100000005"
    "c170b8793ccc8e80415ca9f4683a18dc"
    "c170b8793ccc8e8041631bf8457c1091"
    "c16ca9f4683a18dc41631bf8457c1091"
    "c16ca9f4683a18dc415ca9f4683a18dc"
    "c170b8793ccc8e80415ca9f4683a18dc"
)
GOLDEN_POLY = [
    (-17532819.799940586, 7514065.628545966),
    (-17532819.799940586, 10018754.171394618),
    (-15028131.257091932, 10018754.171394618),
    (-15028131.257091932, 7514065.628545966),
    (-17532819.799940586, 7514065.628545966),
]


def test_wkb_decode_golden_hex():
    for data in (GOLDEN_EWKB_HEX, "\\x" + GOLDEN_EWKB_HEX):
        g = geom.wkb_decode(data)
        assert g["type"] == geom.WKB_POLYGON
        assert g["srid"] == 3857
        ring = g["coords"][0]
        assert len(ring) == 5
        for (x, y), (gx, gy) in zip(ring, GOLDEN_POLY):
            assert x == gx and y == gy  # bit-identical


def test_wkb_encode_roundtrip():
    for big in (False, True):
        enc = geom.wkb_encode(geom.WKB_POLYGON, [GOLDEN_POLY], srid=3857, big_endian=big)
        g = geom.wkb_decode(enc)
        assert g["srid"] == 3857
        assert g["coords"][0] == GOLDEN_POLY
    # big-endian EWKB re-encode reproduces the golden hex exactly
    enc = geom.wkb_encode(geom.WKB_POLYGON, [GOLDEN_POLY], srid=3857, big_endian=True)
    assert enc.hex() == GOLDEN_EWKB_HEX


def test_wkb_point_and_multipoint():
    enc = geom.wkb_encode(geom.WKB_POINT, (75.97, 40.38), srid=4326)
    g = geom.wkb_decode(enc)
    assert g["coords"] == (75.97, 40.38)
    assert g["srid"] == 4326
    enc = geom.wkb_encode(geom.WKB_MULTIPOINT, [(1.0, 1.0), (2.0, 2.0)], srid=3131)
    g = geom.wkb_decode(enc)
    assert g["coords"] == [(1.0, 1.0), (2.0, 2.0)]


def test_ewkt():
    assert geom.ewkt(geom.WKB_POINT, (1.0, 1.0), 43211) == "SRID=43211;POINT (1 1)"


def test_pip_square():
    ring = geom.bbox_buffer(78.32, 40.30, 0.01)  # Altoona bbox (Data.scala:59-66)
    px = np.array([78.32, 78.325, 78.331, 0.0])
    py = np.array([40.30, 40.305, 40.30, 0.0])
    np.testing.assert_array_equal(
        geom.point_in_ring(px, py, ring), [True, True, False, False]
    )
    # boundary tie-break is half-open: left/bottom edge in, right/top edge out
    # (so tiling a plane with touching boxes assigns each point exactly once)
    edge_x = np.array([78.31, 78.33])
    edge_y = np.array([40.305, 40.305])
    np.testing.assert_array_equal(geom.point_in_ring(edge_x, edge_y, ring), [True, False])


def test_pip_concave_and_hole():
    # concave "C" shape
    concave = [(0, 0), (4, 0), (4, 1), (1, 1), (1, 3), (4, 3), (4, 4), (0, 4), (0, 0)]
    px = np.array([0.5, 2.0, 2.0, 3.5])
    py = np.array([2.0, 2.0, 0.5, 2.0])
    np.testing.assert_array_equal(
        geom.point_in_ring(px, py, concave), [True, False, True, False]
    )
    # square with hole
    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    hole = [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]
    px = np.array([5.0, 1.0, 6.5])
    py = np.array([5.0, 1.0, 5.0])
    np.testing.assert_array_equal(
        geom.point_in_polygon(px, py, [outer, hole]), [False, True, True]
    )


def test_distance_and_measures():
    d = geom.planar_distance([0.0], [0.0], [3.0], [4.0])
    assert d[0] == 5.0
    # Line((1,1),(1,3)) length == 2.0 (PostGisProjectionSupportSpec.scala:60-72)
    assert geom.linestring_length([(1, 1), (1, 3)]) == 2.0
    assert geom.linestring_length([(1, 1), (1, 2)]) == 1.0  # PostgisSpec.scala:287-299
    # MultiPoint centroid (1.5, 1.5) (PostGisProjectionSupportSpec.scala:74-92)
    assert geom.multipoint_centroid([(1, 1), (2, 2)]) == (1.5, 1.5)
    cx, cy = geom.polygon_centroid([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)])
    assert (cx, cy) == (1.0, 1.0)


def test_geojson_golden():
    # PostgisSpec.scala:193-196
    assert geom.point_geojson(75.97, 40.38) == '{"type":"Point","coordinates":[75.97,40.38]}'
    assert geom.point_geojson(1.0, 2.0) == '{"type":"Point","coordinates":[1,2]}'


def test_bbox_intersects():
    out = geom.bbox_intersects(0, 0, 2, 2, np.array([1, 3]), np.array([1, 3]),
                               np.array([4, 5]), np.array([4, 5]))
    np.testing.assert_array_equal(out, [True, False])


def test_haversine():
    # equator degree ~ 111.19 km with mean radius
    d = geom.haversine_m([0.0], [0.0], [1.0], [0.0])
    assert abs(d[0] - 111195.0) < 100


# ---------------------------------------------------------------------------
# GEOMETRYCOLLECTION codec (PostGisSupport.scala:53-68 column-type surface)
# ---------------------------------------------------------------------------

def test_geometrycollection_wkb_roundtrip():
    gc = {"type": geom.WKB_GEOMETRYCOLLECTION, "srid": 4326, "coords": [
        {"type": geom.WKB_POINT, "coords": (1.0, 2.0)},
        {"type": geom.WKB_LINESTRING, "coords": [(0.0, 0.0), (1.0, 1.0)]},
        {"type": geom.WKB_MULTIPOLYGON, "coords": [
            [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]],
        ]},
    ]}
    for be in (False, True):
        blob = geom.wkb_encode(gc["type"], gc["coords"], srid=4326, big_endian=be)
        back = geom.wkb_decode(blob)
        assert back["type"] == geom.WKB_GEOMETRYCOLLECTION
        assert back["srid"] == 4326
        assert back["coords"] == gc["coords"]


def test_geometrycollection_nested_roundtrip():
    inner = {"type": geom.WKB_GEOMETRYCOLLECTION, "coords": [
        {"type": geom.WKB_POINT, "coords": (5.0, 6.0)},
    ]}
    gc = [{"type": geom.WKB_POINT, "coords": (9.0, 9.0)}, inner]
    blob = geom.wkb_encode(geom.WKB_GEOMETRYCOLLECTION, gc)
    back = geom.wkb_decode(blob)
    assert back["coords"][1]["type"] == geom.WKB_GEOMETRYCOLLECTION
    assert back["coords"][1]["coords"][0]["coords"] == (5.0, 6.0)


def test_geometrycollection_wkt_and_ewkt():
    d = geom.wkt_decode(
        "SRID=4326;GEOMETRYCOLLECTION (POINT (1 2), "
        "LINESTRING (0 0, 1 1), POLYGON ((0 0, 3 0, 3 3, 0 0)))")
    assert d["type"] == geom.WKB_GEOMETRYCOLLECTION
    assert d["srid"] == 4326
    assert [m["type"] for m in d["coords"]] == [
        geom.WKB_POINT, geom.WKB_LINESTRING, geom.WKB_POLYGON]
    assert d["coords"][0]["coords"] == (1.0, 2.0)
    # emit -> reparse is identity
    txt = geom.ewkt(d["type"], d["coords"], 4326)
    assert geom.wkt_decode(txt) == d


def test_multi_geometry_text_roundtrip():
    # MULTI* members must round-trip through the TEXT path too (the WKB
    # codec always accepted them; ewkt/wkt_decode were the asymmetric gap)
    cases = [
        (geom.WKB_MULTIPOINT, [(1.0, 2.0), (3.0, 4.0)]),
        (geom.WKB_MULTILINESTRING,
         [[(0.0, 0.0), (1.0, 1.0)], [(2.0, 2.0), (3.0, 4.0), (5.0, 5.0)]]),
        (geom.WKB_MULTIPOLYGON,
         [[[(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 0.0)]],
          [[(10.0, 10.0), (14.0, 10.0), (14.0, 14.0), (10.0, 10.0)],
           [(11.0, 11.0), (12.0, 11.0), (12.0, 12.0), (11.0, 11.0)]]]),
    ]
    for gtype, coords in cases:
        txt = geom.ewkt(gtype, coords, 4326)
        back = geom.wkt_decode(txt)
        assert back == {"type": gtype, "srid": 4326, "coords": coords}, txt
        # and the text path agrees with the binary path
        blob = geom.wkb_encode(gtype, coords, srid=4326)
        assert geom.wkb_decode(blob)["coords"] == coords


def test_collection_with_multi_members_text_roundtrip():
    # a WKB-decoded collection containing MULTI* members can now round-trip
    # through ewkt -> wkt_decode (round-3 advice gap)
    gc = [{"type": geom.WKB_MULTIPOINT, "coords": [(1.0, 2.0), (3.0, 4.0)]},
          {"type": geom.WKB_MULTIPOLYGON,
           "coords": [[[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]]]}]
    blob = geom.wkb_encode(geom.WKB_GEOMETRYCOLLECTION, gc, srid=4326)
    d = geom.wkb_decode(blob)
    txt = geom.ewkt(d["type"], d["coords"], 4326)
    back = geom.wkt_decode(txt)
    assert back["coords"] == gc
