"""Spatial joins against the numpy oracle: WKB polygons (concave + holes)
through the Arrow refine tier, plus distance-join edge cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark import geom
from geotrellis_contrib_spark.operators import spatial_join as sj


@pytest.fixture(scope="module")
def points(spark):
    rows = [(i, -75.0 + (i % 100) * 0.1, 38.0 + ((i * 7) % 80) * 0.1)
            for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lon double, lat double").cache()


@pytest.fixture(scope="module")
def polygons(spark):
    # concave C-shape, square-with-hole, plain box — all as EWKB
    c_shape = [[(-73.0, 40.0), (-69.0, 40.0), (-69.0, 41.0), (-72.0, 41.0),
                (-72.0, 43.0), (-69.0, 43.0), (-69.0, 44.0), (-73.0, 44.0),
                (-73.0, 40.0)]]
    holed = [[(-75.0, 38.0), (-70.0, 38.0), (-70.0, 42.0), (-75.0, 42.0), (-75.0, 38.0)],
             [(-73.0, 39.0), (-72.0, 39.0), (-72.0, 40.0), (-73.0, 40.0), (-73.0, 39.0)]]
    box = [[(-68.0, 38.5), (-66.0, 38.5), (-66.0, 40.5), (-68.0, 40.5), (-68.0, 38.5)]]
    polys = {"c": c_shape, "holed": holed, "box": box}
    rows = []
    for pid, rings in polys.items():
        xs = [x for x, _ in rings[0]]
        ys = [y for _, y in rings[0]]
        rows.append((pid, min(xs), min(ys), max(xs), max(ys),
                     geom.wkb_encode(geom.WKB_POLYGON, rings, srid=4326)))
    df = spark.createDataFrame(
        rows, "poly_id string, xmin double, ymin double, xmax double, ymax double, wkb binary")
    return df, polys


def test_pip_join_wkb_vs_oracle(spark, points, polygons):
    poly_df, polys = polygons
    got = sj.pip_join_wkb(points, poly_df, zoom=5).select("doc_id", "poly_id")
    got_pairs = sorted((r.doc_id, r.poly_id) for r in got.collect())

    pts = points.collect()
    px = np.array([r.lon for r in pts])
    py = np.array([r.lat for r in pts])
    ids = np.array([r.doc_id for r in pts])
    expect = []
    for pid, rings in polys.items():
        inside = geom.point_in_polygon(px, py, rings)
        expect.extend((int(i), pid) for i in ids[inside])
    assert got_pairs == sorted(expect)
    assert len(got_pairs) > 0
    # the concave notch and the hole actually exclude points
    assert any(p == "holed" for _, p in got_pairs)


def test_distance_join_cross_cell_pairs(spark):
    # two points straddling a cell boundary at the join zoom must still pair
    pts = spark.createDataFrame(
        [(1, -0.01, 0.01), (2, 0.01, 0.01), (3, 10.0, 10.0)],
        "doc_id long, lon double, lat double")
    out = sj.distance_join(pts, pts, radius=0.5)
    pairs = {(r["a_doc_id"], r["b_doc_id"]) for r in out.collect()
             if r["a_doc_id"] < r["b_doc_id"]}
    assert pairs == {(1, 2)}


def test_distance_join_antimeridian_wrap(spark):
    pts = spark.createDataFrame(
        [(1, -179.95, 0.0), (2, 179.95, 0.0)],
        "doc_id long, lon double, lat double")
    out = sj.distance_join(pts, pts, radius=0.5)
    # planar distance across the antimeridian is large (359.9 deg), so the
    # pair is a CANDIDATE via col wrap but correctly rejected by the refine
    pairs = {(r["a_doc_id"], r["b_doc_id"]) for r in out.collect()}
    assert not {p for p in pairs if p[0] != p[1]}
