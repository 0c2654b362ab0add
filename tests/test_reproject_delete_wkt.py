"""No-op reproject elision, coordinate reproject round-trip, predicate
delete, WKT/EWKT parsing (readWktOrWkb sniffing)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark import geom, grid
from geotrellis_contrib_spark.operators import raster as raster_ops
from geotrellis_contrib_spark.sources import tables


def test_reproject_noop_elision(spark):
    df = spark.createDataFrame([(1, -74.0, 40.7)], "id long, lon double, lat double")
    out = raster_ops.reproject_coords(df, 4326, 4326)
    assert out is df  # plan unchanged, not just equivalent


def test_reproject_roundtrip_matches_numpy(spark):
    rows = [(i, -170.0 + i * 33.3, -60.0 + i * 11.7) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    merc = raster_ops.reproject_coords(df, 4326, 3857)
    back = raster_ops.reproject_coords(merc, 3857, 4326).orderBy("id").collect()
    for (i, lon, lat), r in zip(rows, back):
        assert abs(r.lon - lon) < 1e-9 and abs(r.lat - lat) < 1e-9
    # forward values match the numpy kernel to <=1 ulp (JVM vs C libm
    # transcendentals differ in the last bit; tile floors absorb this —
    # x is exact arithmetic, so it must be bit-identical)
    got = merc.orderBy("id").collect()
    x, y = grid.lonlat_to_mercator(np.array([r[1] for r in rows]),
                                   np.array([r[2] for r in rows]))
    for r, ex, ey in zip(got, x, y):
        assert r.lon == ex
        np.testing.assert_allclose(r.lat, ey, rtol=1e-13)


def test_delete_where(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k")) \
         .write.parquet(path)
    n = tables.delete_where(spark, path, F.col("k") == 3)
    assert n == 14  # ids with id%7==3 in [0,100): 3,10,...,94
    back = spark.read.parquet(path)
    assert back.count() == 86
    assert back.filter(F.col("k") == 3).count() == 0


def test_wkt_parse_and_sniffing():
    p = geom.wkt_decode("SRID=4326;POINT (75.97 40.38)")
    assert p == {"type": geom.WKB_POINT, "srid": 4326, "coords": (75.97, 40.38)}
    ln = geom.wkt_decode("LINESTRING (1 1, 1 3)")
    assert ln["coords"] == [(1.0, 1.0), (1.0, 3.0)]
    poly = geom.wkt_decode("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert len(poly["coords"]) == 2 and len(poly["coords"][0]) == 5
    mp = geom.wkt_decode("MULTIPOINT ((1 1), (2 2))")
    assert mp["coords"] == [(1.0, 1.0), (2.0, 2.0)]

    # sniffing: hex-WKB prefixes route to the WKB decoder (reference rule)
    from tests.test_geom import GOLDEN_EWKB_HEX
    for v in (GOLDEN_EWKB_HEX, "\\x" + GOLDEN_EWKB_HEX):
        g = geom.read_wkt_or_wkb(v)
        assert g["type"] == geom.WKB_POLYGON and g["srid"] == 3857
    g = geom.read_wkt_or_wkb("POINT (1 2)")
    assert g["coords"] == (1.0, 2.0)
    # round-trip: wkt -> encode wkb -> decode
    enc = geom.wkb_encode(poly["type"], poly["coords"], srid=4326)
    assert geom.wkb_decode(enc)["coords"] == poly["coords"]
