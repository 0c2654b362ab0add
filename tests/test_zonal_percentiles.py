"""Zonal percentiles: type-1 discrete quantiles vs numpy inverted_cdf
(the same definition), tie-heavy and NULL-bearing fixtures."""
import numpy as np

from geotrellis_contrib_spark.operators import raster as RO


def test_zonal_percentiles_vs_numpy(spark):
    # one polygon box covering the whole grid; tiles at zoom 2 so the
    # centers all land inside
    vals = [float(v) for v in
            [5, 1, 9, 1, 7, 3, 3, 3, 8, 2, 6, 4, 1, 9]] + [None]
    tiles = spark.createDataFrame(
        [("s", 2, i % 4, i // 4, 0, v) for i, v in enumerate(vals)],
        "source_id string, zoom int, col long, row long, band int, "
        "val double")
    boxes = spark.createDataFrame(
        [("poly-a", -180.0, -90.0, 180.0, 90.0)],
        "poly_id string, xmin double, ymin double, xmax double, "
        "ymax double")
    r = RO.zonal_percentiles(tiles, boxes).collect()[0]
    data = np.array([v for v in vals if v is not None])
    assert r.cnt == len(data)
    for q, got in ((0.25, r.p25), (0.50, r.p50), (0.75, r.p75)):
        want = float(np.percentile(data, q * 100, method="inverted_cdf"))
        assert got == want, (q, got, want)
    # all-equal values: every percentile IS that value
    tiles2 = spark.createDataFrame(
        [("s", 2, i, 0, 0, 4.0) for i in range(4)],
        "source_id string, zoom int, col long, row long, band int, "
        "val double")
    r2 = RO.zonal_percentiles(tiles2, boxes).collect()[0]
    assert (r2.p25, r2.p50, r2.p75, r2.cnt) == (4.0, 4.0, 4.0, 4)


def test_zonal_mode_majority_minority_ties(spark):
    # counts: 3.0 x3, 1.0 x3 (majority tie -> smallest = 1.0),
    # 9.0 x1, 7.0 x1 (minority tie -> smallest = 7.0), NULL excluded
    vals = [3.0, 3.0, 3.0, 1.0, 1.0, 1.0, 9.0, 7.0, None]
    tiles = spark.createDataFrame(
        [("s", 2, i % 4, i // 4, 0, v) for i, v in enumerate(vals)],
        "source_id string, zoom int, col long, row long, band int, "
        "val double")
    boxes = spark.createDataFrame(
        [("poly-a", -180.0, -90.0, 180.0, 90.0)],
        "poly_id string, xmin double, ymin double, xmax double, "
        "ymax double")
    r = RO.zonal_mode(tiles, boxes).collect()[0]
    assert (r.cnt, r.n_distinct) == (8, 4)
    assert r.majority == 1.0     # tie 3-vs-3 between 1.0 and 3.0
    assert r.minority == 7.0     # tie 1-vs-1 between 7.0 and 9.0
