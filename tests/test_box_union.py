"""Box union area: hand inclusion-exclusion cases, cross-cell splits,
duplicate/contained boxes, and a brute-force Monte-Carlo-free check via
fine-grid rasterization on the fixture cells."""
import numpy as np

from geotrellis_contrib_spark.operators.spatial_join import box_union_area

Q = 1048576.0


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "poly_id string, xmin double, ymin double, "
              "xmax double, ymax double")
    return {(r.gx, r.gy): (r.n_boxes, r.area_q)
            for r in box_union_area(df).collect()}


def test_two_overlapping_boxes_inclusion_exclusion(spark):
    # both inside one 45-deg cell (gx=4, gy=2 covers [0,45)x[0,45))
    rows = [("a", 1.0, 1.0, 11.0, 11.0), ("b", 6.0, 6.0, 16.0, 16.0)]
    got = _run(spark, rows)
    union = 100.0 + 100.0 - 25.0
    assert got == {(4, 2): (2, int(np.floor(union * Q + 0.5)))}


def test_contained_and_duplicate(spark):
    rows = [("a", 1.0, 1.0, 21.0, 21.0), ("b", 5.0, 5.0, 10.0, 10.0),
            ("c", 1.0, 1.0, 21.0, 21.0)]
    got = _run(spark, rows)
    assert got == {(4, 2): (3, int(np.floor(400.0 * Q + 0.5)))}


def test_cross_cell_split_and_edge_touch(spark):
    # spans the gx=3/4 boundary at lon 0; a second box exactly touching
    # the boundary from the left contributes ONLY to cell 3
    rows = [("a", -10.0, 1.0, 10.0, 11.0), ("b", -20.0, 1.0, 0.0, 6.0)]
    got = _run(spark, rows)
    # cell 3: union of [-10,0]x[1,11] and [-20,0]x[1,6]
    left = 100.0 + 100.0 - 10.0 * 5.0
    assert got[(3, 2)] == (2, int(np.floor(left * Q + 0.5)))
    assert got[(4, 2)] == (1, int(np.floor(100.0 * Q + 0.5)))
    assert set(got) == {(3, 2), (4, 2)}


def test_fixture_brute_force_grid(spark):
    # build the view chain the entry file uses
    import importlib
    mod = importlib.import_module("__spark_entry__")
    mod._views(spark, "/root/testdata/sf0.01")
    pb = spark.table("polygon_boxes")
    rows = [(r.poly_id, float(r.xmin), float(r.ymin),
             float(r.xmax), float(r.ymax)) for r in pb.collect()]
    got = _run(spark, rows)
    # independent plain-python compression (no numpy vector path, no
    # searchsorted) with the same per-piece quantization
    for (gx, gy), (nb, aq) in got.items():
        cx0, cy0 = gx * 45.0 - 180.0, gy * 45.0 - 90.0
        clips = []
        for _, x0, y0, x1, y1 in rows:
            a = (max(x0, cx0), max(y0, cy0),
                 min(x1, cx0 + 45.0), min(y1, cy0 + 45.0))
            if a[2] > a[0] and a[3] > a[1]:
                clips.append(a)
        xs = sorted({c[0] for c in clips} | {c[2] for c in clips})
        ys = sorted({c[1] for c in clips} | {c[3] for c in clips})
        area = 0
        for i in range(len(xs) - 1):
            for j in range(len(ys) - 1):
                if any(c[0] <= xs[i] and c[2] >= xs[i + 1]
                       and c[1] <= ys[j] and c[3] >= ys[j + 1]
                       for c in clips):
                    area += int(np.floor(
                        (xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
                        * Q + 0.5))
        assert (nb, aq) == (len(clips), area)
