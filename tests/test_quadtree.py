"""Adaptive quadtree assignment: sparse points resolve at the shallowest
zoom, a hot co-located cluster falls through to the zmax residue (the
tie-break that must return the DEEPEST cell), and the leaf-rule
invariant (every non-zmax leaf holds <= cap points)."""
from geotrellis_contrib_spark.functions import cells as C
from geotrellis_contrib_spark.operators.skew import quadtree_assign


def test_sparse_resolve_shallow_hot_fall_through(spark):
    # 3 far-apart sparse points + 20 IDENTICAL-location hot points
    rows = [(1, -120.0, 40.0), (2, 10.0, -20.0), (3, 150.0, 60.0)]
    rows += [(100 + k, 5.0, 5.0) for k in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lon double, lat double")
    got = {r.id: (r.zoom, r.cell, r.n_in_cell)
           for r in quadtree_assign(df, cap=16, zmin=4, zmax=10).collect()}
    # sparse points: alone in their zoom-4 cell
    for i in (1, 2, 3):
        assert got[i][0] == 4 and got[i][2] == 1
    # hot points: identical location -> same cell at EVERY zoom, count
    # 20 > 16 everywhere -> zmax with the DEEP cell (tie-break pin)
    for k in range(20):
        z, cell, n = got[100 + k]
        assert (z, n) == (10, 20)
        assert cell == got[100][1]
    # the returned hot cell is the zoom-10 cell, not a shallow one
    assert (got[100][1] >> 58) == 10


def test_leaf_rule_invariant_on_fixture(spark):
    import importlib
    mod = importlib.import_module("__spark_entry__")
    mod._views(spark, "/root/testdata/sf0.01")
    pts = spark.table("anchors").filter("lon IS NOT NULL")
    out = quadtree_assign(pts).collect()
    assert len(out) == pts.count()
    for r in out:
        if r.zoom < 10:
            assert r.n_in_cell <= 16
    # shallowest-qualifying: a point assigned z > 4 must sit in a HOT
    # (> cap) parent cell at every shallower zoom — recount all zooms
    from collections import Counter
    from pyspark.sql import functions as F
    keyed = []
    for z in range(4, 11):
        keyed.append(pts.select(
            "doc_id", F.lit(z).alias("z"),
            C.cell_id(F.lit(z), C.tile_col(F.col("lon"), z),
                      C.tile_row(F.col("lat"), z)).alias("cell")))
    allk = keyed[0]
    for k in keyed[1:]:
        allk = allk.unionByName(k)
    rows = allk.collect()
    cnt = Counter((r.z, r.cell) for r in rows)
    cell_of = {(r.doc_id, r.z): r.cell for r in rows}
    deeper = 0
    for r in out:
        for z in range(4, r.zoom):
            assert cnt[(z, cell_of[(r.id, z)])] > 16
        if r.zoom > 4:
            deeper += 1
    assert deeper > 0  # the hot-cluster corpus exercises deep levels
