"""Frozen goldens tied to the reference's own fixtures and probe extents
(SURVEY.md §5): tile assignments and window math must stay bit-identical
across engine versions — these literals are computed once and frozen."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark import grid
from geotrellis_contrib_spark.functions import cells as C

# The reference's multithreading spec probes a UTM-ish scene with
# known-good Extent(630000, 215000, 639000, 219500) and known-disjoint
# Extent(0, 0, 1, 1) (GeoTiffRasterSourceMultiThreadingSpec.scala:90-96);
# our synthetic scene replicates the footprint (FIXTURES.md §6).
SCENE = grid.GridExtent(630000.0, 215000.0, 645000.0, 228500.0, 10.0, 10.0)
PROBE_GOOD = (630000.0, 215000.0, 639000.0, 219500.0)
PROBE_DISJOINT = (0.0, 0.0, 1.0, 1.0)


def test_scene_grid_frozen():
    assert (SCENE.cols, SCENE.rows) == (1500, 1350)
    assert SCENE.grid_bounds == (0, 0, 1499, 1349)
    # probe window -> pixel bounds (half-pixel rule), frozen
    assert SCENE.extent_to_bounds(*PROBE_GOOD) == (0, 900, 899, 1349)
    # disjoint probe clamps to an empty/degenerate window outside the grid
    b = SCENE.extent_to_bounds(*PROBE_DISJOINT, clamp=False)
    assert b[2] < 0  # entirely west of the footprint
    assert grid.bounds_intersection(SCENE.grid_bounds, b) is None


def test_256px_split_frozen():
    # gridBounds.split(256, 256) full-scene sweep (SubsceneReadingIT.scala:91)
    parts = grid.split_bounds(SCENE.grid_bounds, 256, 256)
    assert len(parts) == 36  # ceil(1500/256) x ceil(1350/256) = 6 x 6
    assert parts[0] == (0, 0, 255, 255)
    assert parts[-1] == (1280, 1280, 1499, 1349)


# Frozen slippy-tile assignments (computed once from the layout math of
# grid.lonlat_to_tile; the engine's Column twin must agree bit-for-bit).
GOLDEN_TILES = [
    # (lon, lat, zoom, col, row)
    (-74.0060, 40.7128, 12, 1205, 1540),   # NYC
    (75.97, 40.38, 12, 2912, 1545),        # Reading,PA coords as lon/lat
    (78.32, 40.30, 10, 734, 386),          # Altoona fixture point
    (0.0, 0.0, 8, 128, 128),               # origin
    (-180.0, 85.05112877980659, 4, 0, 0),  # NW corner clamps
    (179.9999, -85.05, 4, 15, 15),         # SE corner clamps
    (151.2093, -33.8688, 14, 15073, 9831), # Sydney
]


def test_golden_tile_assignments_numpy():
    for lon, lat, z, col, row in GOLDEN_TILES:
        c, r = grid.lonlat_to_tile(np.array([lon]), np.array([lat]), z)
        assert (int(c[0]), int(r[0])) == (col, row), (lon, lat, z)


def test_golden_tile_assignments_spark(spark):
    df = spark.createDataFrame(
        [(lon, lat, z) for lon, lat, z, _, _ in GOLDEN_TILES],
        "lon double, lat double, zoom int")
    got = df.select(C.tile_col(F.col("lon"), F.col("zoom")).alias("col"),
                    C.tile_row(F.col("lat"), F.col("zoom")).alias("row")).collect()
    for (lon, lat, z, col, row), r in zip(GOLDEN_TILES, got):
        assert (r.col, r.row) == (col, row), (lon, lat, z)


def test_parallelism_invariance(spark):
    """Same pipeline, different partitioning/parallelism -> identical rows
    (the engine analog of the reference's 31-way concurrent-read torture
    test, GeoTiffRasterSourceMultiThreadingSpec.scala:48-151)."""
    from geotrellis_contrib_spark import corpus
    from geotrellis_contrib_spark.operators import spatial_join as sj
    from geotrellis_contrib_spark.operators import tiling

    boxes = spark.createDataFrame(
        [("hot", -74.25, 40.45, -73.75, 40.95), ("w", -120.0, -50.0, 60.0, 50.0)],
        "poly_id string, xmin double, ymin double, xmax double, ymax double")

    results = []
    for parts, shuffle in ((2, "2"), (8, "32")):
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        docs = corpus.synth_docs(spark, 3000, partitions=parts)
        hits = sj.pip_join_boxes(corpus.extract_anchors(docs), boxes, zoom=6)
        tiles = tiling.assign_tiles(hits, [10, 12])
        out = tiles.groupBy("poly_id", "zoom", "col", "row") \
                   .agg(F.count("*").alias("n"))
        results.append(sorted(tuple(r) for r in out.collect()))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert results[0] == results[1]
    assert len(results[0]) > 10
