"""Skew pipeline: histogram sampler -> salt plan -> salted join == plain join."""

import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark.functions import cells as C
from geotrellis_contrib_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # 50k points: 60% in ONE hot cell at zoom 6, rest world-spread
    pts = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 6, -74.1 + ((F.col("id") * 7) % 1000).cast("double") / 10000.0)
         .otherwise(-170.0 + ((F.col("id") * 9973) % 320000).cast("double") / 1000.0).alias("lon"),
        F.when(F.col("id") % 10 < 6, 40.6 + ((F.col("id") * 11) % 1000).cast("double") / 10000.0)
         .otherwise(-55.0 + ((F.col("id") * 7919) % 110000).cast("double") / 1000.0).alias("lat"),
    ).withColumn("cell", C.encode_point(F.col("lon"), F.col("lat"), 6)).cache()
    yield pts
    pts.unpersist()


def test_histogram_finds_hot_cell(skewed):
    hist = skew.cell_histogram(skewed, sample_frac=0.05)
    top = hist.orderBy(F.col("est_rows").desc()).first()
    # the hot cell holds ~30k rows; estimate within 30%
    assert top["est_rows"] > 20_000


def test_plan_salts_targets_only_hot(skewed):
    hist = skew.cell_histogram(skewed, sample_frac=0.05)
    salts = skew.plan_salts(hist, rows_per_task=5_000)
    assert len(salts) >= 1
    assert all(1 < s <= skew.MAX_SALT for s in salts.values())
    # cold cells not salted
    assert len(salts) < hist.count()


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(int(r["cell"]), f"d{i}") for i, r in
         enumerate(skewed.select("cell").distinct().limit(20).collect())],
        "cell long, dim_tag string")
    plain = skewed.join(dim, "cell").select("doc_id", "dim_tag")
    hist = skew.cell_histogram(skewed, sample_frac=0.05)
    salts = skew.plan_salts(hist, rows_per_task=5_000)
    salted = skew.salted_join(skewed, dim, salts, row_key="doc_id") \
                 .select("doc_id", "dim_tag")
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b
    assert len(a) > 0


def test_repartition_spatial_sorted(skewed):
    out = skew.repartition_spatial(skewed, 8)
    assert out.rdd.getNumPartitions() == 8

    def check_sorted(it):
        prev = None
        for row in it:
            k = (row["cell"], row["doc_id"])
            assert prev is None or k >= prev
            prev = k
        yield 1

    assert out.rdd.mapPartitions(check_sorted).count() == 8


def test_salted_join_bounds_task_skew(spark):
    # ADVERSARIAL 90%-hot-cell corpus (the q_pip_join_hot gate): after the
    # salted shuffle the hot cell must fan across tasks — max partition
    # share bounded — while the unsalted shuffled join concentrates ~90%
    # of rows in one partition. This is the task-skew evidence the 100TB
    # posture rests on (BENCH.md).
    import __spark_entry__ as E
    from geotrellis_contrib_spark.operators import spatial_join as sj
    pts = E._hot_anchors(spark) \
        .withColumn("cell", C.encode_point(F.col("lon"), F.col("lat"), 6))
    dim = pts.select("cell").distinct() \
             .withColumn("dim_tag", F.col("cell").cast("string"))

    def max_share(df):
        rows = df.groupBy(F.spark_partition_id().alias("p")).count().collect()
        total = sum(r["count"] for r in rows)
        return max(r["count"] for r in rows) / total

    # AQE partition COALESCING merges the tiny test shuffle back into one
    # partition (correct at this volume — partitions are far below the
    # target size), which would mask the partitioner's spread; disable
    # just the coalescing to observe the raw hash partitioning a full-size
    # shuffle would exhibit per task.
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        unsalted = pts.join(dim.hint("shuffle_hash"), "cell")
        hist = skew.cell_histogram(pts, sample_frac=0.05, seed=7)
        salts = skew.plan_salts(hist, rows_per_task=2000)
        assert salts, "hot cell must be detected by the sampled histogram"
        salted = skew.salted_join(pts, dim, salts, row_key="doc_id",
                                  broadcast_dim=False)
        u, s = max_share(unsalted), max_share(salted)
    finally:
        spark.conf.set(key, prev)
    assert u > 0.5, f"unsalted join should concentrate the hot cell ({u})"
    assert s < 0.2, f"salted join must bound per-task share ({s})"
