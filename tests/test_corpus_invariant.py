"""Interleaved-corpus generator + span-sequence invariant (BASELINE input_hint:
per-row invariant vs the reference — (kind, text, media_ref, order) equality)."""

import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark import corpus


@pytest.fixture(scope="module")
def docs(spark):
    return corpus.synth_docs(spark, 2000, partitions=8).cache()


def test_schema_matches_input_hint(docs):
    assert docs.schema.simpleString() == (
        "struct<doc_id:string,spans:array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>>"
    )


def test_deterministic_across_partitionings(spark, docs):
    other = corpus.synth_docs(spark, 2000, partitions=3)
    a = docs.orderBy("doc_id").collect()
    b = other.orderBy("doc_id").collect()
    assert a == b  # byte-stable regardless of parallelism


def test_span_layout(docs):
    row = docs.filter(F.col("doc_id") == "doc-000000000000").first()
    kinds = [s["kind"] for s in row["spans"]]
    assert kinds == ["text", "geo", "media", "media"]
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets == sorted(offsets)  # strictly increasing interleave
    # ~2% docs miss the geo span (doc_id % 50 == 7)
    no_geo = docs.filter(F.col("doc_id") == "doc-000000000007").first()
    assert [s["kind"] for s in no_geo["spans"]] == ["text", "media", "media"]


def test_extract_anchors_and_media(docs):
    anchors = corpus.extract_anchors(docs)
    n = anchors.count()
    assert n == 2000 - 2000 // 50  # one anchor per doc except the 2% without
    assert anchors.filter(F.col("lon").isNull() | F.col("lat").isNull()).count() == 0
    hot = anchors.filter((F.col("lon") >= -74.25) & (F.col("lon") < -73.75)
                         & (F.col("lat") >= 40.45) & (F.col("lat") < 40.95)).count()
    assert abs(hot / n - 0.3) < 0.03  # the deliberate skew
    media = corpus.extract_media(docs)
    assert media.count() == 2000 * 2
    assert media.filter(F.col("media_ref").startswith("media://")).count() == 2000 * 2


def test_span_invariant_through_pipeline(spark, docs):
    """Run the full flagship pipeline (extract -> spatial join -> tiles ->
    rasterize) plus a shuffle of the doc table itself; the doc table's spans
    must be untouched."""
    from geotrellis_contrib_spark.operators import spatial_join as sj
    from geotrellis_contrib_spark.operators import tiling

    anchors = corpus.extract_anchors(docs)
    boxes = spark.createDataFrame(
        [("hot", -74.25, 40.45, -73.75, 40.95), ("side", -10.0, -10.0, 10.0, 10.0)],
        "poly_id string, xmin double, ymin double, xmax double, ymax double")
    hits = sj.pip_join_boxes(anchors, boxes, zoom=6)
    tiles = tiling.assign_tiles(hits, [10, 12])
    assert tiles.count() > 0

    # docs round-trip through a repartition+shuffle and a parquet write
    shuffled = docs.repartition(5, "doc_id").sortWithinPartitions("doc_id")
    corpus.assert_span_invariant(docs, shuffled)

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        shuffled.write.mode("overwrite").parquet(f"{d}/docs")
        back = spark.read.parquet(f"{d}/docs")
        corpus.assert_span_invariant(docs, back)

    # and the invariant check itself catches violations
    mutated = docs.withColumn(
        "spans",
        F.when(F.col("doc_id") == "doc-000000000003",
               F.slice("spans", 1, 2)).otherwise(F.col("spans")))
    with pytest.raises(AssertionError):
        corpus.assert_span_invariant(docs, mutated)
