"""Physical layout: partition pruning must reach the directory level."""

import tempfile

import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark import derive
from geotrellis_contrib_spark.sources import tables
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def tile_path(spark, tmp_path_factory):
    derive.load_base_views(spark, SF_SMALL)
    tiles = spark.sql(derive.TILES_SQL)
    path = str(tmp_path_factory.mktemp("tiles") / "tile_table")
    tables.write_tile_table(tiles, path)
    return path


def test_roundtrip(spark, tile_path):
    derive.load_base_views(spark, SF_SMALL)
    orig = spark.sql(derive.TILES_SQL)
    back = spark.read.parquet(tile_path)
    assert back.count() == orig.count()
    assert "bucket" in back.columns and "cell" in back.columns


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_zoom_partition_pruning(spark, tile_path):
    z6 = tables.read_tiles(spark, tile_path, zoom=6)
    plan = _plan(z6)
    assert "PartitionFilters" in plan and "zoom" in plan.split("PartitionFilters")[1][:200]
    assert tables.read_tiles(spark, tile_path, zoom=99).count() == 0


def test_bbox_bucket_pruning(spark, tile_path):
    full = tables.read_tiles(spark, tile_path, zoom=6)
    boxed = tables.read_tiles(spark, tile_path, zoom=6, bbox=(-80.0, 30.0, -70.0, 40.0))
    # the bucket IN-list must land in PartitionFilters (directory pruning)
    pf = _plan(boxed).split("PartitionFilters")[1][:400]
    assert "bucket" in pf and ("=" in pf or " IN " in pf)
    # correctness: pruned read covers exactly the bbox's tile block
    n_boxed, n_full = boxed.count(), full.count()
    assert 0 < n_boxed < n_full
    cols = {r.col for r in boxed.select("col").distinct().collect()}
    assert cols  # cover cells of the bbox only (bucket 8x8 blocks)
    assert all(16 <= c <= 23 for c in cols)  # bucket (2,3) spans cols 16..23


def test_doc_table_roundtrip(spark, tmp_path_factory):
    from geotrellis_contrib_spark import corpus
    docs = corpus.synth_docs(spark, 500, partitions=4)
    path = str(tmp_path_factory.mktemp("docs") / "doc_table")
    tables.write_doc_table(docs, path, n_partitions=4)
    back = spark.read.parquet(path)
    corpus.assert_span_invariant(docs, back)


def test_ddl(tile_path):
    ddl = tables.table_ddl("tiles_t", tile_path)
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS tiles_t USING parquet")
