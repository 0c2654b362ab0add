"""SQL function registry: textual Spark SQL surface matches the Column tier."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark import geom, grid
from geotrellis_contrib_spark.functions import registry


@pytest.fixture(scope="module")
def reg(spark):
    return registry.register_all(spark)


def test_sql_udfs_match_kernels(spark, reg):
    row = spark.sql("""
      SELECT gcs_tile_col(-74.0060, 12) AS c, gcs_tile_row(40.7128, 12) AS r,
             gcs_cell_id(12, 1205, 1540) AS cell,
             gcs_cell_parent(gcs_cell_id(12, 1205, 1540)) AS parent,
             gcs_mercator_x(180.0) AS mx,
             gcs_distance(0.0, 0.0, 3.0, 4.0) AS d,
             gcs_point_in_box(1.0, 1.0, 0.0, 0.0, 2.0, 2.0) AS inb,
             gcs_point_in_box(2.0, 1.0, 0.0, 0.0, 2.0, 2.0) AS onedge,
             gcs_fingerprint('ab') AS fp
    """).first()
    assert (row.c, row.r) == (1205, 1540)
    assert row.cell == int(grid.pack_cell(12, 1205, 1540))
    assert row.parent == int(grid.pack_cell(11, 602, 770))
    assert row.mx == grid.MERC_MAX
    assert row.d == 5.0
    assert row.inb is True and row.onedge is False
    assert row.fp == 12805  # matches the char_poly_hash golden


def test_sql_udfs_are_not_python(spark, reg):
    plan = spark.sql(
        "SELECT gcs_cell_id(12, id, id) AS c FROM range(10)"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # SQL UDFs inline into Catalyst


def test_pandas_udf_registered(spark, reg):
    wkb = geom.wkb_encode(geom.WKB_POLYGON,
                          [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]], srid=4326)
    df = spark.createDataFrame([(1.0, 1.0, wkb), (9.0, 9.0, wkb)],
                               "x double, y double, wkb binary")
    df.createOrReplaceTempView("probe_pts")
    got = spark.sql("SELECT gcs_pip_wkb(x, y, wkb) AS hit FROM probe_pts").collect()
    assert [r.hit for r in got] == [True, False]
