"""SQL function registry: expose the engine surface to textual Spark SQL.

``register_all(spark)`` makes the cell/geometry/text functions callable from
``spark.sql`` strings — the engine's analog of the reference's slick-pg
extension-method registration (PostGisSupport.scala:59-74).

Column-tier functions register as SQL scalar UDFs (``CREATE TEMPORARY
FUNCTION ... RETURN <expression>``) — pure Catalyst expressions, inlined and
codegen'd, NO Python involved. The Arrow refine tier registers its pandas
UDFs through ``spark.udf.register``.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from geotrellis_contrib_spark.functions import geometry as G
from geotrellis_contrib_spark.functions.text import FP_BASE, FP_MOD
from geotrellis_contrib_spark.grid import MAX_LAT, MERC_MAX, MIN_LAT

_N = "POWER(2.0, CAST(zoom AS DOUBLE))"
_LAT = f"RADIANS(LEAST(GREATEST(lat, {MIN_LAT!r}), {MAX_LAT!r}))"
_MERC = f"LN(TAN({_LAT}) + 1.0 / COS({_LAT}))"

SQL_UDFS = {
    "tile_col": (
        "(lon DOUBLE, zoom INT) RETURNS BIGINT RETURN "
        f"CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * {_N}), 0), {_N} - 1.0) AS BIGINT)"),
    "tile_row": (
        "(lat DOUBLE, zoom INT) RETURNS BIGINT RETURN "
        f"CAST(LEAST(GREATEST(FLOOR((1.0 - {_MERC} / PI()) / 2.0 * {_N}), 0), {_N} - 1.0) AS BIGINT)"),
    "cell_id": (
        "(zoom INT, col BIGINT, row BIGINT) RETURNS BIGINT RETURN "
        "SHIFTLEFT(CAST(zoom AS BIGINT), 58) + SHIFTLEFT(col, 29) + row"),
    "cell_parent": (
        "(cell BIGINT) RETURNS BIGINT RETURN "
        "SHIFTLEFT(SHIFTRIGHT(cell, 58) - 1, 58) "
        "+ SHIFTLEFT(SHIFTRIGHT(SHIFTRIGHT(cell, 29) & 536870911, 1), 29) "
        "+ SHIFTRIGHT(cell & 536870911, 1)"),
    "mercator_x": (
        f"(lon DOUBLE) RETURNS DOUBLE RETURN lon * {MERC_MAX / 180.0!r}"),
    "mercator_y": (
        "(lat DOUBLE) RETURNS DOUBLE RETURN "
        f"LN(TAN((90.0 + LEAST(GREATEST(lat, {MIN_LAT!r}), {MAX_LAT!r})) * {math.pi / 360.0!r})) "
        f"* {MERC_MAX / math.pi!r}"),
    "distance": (
        "(x1 DOUBLE, y1 DOUBLE, x2 DOUBLE, y2 DOUBLE) RETURNS DOUBLE RETURN "
        "SQRT((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))"),
    "point_in_box": (
        "(px DOUBLE, py DOUBLE, x0 DOUBLE, y0 DOUBLE, x1 DOUBLE, y1 DOUBLE) "
        "RETURNS BOOLEAN RETURN px >= x0 AND px < x1 AND py >= y0 AND py < y1"),
    "fingerprint": (
        "(s STRING) RETURNS BIGINT RETURN "
        f"AGGREGATE(SPLIT(s, ''), CAST(0 AS BIGINT), "
        f"(acc, ch) -> (acc * {FP_BASE} + ASCII(ch)) % {FP_MOD})"),
}


def register_all(spark: SparkSession, prefix: str = "gcs_") -> list[str]:
    """Register engine functions as ``<prefix>*``; returns registered names."""
    names = []
    for name, body in SQL_UDFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {prefix}{name} {body}")
        names.append(f"{prefix}{name}")
    # Arrow tier (vectorized pandas UDFs)
    spark.udf.register(f"{prefix}pip_wkb", G.pip_wkb)
    spark.udf.register(f"{prefix}length_wkb", G.linestring_length_wkb)
    names += [f"{prefix}pip_wkb", f"{prefix}length_wkb"]
    return names
