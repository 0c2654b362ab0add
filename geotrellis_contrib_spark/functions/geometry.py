"""Geometry functions for DataFrames.

Two tiers, mirroring the engine rule "UDFs are the slow path":

  1. Pure-Column builders (JVM-side) for everything closed-form on x/y
     doubles: planar/haversine distance, bbox predicates, GeoJSON points.
  2. Arrow-vectorized pandas UDFs wrapping the numpy kernels in
     :mod:`geotrellis_contrib_spark.geom` for ring-based tests (exact PIP
     refine against arbitrary polygons). Polygon rings travel as WKB binary;
     the UDF decodes each DISTINCT polygon once per batch (polygons are the
     small dimension side — decode cost is O(#polygons), not O(#points)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geotrellis_contrib_spark import geom

# --- tier 1: pure Column builders -----------------------------------------


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def planar_distance(x1, y1, x2, y2) -> Column:
    """sqrt((x1-x2)^2 + (y1-y2)^2) — PostGIS distance() on planar srids
    (semantics oracle: /root/reference/slick/src/test/.../PostgisSpec.scala:176-177)."""
    dx = _c(x1).cast("double") - _c(x2).cast("double")
    dy = _c(y1).cast("double") - _c(y2).cast("double")
    return F.sqrt(dx * dx + dy * dy)


def haversine_m(lon1, lat1, lon2, lat2, radius: float = 6371008.8) -> Column:
    lam1, phi1 = F.radians(_c(lon1)), F.radians(_c(lat1))
    lam2, phi2 = F.radians(_c(lon2)), F.radians(_c(lat2))
    h = F.pow(F.sin((phi2 - phi1) / 2), 2) + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin((lam2 - lam1) / 2), 2)
    return F.lit(2.0 * radius) * F.asin(F.sqrt(h))


def bbox_intersects(axmin, aymin, axmax, aymax, bxmin, bymin, bxmax, bymax) -> Column:
    """PostGIS ``&&`` bounding-box overlap (PostgisSpec.scala:135,165-170)."""
    return ((_c(axmin) <= _c(bxmax)) & (_c(axmax) >= _c(bxmin))
            & (_c(aymin) <= _c(bymax)) & (_c(aymax) >= _c(bymin)))


def point_in_box(px, py, xmin, ymin, xmax, ymax) -> Column:
    """Exact PIP for axis-aligned boxes — the pure-SQL fast path of the
    spatial join (half-open: left/bottom in, right/top out, matching
    geom.point_in_ring's tie-break)."""
    return ((_c(px) >= _c(xmin)) & (_c(px) < _c(xmax))
            & (_c(py) >= _c(ymin)) & (_c(py) < _c(ymax)))


def point_geojson(x, y) -> Column:
    """GeoJSON point string; golden
    ``{"type":"Point","coordinates":[75.97,40.38]}`` (PostgisSpec.scala:193-196).
    Numbers are rendered with no trailing zeros (integers bare)."""
    def num(v):
        d = _c(v).cast("double")
        return F.when(d == d.cast("long").cast("double"), d.cast("long").cast("string")) \
                .otherwise(d.cast("string"))
    return F.concat(F.lit('{"type":"Point","coordinates":['), num(x), F.lit(","), num(y), F.lit("]}"))


# --- tier 2: Arrow-vectorized pandas UDFs ----------------------------------


@F.pandas_udf(T.BooleanType())
def pip_wkb(px: pd.Series, py: pd.Series, wkb: pd.Series) -> pd.Series:
    """Exact point-in-polygon refine: (x, y) vs a WKB polygon column.

    Vectorized per distinct polygon: the batch is grouped by the WKB bytes,
    each polygon decoded once, then the crossing-number kernel runs over all
    of its points at once (numpy). This is the refine phase after the coarse
    cell-equi-join (SURVEY.md §2.2 "bbox-overlap spatial filter").
    """
    out = np.zeros(len(px), dtype=bool)
    x = px.to_numpy(dtype=np.float64)
    y = py.to_numpy(dtype=np.float64)
    codes, uniques = pd.factorize(wkb)
    for i, blob in enumerate(uniques):
        mask = codes == i
        if blob is None:
            continue
        g = geom.wkb_decode(bytes(blob))
        if g["type"] == geom.WKB_POLYGON:
            out[mask] = geom.point_in_polygon(x[mask], y[mask], g["coords"])
        elif g["type"] == geom.WKB_MULTIPOLYGON:
            acc = np.zeros(mask.sum(), dtype=bool)
            for rings in g["coords"]:
                acc |= geom.point_in_polygon(x[mask], y[mask], rings)
            out[mask] = acc
        else:
            raise ValueError(f"pip_wkb: not a polygon (type {g['type']})")
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def linestring_length_wkb(wkb: pd.Series) -> pd.Series:
    """PostGIS length() over WKB linestrings (golden 2.0, SURVEY.md §2.7)."""
    return wkb.map(lambda b: geom.linestring_length(geom.wkb_decode(bytes(b))["coords"])
                   if b is not None else None)


@F.pandas_udf(T.StructType([T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]))
def centroid_wkb(wkb: pd.Series) -> pd.DataFrame:
    """PostGIS centroid() over WKB point/multipoint/polygon (golden (1.5,1.5))."""
    xs, ys = [], []
    for b in wkb:
        if b is None:
            xs.append(None); ys.append(None); continue
        g = geom.wkb_decode(bytes(b))
        if g["type"] == geom.WKB_POINT:
            cx, cy = g["coords"]
        elif g["type"] == geom.WKB_MULTIPOINT:
            cx, cy = geom.multipoint_centroid(g["coords"])
        elif g["type"] == geom.WKB_POLYGON:
            cx, cy = geom.polygon_centroid(g["coords"][0])
        else:
            raise ValueError(f"centroid_wkb: unsupported type {g['type']}")
        xs.append(cx); ys.append(cy)
    return pd.DataFrame({"x": xs, "y": ys})


@F.pandas_udf(T.BinaryType())
def box_to_wkb(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
    """Axis-aligned box -> EWKB polygon (5-point closed ring, srid 4326)."""
    return pd.Series([
        geom.wkb_encode(geom.WKB_POLYGON,
                        [[(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)]],
                        srid=4326)
        for x0, y0, x1, y1 in zip(xmin, ymin, xmax, ymax)
    ])


@F.pandas_udf(T.BinaryType())
def lpath_to_wkb(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
    """Axis-aligned L-path -> WKB linestring (SW corner up, then across to
    NE): exact length = (ymax-ymin) + (xmax-xmin) — the measurable
    linestring fixture for the scalar-function gate
    (PostGisProjectionSupportSpec.scala:60-72 length semantics)."""
    return pd.Series([
        geom.wkb_encode(geom.WKB_LINESTRING,
                        [(x0, y0), (x0, y1), (x1, y1)])
        for x0, y0, x1, y1 in zip(xmin, ymin, xmax, ymax)
    ])


@F.pandas_udf(T.BinaryType())
def point_to_wkb(x: pd.Series, y: pd.Series, srid: pd.Series) -> pd.Series:
    """Encode points as EWKB (little-endian) — the sink-side codec."""
    return pd.Series([
        geom.wkb_encode(geom.WKB_POINT, (float(a), float(b)), srid=int(s))
        if not (pd.isna(a) or pd.isna(b)) else None
        for a, b, s in zip(x, y, srid)
    ])
