"""Spatial joins: point-in-polygon join and distance theta-join.

Both follow the two-phase plan the engine is built around (SURVEY.md §2.2-2.3):

  coarse phase  — equi-join on spatial cell keys (a normal Spark shuffle/
                  broadcast hash join; Catalyst/AQE pick the physical join
                  and handle skew), where one side is tessellated to its
                  covering cells JVM-side via ``sequence``+``explode``;
  refine phase  — exact geometry predicate, still JVM-side for boxes
                  (pure column arithmetic) and Arrow-vectorized for
                  arbitrary polygons (``pip_wkb``).

Reference semantics: bbox-overlap select/delete
(/root/reference/slick/src/test/.../PostgisSpec.scala:133-140,161-170) and the
distance self-join with its in-memory JTS oracle (PostgisSpec.scala:174-188).

Scale design (10^12 docs):
  - The polygon side is exploded to cover cells and broadcast when small
    (dimension tables); for large polygon sets the same plan becomes a
    shuffled equi-join on ``cell`` — no code change.
  - Zoom choice bounds fan-out: a polygon of diameter D at cell size C
    explodes to ~(D/C+2)^2 cells. ``auto_zoom_for_extent`` picks C near the
    median polygon diameter.
  - Hot cells (urban clusters) skew the shuffle; AQE skew-join splits them,
    and ``salted`` offers explicit conjugate salting for the worst cases.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotrellis_contrib_spark.functions import cells as C
from geotrellis_contrib_spark.functions import geometry as G


def with_cover_cells(boxes: DataFrame, zoom: int,
                     xmin="xmin", ymin="ymin", xmax="xmax", ymax="ymax") -> DataFrame:
    """Explode each bbox row to its covering cell keys at ``zoom``.

    Pure JVM: two nested ``explode(sequence(...))`` — the engine's
    ``keysForGeometry`` for the bbox case
    (/root/reference/benchmark/.../GeotrellisRasterSourceBench.scala:36-37).

    Emits BOTH (cell_col, cell_row) and the packed single-long ``cell``.
    Joins MUST use ``cell``: a single int64 equi-key gives Spark a
    LongHashedRelation (dense, allocation-free probes) instead of the generic
    two-column UnsafeHashedRelation — measured 2-3x faster and
    near-linearly scalable on the probe side (BENCH.md).
    """
    c0, c1, r0, r1 = C.tiles_for_bbox(zoom, F.col(xmin), F.col(ymin), F.col(xmax), F.col(ymax))
    return (
        boxes
        .withColumn("cell_col", F.explode(F.sequence(c0, c1)))
        .withColumn("cell_row", F.explode(F.sequence(r0, r1)))
        .withColumn("cell", C.cell_id(F.lit(zoom), F.col("cell_col"), F.col("cell_row")))
    )


def pip_join_boxes(points: DataFrame, boxes: DataFrame, zoom: int = 6,
                   lon="lon", lat="lat", broadcast_boxes: bool = True) -> DataFrame:
    """Inner join: point rows x box-polygon rows that contain them.

    points: any columns + lon/lat (NULL geometry rows drop out, matching the
    reference's Option[Point] filter semantics, PostgisSpec.scala:223-232).
    boxes:  poly_id + xmin/ymin/xmax/ymax.

    Containment is half-open ([xmin,xmax) x [ymin,ymax)) so a plane tiled by
    touching boxes assigns each point exactly once.
    """
    cov = with_cover_cells(boxes, zoom).drop("cell_col", "cell_row")
    if broadcast_boxes:
        cov = F.broadcast(cov)
    pts = points.filter(F.col(lon).isNotNull() & F.col(lat).isNotNull()) \
                .withColumn("cell", C.encode_point(F.col(lon), F.col(lat), zoom))
    joined = pts.join(cov, "cell", "inner")
    refined = joined.filter(
        G.point_in_box(F.col(lon), F.col(lat),
                       F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
    )
    return refined.drop("cell")


def with_cover_cells_wkb(polygons: DataFrame, zoom: int,
                         wkb_col: str = "wkb") -> DataFrame:
    """Explode WKB polygons to their EXACT covering cells at ``zoom``
    (grid.keys_for_polygon: polygon-vs-cell-box intersection, not bbox
    cover) — tighter candidate sets for sprawling/diagonal shapes. Runs as
    an Arrow UDF, but only over the SMALL polygon side."""
    from pyspark.sql import types as T

    from geotrellis_contrib_spark import geom as GM
    from geotrellis_contrib_spark import grid as GR

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover_cells(wkb: pd.Series) -> pd.Series:
        out = []
        for blob in wkb:
            g = GM.wkb_decode(bytes(blob))
            ringsets = g["coords"] if g["type"] == GM.WKB_MULTIPOLYGON else [g["coords"]]
            cells: set[int] = set()
            for rings in ringsets:
                cols, rows = GR.keys_for_polygon(rings, zoom)
                cells.update(int(x) for x in GR.pack_cell(zoom, cols, rows))
            out.append(sorted(cells))
        return pd.Series(out)

    return polygons.withColumn("cell", F.explode(cover_cells(F.col(wkb_col))))


def pip_join_wkb(points: DataFrame, polygons: DataFrame, zoom: int = 6,
                 lon="lon", lat="lat", wkb_col="wkb") -> DataFrame:
    """PIP join against arbitrary polygons: coarse EXACT-cover cell join
    (with_cover_cells_wkb), then the Arrow-vectorized crossing-number refine
    (``pip_wkb``). ``polygons`` needs bbox columns + a WKB column."""
    cov = F.broadcast(with_cover_cells_wkb(polygons, zoom, wkb_col))
    pts = points.filter(F.col(lon).isNotNull() & F.col(lat).isNotNull()) \
                .withColumn("cell", C.encode_point(F.col(lon), F.col(lat), zoom))
    joined = pts.join(cov, "cell", "inner")
    return joined.filter(G.pip_wkb(F.col(lon), F.col(lat), F.col(wkb_col))) \
                 .drop("cell")


def zoom_for_radius(radius_deg: float, max_abs_lat: float = 66.0) -> int:
    """Finest zoom whose cell is >= radius in BOTH axes up to ``max_abs_lat``.

    Mercator tile height in degrees shrinks ~cos(lat) away from the equator,
    so the latitude bound participates: height(z, lat) ~ 360/2^z * cos(lat).
    """
    usable = 360.0 * math.cos(math.radians(max_abs_lat))
    z = int(math.floor(math.log2(usable / radius_deg)))
    return max(0, min(z, 22))


def _neighbor_cells(df: DataFrame, zoom: int, col="cell_col", row="cell_row") -> DataFrame:
    """Explode each row to its 3x3 cell neighborhood (col wraps at the
    antimeridian, row clips at the poles), packed into the single-long
    ``cell`` join key — the build side of the ring join."""
    n = 1 << zoom
    df = df.withColumn("_dc", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))) \
           .withColumn("_dr", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
    df = df.withColumn("cell", C.cell_id(
               F.lit(zoom),
               F.pmod(F.col(col) + F.col("_dc"), F.lit(n)),
               F.col(row) + F.col("_dr"))) \
           .filter((F.col(row) + F.col("_dr") >= 0) & (F.col(row) + F.col("_dr") < n)) \
           .drop("_dc", "_dr")
    return df


def distance_join(points_a: DataFrame, points_b: DataFrame, radius: float,
                  zoom: int | None = None, max_abs_lat: float = 66.0,
                  lon="lon", lat="lat", dist_col: str = "dist") -> DataFrame:
    """All (a, b) pairs with planar distance < ``radius`` degrees.

    Plan: encode A at ``zoom`` (cell >= radius in both axes), explode B to the
    3x3 ring, equi-join on the cell key, exact-distance refine. Every
    candidate pair is generated exactly once (B's 9 ring cells are distinct,
    match is on A's single cell). AQE skew-join splits hot cells at runtime.

    Reference semantics + oracle: PostgisSpec.scala:174-188 (distance < 0.5
    theta self-join verified against a naive cross product).
    """
    if zoom is None:
        zoom = zoom_for_radius(radius, max_abs_lat)
    if zoom < 2:
        # at zoom <= 1 the 3x3 ring wraps onto itself (pmod duplicates a
        # neighbor) and candidate pairs would be emitted twice
        raise ValueError(f"distance_join requires zoom >= 2 (got {zoom}); "
                         f"radius {radius} deg is too large for the ring plan")
    a = (points_a.filter(F.col(lon).isNotNull())
         .select([F.col(c).alias(f"a_{c}") for c in points_a.columns])
         .withColumn("cell", C.encode_point(F.col(f"a_{lon}"), F.col(f"a_{lat}"), zoom)))
    b = (points_b.filter(F.col(lon).isNotNull())
         .select([F.col(c).alias(f"b_{c}") for c in points_b.columns])
         .withColumn("cell_col", C.tile_col(F.col(f"b_{lon}"), zoom))
         .withColumn("cell_row", C.tile_row(F.col(f"b_{lat}"), zoom)))
    b = _neighbor_cells(b, zoom).drop("cell_col", "cell_row")
    joined = a.join(b, "cell", "inner")
    d = G.planar_distance(F.col(f"a_{lon}"), F.col(f"a_{lat}"),
                          F.col(f"b_{lon}"), F.col(f"b_{lat}"))
    return joined.withColumn(dist_col, d).filter(F.col(dist_col) < radius) \
                 .drop("cell")


def segment_intersection_join(a: DataFrame, b: DataFrame,
                              cell: int = 16,
                              max_cells_per_seg: int = 4096) -> DataFrame:
    """Segment × segment PROPER-intersection join with EXACT rational
    intersection points — the line-layer overlay op (GeoTrellis exposes
    it as geometry.intersection over vector layers via JTS; the
    reference's vector side rides the same JTS geometries, e.g. the
    PostGIS geometry columns of
    /root/reference/slick/src/test/scala/geotrellis/slick/PostgisSpec.scala:133-140).

    Inputs: integer-coordinate segment tables (seg_id, x1, y1, x2, y2).
    Output one row per properly-crossing pair: (a_id, b_id, num_x,
    num_y, den) where the crossing point is EXACTLY (num_x/den,
    num_y/den), den = |cross(a_dir, b_dir)| > 0 pinned (the Voronoi
    representation trick — with den pinned the numerators are uniquely
    determined integers, so no gcd, no float, bit-exact both sides).
    Proper = strict sign-opposition on both straddle tests; collinear
    overlaps and endpoint touches are excluded by construction (the
    deterministic convention; touching-pair semantics belong to a
    snap-tolerance pass, not an exact join).

    Scale shape: each segment explodes to the grid cells of its bbox
    (bounded fan-out, in-plan raise past ``max_cells_per_seg``), the
    join is ONE int64-cell equi-join, and the pair DEDUPE IS FREE — a
    matched pair is kept only in the single cell
    (max(a_cxmin, b_cxmin), max(a_cymin, b_cymin)), which both cover
    rectangles provably contain, so no DISTINCT shuffle exists. All
    arithmetic is int64 Column algebra inside whole-stage codegen:
    coords < 2^15 keep every cross < 2^31 and every numerator < 2^48.
    """
    def prep(df: DataFrame, tag: str) -> DataFrame:
        over = ((F.greatest(F.abs(F.col("x1")), F.abs(F.col("y1")),
                            F.abs(F.col("x2")), F.abs(F.col("y2")))
                 >= F.lit(1 << 15)) |
                ((F.col("x1") == F.col("x2"))
                 & (F.col("y1") == F.col("y2"))))
        chk = F.when(over, F.raise_error(F.concat(
            F.lit(f"segment_intersection_join[{tag}]: coordinate "
                  f"past int64 envelope (|v| >= 2^15) or degenerate "
                  f"point segment, seg_id="),
            F.col("seg_id").cast("string")))).otherwise(F.lit(0))
        cxmin = F.floor(F.least("x1", "x2") / cell)
        cxmax = F.floor(F.greatest("x1", "x2") / cell)
        cymin = F.floor(F.least("y1", "y2") / cell)
        cymax = F.floor(F.greatest("y1", "y2") / cell)
        fan = F.when(
            (cxmax - cxmin + 1) * (cymax - cymin + 1)
            > F.lit(max_cells_per_seg),
            F.raise_error(F.concat(
                F.lit(f"segment_intersection_join[{tag}]: bbox covers "
                      f"> {max_cells_per_seg} cells, seg_id="),
                F.col("seg_id").cast("string")))).otherwise(F.lit(0))
        return (df.select(
            (F.col("seg_id") + chk + fan).alias(f"{tag}_id"),
            *[F.col(c).cast("long").alias(f"{tag}_{c}")
              for c in ("x1", "y1", "x2", "y2")],
            cxmin.alias(f"{tag}_cxmin"), cymin.alias(f"{tag}_cymin"),
            F.explode(F.sequence(cxmin, cxmax)).alias("ccx"))
            .withColumn("ccy", F.explode(F.sequence(
                F.floor(F.least(f"{tag}_y1", f"{tag}_y2") / cell),
                F.floor(F.greatest(f"{tag}_y1", f"{tag}_y2") / cell))))
            .withColumn("ccell", F.col("ccx") * F.lit(1 << 20)
                        + F.col("ccy"))
            .drop("ccx", "ccy"))

    pa, pb = prep(a, "a"), prep(b, "b")
    j = pa.join(pb, "ccell")
    # free dedupe: keep the pair only in the provably-shared canonical
    # cell — the top-left-most cell of the bbox intersection
    canon = (F.greatest("a_cxmin", "b_cxmin") * F.lit(1 << 20)
             + F.greatest("a_cymin", "b_cymin"))
    j = j.filter(F.col("ccell") == canon)

    rx, ry = F.col("a_x2") - F.col("a_x1"), F.col("a_y2") - F.col("a_y1")
    sx, sy = F.col("b_x2") - F.col("b_x1"), F.col("b_y2") - F.col("b_y1")
    # straddle tests: b endpoints against line a, a endpoints against b
    d1 = rx * (F.col("b_y1") - F.col("a_y1")) \
        - ry * (F.col("b_x1") - F.col("a_x1"))
    d2 = rx * (F.col("b_y2") - F.col("a_y1")) \
        - ry * (F.col("b_x2") - F.col("a_x1"))
    d3 = sx * (F.col("a_y1") - F.col("b_y1")) \
        - sy * (F.col("a_x1") - F.col("b_x1"))
    d4 = sx * (F.col("a_y2") - F.col("b_y1")) \
        - sy * (F.col("a_x2") - F.col("b_x1"))
    # sign opposition, NOT d1*d2 < 0: the straddle determinants reach
    # 2^33, so their product would overflow int64
    j = j.filter((((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
                 & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))))

    den = rx * sy - ry * sx                      # ≠ 0 given proper cross
    tn = (F.col("b_x1") - F.col("a_x1")) * sy \
        - (F.col("b_y1") - F.col("a_y1")) * sx   # t = tn/den along a
    sgn = F.when(den < 0, F.lit(-1)).otherwise(F.lit(1))
    return j.select(
        F.col("a_id"), F.col("b_id"),
        (sgn * (F.col("a_x1") * den + rx * tn)).alias("num_x"),
        (sgn * (F.col("a_y1") * den + ry * tn)).alias("num_y"),
        (sgn * den).alias("den"))


def geodesic_pairs(points: DataFrame, radius_m: float,
                   id_col: str = "pid", lon: str = "lon",
                   lat: str = "lat",
                   max_abs_lat: float = 66.0) -> DataFrame:
    """Geodesic self-join: all point pairs (a_id < b_id) within
    ``radius_m`` METERS along the WGS84 ellipsoid — the PostGIS
    geography ``ST_DWithin`` analog (the reference's slick tier stores
    exactly such point columns, PostgisSpec.scala:174-188 being the
    planar cousin). Same two-phase plan as :func:`distance_join`:
    cell-ring equi-join at a zoom whose cell covers a CONSERVATIVE
    angular radius (radius_m / 100000 — one degree is ≥ 100 km on
    WGS84 in both axes, so the ring provably covers every geodesic
    neighbor), then an Arrow-vectorized Vincenty-inverse refine
    (grid.vincenty_distance, pinned iterations). The refine emits the
    mm-quantized distance dist_q = floor(s·1000 + 0.5) and filters on
    the INTEGER threshold, so the join predicate is bit-reproducible.
    Output: (a_id, b_id, dist_q)."""
    import numpy as np
    import pandas as pd

    from geotrellis_contrib_spark.grid import vincenty_distance

    radius_deg = float(radius_m) / 100000.0
    zoom = zoom_for_radius(radius_deg, max_abs_lat)
    if zoom < 2:
        raise ValueError(
            f"geodesic_pairs: radius {radius_m} m needs zoom < 2; "
            "the 3x3 ring would self-wrap")
    base = points.filter(F.col(lon).isNotNull()).select(
        F.col(id_col).alias("pid"), F.col(lon).alias("plon"),
        F.col(lat).alias("plat"))
    a = (base.select(F.col("pid").alias("a_id"),
                     F.col("plon").alias("a_lon"),
                     F.col("plat").alias("a_lat"))
         .withColumn("cell", C.encode_point(F.col("a_lon"),
                                            F.col("a_lat"), zoom)))
    b = (base.select(F.col("pid").alias("b_id"),
                     F.col("plon").alias("b_lon"),
                     F.col("plat").alias("b_lat"))
         .withColumn("cell_col", C.tile_col(F.col("b_lon"), zoom))
         .withColumn("cell_row", C.tile_row(F.col("b_lat"), zoom)))
    b = _neighbor_cells(b, zoom).drop("cell_col", "cell_row")
    cand = a.join(b, "cell").filter(F.col("a_id") < F.col("b_id")) \
            .select("a_id", "a_lon", "a_lat", "b_id", "b_lon", "b_lat")
    radius_mm = int(round(float(radius_m) * 1000.0))

    def refine(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            s = vincenty_distance(pdf["a_lon"].to_numpy(),
                                  pdf["a_lat"].to_numpy(),
                                  pdf["b_lon"].to_numpy(),
                                  pdf["b_lat"].to_numpy())
            q = np.floor(s * 1000.0 + 0.5).astype(np.int64)
            keep = q <= radius_mm
            yield pd.DataFrame({
                "a_id": pdf["a_id"].to_numpy()[keep],
                "b_id": pdf["b_id"].to_numpy()[keep],
                "dist_q": q[keep]})

    return cand.mapInPandas(refine,
                            "a_id long, b_id long, dist_q long")


def box_overlap_join(a: DataFrame, b: DataFrame, zoom: int = 6,
                     id_col: str = "poly_id") -> DataFrame:
    """Rectangle OVERLAY join: all (a, b) box pairs with positive-area
    intersection, plus the EXACT intersection rectangle and its area —
    JTS/PostGIS ST_Intersection semantics for the axis-aligned case
    (the reference's slick tier filters exactly such bbox geometry
    columns, PostgisSpec.scala:133-140). Touching edges/corners (zero
    width or height) are excluded by the strict predicate.

    Scale shape: each box explodes to its zoom-``zoom`` cover cells
    (bounded fan-out), ONE int64-cell equi-join, and the pair dedupe
    is FREE via the canonical shared cell (max of per-axis cover
    minima — in both cover rectangles whenever any cell matches; the
    segment_intersection_join trick). The intersection corners are
    GREATEST/LEAST selections of input doubles and the area is one
    subtraction pair + one multiply — identical IEEE ops on identical
    operands on both sides. Output: (a_id, b_id, ixmin, iymin, ixmax,
    iymax, area)."""
    def prep(df: DataFrame, tag: str) -> DataFrame:
        c0, c1, r0, r1 = C.tiles_for_bbox(
            zoom, F.col("xmin"), F.col("ymin"),
            F.col("xmax"), F.col("ymax"))
        return (df.select(
            F.col(id_col).alias(f"{tag}_id"),
            *[F.col(c).alias(f"{tag}_{c}")
              for c in ("xmin", "ymin", "xmax", "ymax")],
            c0.alias(f"{tag}_c0"), r0.alias(f"{tag}_r0"),
            F.explode(F.sequence(c0, c1)).alias("ccx"))
            .withColumn("ccy", F.explode(F.sequence(
                C.tiles_for_bbox(zoom, F.col(f"{tag}_xmin"),
                                 F.col(f"{tag}_ymin"),
                                 F.col(f"{tag}_xmax"),
                                 F.col(f"{tag}_ymax"))[2],
                C.tiles_for_bbox(zoom, F.col(f"{tag}_xmin"),
                                 F.col(f"{tag}_ymin"),
                                 F.col(f"{tag}_xmax"),
                                 F.col(f"{tag}_ymax"))[3])))
            .withColumn("ccell", F.col("ccx") * F.lit(1 << 22)
                        + F.col("ccy"))
            .drop("ccx", "ccy"))

    pa, pb = prep(a, "a"), prep(b, "b")
    j = pa.join(pb, "ccell").filter(F.col("a_id") < F.col("b_id"))
    canon = (F.greatest("a_c0", "b_c0") * F.lit(1 << 22)
             + F.greatest("a_r0", "b_r0"))
    j = j.filter(F.col("ccell") == canon)
    ixmin = F.greatest("a_xmin", "b_xmin")
    iymin = F.greatest("a_ymin", "b_ymin")
    ixmax = F.least("a_xmax", "b_xmax")
    iymax = F.least("a_ymax", "b_ymax")
    j = j.filter((ixmax > ixmin) & (iymax > iymin))
    return j.select(
        F.col("a_id"), F.col("b_id"),
        ixmin.alias("ixmin"), iymin.alias("iymin"),
        ixmax.alias("ixmax"), iymax.alias("iymax"),
        ((ixmax - ixmin) * (iymax - iymin)).alias("area"))


def box_union_area(boxes: DataFrame, cell_deg: int = 45,
                   q: float = 1048576.0,
                   id_col: str = "poly_id") -> DataFrame:
    """UNION AREA of axis-aligned boxes (ST_Union + ST_Area for the
    rectangular case — the coverage statistic overlay analyses need;
    the aggregate sibling of :func:`box_overlap_join`, which reports
    pairs): per ``cell_deg``-degree grid cell, the number of boxes
    touching it and the EXACT quantized area of their union within it.

    Algorithm: grid-partitioned coordinate compression. Each box
    explodes to its (bounded) cover cells, is CLIPPED to the cell
    (GREATEST/LEAST selections — no arithmetic on coordinates), and
    per cell the union is the sum over compressed-grid pieces covered
    by any box. Every piece is quantized floor(dx*dy*q + 0.5) BEFORE
    the sum, so the rollup is an order-free integer sum; dx/dy are
    single IEEE subtractions of selected input doubles and the piece
    SET (distinct clipped edges) is engine-independent — the whole
    chain is bit-reproducible (the box_overlay discipline extended by
    compression). Empty clips (a box touching a cell edge) drop out
    via the strict positive-area filter, so the half-open convention
    is implied rather than special-cased.

    Scale shape: ONE bounded explode + ONE shuffle on the cell key;
    per-cell work is O(local_boxes^2) in the compressed grid — bounded
    by local density, never global size (the skew answer is a finer
    ``cell_deg``, exactly like the spatial joins above)."""
    import numpy as np

    d = float(cell_deg)
    gxmin = F.floor((F.col("xmin") + F.lit(180.0)) / F.lit(d)).cast("int")
    gxmax = F.floor((F.col("xmax") + F.lit(180.0)) / F.lit(d)).cast("int")
    gymin = F.floor((F.col("ymin") + F.lit(90.0)) / F.lit(d)).cast("int")
    gymax = F.floor((F.col("ymax") + F.lit(90.0)) / F.lit(d)).cast("int")
    cl = (boxes
          .withColumn("gx", F.explode(F.sequence(gxmin, gxmax)))
          .withColumn("gy", F.explode(F.sequence(gymin, gymax)))
          .select(
              "gx", "gy",
              F.greatest(F.col("xmin"), F.col("gx") * F.lit(d)
                         - F.lit(180.0)).alias("cxmin"),
              F.least(F.col("xmax"), (F.col("gx") + F.lit(1)) * F.lit(d)
                      - F.lit(180.0)).alias("cxmax"),
              F.greatest(F.col("ymin"), F.col("gy") * F.lit(d)
                         - F.lit(90.0)).alias("cymin"),
              F.least(F.col("ymax"), (F.col("gy") + F.lit(1)) * F.lit(d)
                      - F.lit(90.0)).alias("cymax"))
          .filter((F.col("cxmax") > F.col("cxmin"))
                  & (F.col("cymax") > F.col("cymin"))))

    def compress(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gx, gy = int(key[0]), int(key[1])
        x0 = pdf["cxmin"].to_numpy()
        x1 = pdf["cxmax"].to_numpy()
        y0 = pdf["cymin"].to_numpy()
        y1 = pdf["cymax"].to_numpy()
        xs = np.unique(np.concatenate([x0, x1]))
        ys = np.unique(np.concatenate([y0, y1]))
        cov = np.zeros((len(xs) - 1, len(ys) - 1), dtype=bool)
        i0 = np.searchsorted(xs, x0)
        i1 = np.searchsorted(xs, x1)
        j0 = np.searchsorted(ys, y0)
        j1 = np.searchsorted(ys, y1)
        for a, b, c, e in zip(i0, i1, j0, j1):
            cov[a:b, c:e] = True
        piece_q = np.floor(np.outer(np.diff(xs), np.diff(ys))
                           * q + 0.5).astype(np.int64)
        return pd.DataFrame([{
            "gx": gx, "gy": gy, "n_boxes": int(len(pdf)),
            "area_q": int(piece_q[cov].sum())}])

    return cl.groupBy("gx", "gy").applyInPandas(
        compress, "gx int, gy int, n_boxes bigint, area_q bigint")
