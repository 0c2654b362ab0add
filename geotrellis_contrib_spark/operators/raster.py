"""Raster-side operators over the cell-keyed tile table.

The engine's raster model (SURVEY.md §1.1): a raster source is a DataFrame of
tile rows keyed by SpatialKey(zoom, col, row) + band, carrying either scalar
tile statistics (this module's aggregate paths) or packed pixel payloads
(binary; see operators.pixels for the mapInPandas pipelines). These operators
re-express:

  - mosaic merge — /root/reference/vlm/.../effect/MosaicRasterSource.scala:99-131:
    same-key tiles from N sources combine, FIRST non-NoData wins, left-biased
    by explicit source order (we make the bias deterministic via source_idx,
    per SURVEY.md §7 "hard parts" #1).
  - zonal stats (raster->vector) and rasterize (vector->raster) — BASELINE
    north_star paths.
  - raster summary — per-source metadata aggregation (count/extent/cellsize
    union semantics of MosaicRasterSource.scala:65-85,133-146).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotrellis_contrib_spark.functions import geometry as G


def tile_center_cols(df: DataFrame, zoom_col="zoom", col="col", row="row") -> DataFrame:
    """Attach tile-center lon/lat. NOTE: the latitude uses the explicit
    (exp(t)-exp(-t))/2 sinh form — the exact expression the DuckDB oracle
    evaluates — so both engines run the same float64 op sequence."""
    n = F.pow(F.lit(2.0), F.col(zoom_col).cast("double"))
    t = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * (F.col(row).cast("double") + F.lit(0.5)) / n)
    return (df
            .withColumn("center_lon", (F.col(col).cast("double") + F.lit(0.5)) / n * F.lit(360.0) - F.lit(180.0))
            .withColumn("center_lat", F.degrees(F.atan((F.exp(t) - F.exp(-t)) / F.lit(2.0)))))


def sql_tile_center(zoom: str, col: str, row: str) -> tuple[str, str]:
    """DuckDB/Spark-common SQL twins of tile_center_cols."""
    n = f"POWER(2.0, CAST({zoom} AS DOUBLE))"
    t = f"(PI() * (1.0 - 2.0 * (CAST({row} AS DOUBLE) + 0.5) / {n}))"
    lon = f"((CAST({col} AS DOUBLE) + 0.5) / {n} * 360.0 - 180.0)"
    lat = f"DEGREES(ATAN((EXP({t}) - EXP(-{t})) / 2.0))"
    return lon, lat


def mosaic_merge(tiles: DataFrame,
                 key_cols=("zoom", "col", "row", "band"),
                 val_col="val", order_col="source_idx") -> DataFrame:
    """Merge same-key tiles from multiple sources: first non-NoData wins,
    bias by explicit source order (deterministic re-expression of the
    left-biased merge at MosaicRasterSource.scala:121-131).

    Implemented as min(struct(...)) — a declarative aggregate that PARTIAL-
    aggregates map-side, so each mapper ships at most one candidate row per
    tile key instead of every source row through the shuffle (a row_number
    window would shuffle + sort the whole table). Ordering key:
    (val-is-null, source order, val nulls-last); remaining columns ride
    along in a nested struct and double as the final tie-break, making the
    winner fully deterministic.
    """
    null_flag = F.when(F.col(val_col).isNull(), F.lit(1)).otherwise(F.lit(0))
    # +inf stands in for NULL so the ordering matches asc_nulls_last
    ord_val = F.coalesce(F.col(val_col).cast("double"), F.lit(float("inf")))
    rest = [c for c in tiles.columns if c not in key_cols]
    win = F.min(F.struct(
        null_flag.alias("_nf"),
        F.col(order_col).alias("_ord"),
        ord_val.alias("_ov"),
        F.struct(*[F.col(c) for c in rest]).alias("_row"),
    ))
    out = tiles.groupBy(*[F.col(c) for c in key_cols]).agg(win.alias("_w"))
    return out.select(*key_cols, *[F.col(f"_w._row.{c}").alias(c) for c in rest])


def zonal_stats(tiles: DataFrame, boxes: DataFrame,
                val_col="val", group_extra=("band",)) -> DataFrame:
    """Tile statistics per polygon (raster->vector): assign each tile to the
    boxes containing its center (half-open), then partial+final aggregate.

    Plan: tile-center arithmetic (narrow) -> broadcast join with the polygon
    dimension -> hash aggregate. Sums stay deterministic because the fixture
    values are integral doubles (SURVEY.md §7 bit-parity note).
    """
    centered = tile_center_cols(tiles)
    joined = centered.join(
        F.broadcast(boxes),
        G.point_in_box(F.col("center_lon"), F.col("center_lat"),
                       F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")),
        "inner",
    )
    return (joined.groupBy("poly_id", *group_extra)
            .agg(F.count(val_col).alias("cnt"),
                 F.sum(val_col).alias("sum_val"),
                 F.min(val_col).alias("min_val"),
                 F.max(val_col).alias("max_val"),
                 (F.sum(val_col) / F.count(val_col)).alias("mean_val")))


def zonal_percentiles(tiles: DataFrame, boxes: DataFrame,
                      val_col="val",
                      group_extra=("band",)) -> DataFrame:
    """Exact DISCRETE quantiles (p25/p50/p75, type-1: smallest value
    whose cumulative count reaches ceil(p*n)) per polygon — the
    percentile polygonal summary next to :func:`zonal_stats`.

    Scale shape: NO per-polygon sort of raw values — tiles collapse to
    (poly, value) COUNTS first (the histogram trick: map-side partial
    aggregation bounds the shuffle by distinct values, not pixels),
    then one small cumulative window per polygon picks the thresholds
    with integer arithmetic (ceil(q·n/4) = floor((q·n+3)/4) — no float
    rank)."""
    from pyspark.sql.window import Window

    centered = tile_center_cols(tiles)
    joined = centered.join(
        F.broadcast(boxes),
        G.point_in_box(F.col("center_lon"), F.col("center_lat"),
                       F.col("xmin"), F.col("ymin"), F.col("xmax"),
                       F.col("ymax")),
        "inner",
    )
    keys = ["poly_id", *group_extra]
    counts = (joined.filter(F.col(val_col).isNotNull())
              .groupBy(*keys, val_col)
              .agg(F.count(F.lit(1)).alias("_c")))
    w = Window.partitionBy(*keys).orderBy(val_col) \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wp = Window.partitionBy(*keys)
    cum = (counts.withColumn("_cum", F.sum("_c").over(w))
           .withColumn("_n", F.sum("_c").over(wp)))
    aggs = [F.max("_n").alias("cnt")]
    for q in (1, 2, 3):
        k = F.floor((F.lit(q) * F.col("_n") + F.lit(3)) / F.lit(4))
        aggs.append(F.min(F.when(F.col("_cum") >= k, F.col(val_col)))
                    .alias(f"p{q * 25}"))
    return cum.groupBy(*keys).agg(*aggs)


def zonal_mode(tiles: DataFrame, boxes: DataFrame,
               val_col="val", group_extra=("band",)) -> DataFrame:
    """Majority / minority / distinct-count polygonal summary (the
    GeoTrellis mode/histogram polygonal-summary family next to
    :func:`zonal_stats` and :func:`zonal_percentiles`): per (poly,
    band) the most frequent value (SMALLEST value on count ties — the
    deterministic convention), the least frequent (same tie rule),
    n_distinct and total count.

    Scale shape: the same histogram trick as zonal_percentiles —
    tiles collapse to (poly, value) COUNTS first (map-side combined),
    then ONE more groupBy with struct-ordered argmin/argmax; no
    per-polygon sort of raw values ever exists. Ties and values are
    exact (counts are integers, selection only)."""
    centered = tile_center_cols(tiles)
    joined = centered.join(
        F.broadcast(boxes),
        G.point_in_box(F.col("center_lon"), F.col("center_lat"),
                       F.col("xmin"), F.col("ymin"), F.col("xmax"),
                       F.col("ymax")),
        "inner",
    )
    keys = ["poly_id", *group_extra]
    counts = (joined.filter(F.col(val_col).isNotNull())
              .groupBy(*keys, val_col)
              .agg(F.count(F.lit(1)).alias("_c")))
    maj = F.max(F.struct(F.col("_c").alias("c"),
                         (-F.col(val_col)).alias("nv")))
    mino = F.min(F.struct(F.col("_c").alias("c"),
                          F.col(val_col).alias("v")))
    return counts.groupBy(*keys).agg(
        F.sum("_c").alias("cnt"),
        F.count(F.lit(1)).alias("n_distinct"),
        (-maj["nv"]).alias("majority"),
        mino["v"].alias("minority"))


def rasterize_points(points: DataFrame, zoom: int,
                     lon="lon", lat="lat", weight=None) -> DataFrame:
    """Burn a point set into the tile grid (vector->raster): per-key count
    (+ optional weight sum). Partial aggregation happens map-side — the
    canonical scalable rasterizer."""
    from geotrellis_contrib_spark.functions import cells as C

    df = (points.filter(F.col(lon).isNotNull() & F.col(lat).isNotNull())
          .withColumn("col", C.tile_col(F.col(lon), zoom))
          .withColumn("row", C.tile_row(F.col(lat), zoom)))
    aggs = [F.count("*").alias("n_points")]
    if weight is not None:
        aggs.append(F.sum(weight).alias("sum_weight"))
    return df.groupBy("col", "row").agg(*aggs).withColumn("zoom", F.lit(zoom))


def band_attributes(tiles: DataFrame, meta_col: str = "band_meta") -> DataFrame:
    """attributesForBand analog (RasterMetadataF.scala:47-51 /
    GDALMetadataF.scala:30-61): distinct per-(source, band) tag maps exploded
    to rows. Sources without tags yield no rows (the mosaic's empty-attribute
    semantics, MosaicRasterSource.scala:73-75)."""
    return (tiles.filter(F.col(meta_col).isNotNull())
            .select("source_id", "band", F.explode(meta_col).alias("key", "value"))
            .distinct())


def reproject_coords(df: DataFrame, src_srid: int, dst_srid: int,
                     x_col: str = "lon", y_col: str = "lat") -> DataFrame:
    """Coordinate-column reproject with the reference's no-op short-circuit:
    same CRS returns the input plan UNCHANGED (builder-side elision —
    /root/reference/vlm/.../effect/RasterSourceF.scala:51-53; Catalyst can't
    see CRS semantics, so the engine elides before emitting the plan).
    Supported pairs: 4326 <-> 3857 and 4326 -> any UTM zone
    (EPSG:326xx north / 327xx south) — all closed-form pure JVM Columns
    (the UTM Krueger series uses Spark's sinh/cosh/atanh built-ins)."""
    from geotrellis_contrib_spark.functions import cells as C

    if src_srid == dst_srid:
        return df
    if (src_srid, dst_srid) == (4326, 3857):
        return (df.withColumn(x_col, C.mercator_x(F.col(x_col)))
                  .withColumn(y_col, C.mercator_y(F.col(y_col))))
    if (src_srid, dst_srid) == (3857, 4326):
        return (df.withColumn(x_col, C.inv_mercator_lon(F.col(x_col)))
                  .withColumn(y_col, C.inv_mercator_lat(F.col(y_col))))
    if src_srid == 4326 and 32601 <= dst_srid <= 32760 and dst_srid % 100 <= 60:
        zone = dst_srid % 100
        south = dst_srid >= 32701
        e, n = C.utm_easting_northing(F.col(x_col), F.col(y_col), zone)
        if south:
            n = n + F.lit(10000000.0)
        return df.withColumn("_e", e).withColumn("_n", n) \
                 .withColumn(x_col, F.col("_e")).withColumn(y_col, F.col("_n")) \
                 .drop("_e", "_n")
    if dst_srid == 4326 and 32601 <= src_srid <= 32760 and src_srid % 100 <= 60:
        zone = src_srid % 100
        south = src_srid >= 32701
        lon, lat = C.utm_lon_lat(F.col(x_col), F.col(y_col), zone, southern=south)
        return df.withColumn("_lo", lon).withColumn("_la", lat) \
                 .withColumn(x_col, F.col("_lo")).withColumn(y_col, F.col("_la")) \
                 .drop("_lo", "_la")
    raise ValueError(f"unsupported CRS pair {src_srid}->{dst_srid}")


def build_pyramid_level(tiles: DataFrame, val_col: str = "val") -> DataFrame:
    """One overview level up: 2x2 children fold into their parent key
    (zoom-1, col>>1, row>>1) with count/sum/min/max stats — the
    pyramid-as-materialized-aggregate that replaces the reference's
    file-format overviews (GeoTiffRasterSource.scala:59-61; SURVEY.md §2.4).
    Iterating this builds the full pyramid; each level is one partial-
    aggregated shuffle a quarter the size of the last."""
    parent_col = F.floor(F.col("col") / 2.0)
    parent_row = F.floor(F.col("row") / 2.0)
    return (tiles.groupBy((F.col("zoom") - 1).cast("int").alias("zoom"),
                          parent_col.alias("col"), parent_row.alias("row"),
                          F.col("band"))
            .agg(F.count(val_col).alias("cnt"),
                 F.sum(val_col).alias("sum_val"),
                 F.min(val_col).alias("min_val"),
                 F.max(val_col).alias("max_val")))


def raster_summary(tiles: DataFrame, source_col="source_id") -> DataFrame:
    """Per-source metadata summary: tile/band counts and key envelope —
    the engine's RasterSummary (historical reference op, CHANGELOG.md:85;
    mosaic metadata assembly MosaicRasterSource.scala:65-85)."""
    return (tiles.groupBy(source_col)
            .agg(F.count("*").alias("n_tiles"),
                 F.countDistinct("band").alias("n_bands"),
                 F.min("col").alias("col_min"), F.max("col").alias("col_max"),
                 F.min("row").alias("row_min"), F.max("row").alias("row_max"),
                 F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_nodata")))
