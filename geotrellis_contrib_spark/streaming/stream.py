"""Structured Streaming: incremental tile ingestion / rasterize compaction.

The reference is batch-only (SURVEY.md §2.8); the engine adds the streaming
ingest path a 10^12-doc corpus needs: documents/events arrive continuously,
are cell-encoded (same JVM arithmetic as batch — one code path), and fold
into per-(event-window, tile) aggregates with watermarked late-data handling.
``Trigger.AvailableNow`` turns the same query into an incremental batch job
(the production pattern for catch-up runs); the streaming checkpoint
complements the batch watermark tables in plans.checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geotrellis_contrib_spark.functions import cells as C

EVENT_SCHEMA = ("event_id bigint, ts timestamp, lon double, lat double, "
                "value double")


def read_event_stream(spark: SparkSession, src_dir: str,
                      schema: str = EVENT_SCHEMA,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of geo events (schema fixed up front — streaming
    scans never infer)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(src_dir)


def rasterize_stream(events: DataFrame, zoom: int,
                     window: str = "10 minutes",
                     watermark: str = "30 minutes") -> DataFrame:
    """Streaming vector->raster: per (event-time window, tile) counts/sums.

    Watermark bounds state: rows later than ``watermark`` are dropped,
    windows finalize and emit once (append mode). The cell encoding is the
    identical Column expression the batch path uses."""
    e = events.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())
    e = (e.withColumn("cell", C.encode_point(F.col("lon"), F.col("lat"), zoom))
          .withWatermark("ts", watermark))
    # DECIMAL accumulator: exact, order-independent (double sums differ in
    # the last ulp across accumulation orders — batch/stream/oracle parity)
    return (e.groupBy(F.window("ts", window).alias("w"), F.col("cell"))
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                 .cast("double").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "cell", "n_events", "sum_value"))


def pip_join_stream(events: DataFrame, boxes: DataFrame, zoom: int = 6) -> DataFrame:
    """Streaming spatial join: enrich a geo-event STREAM with the polygons
    containing each event — a stream-static join on the packed cell key
    (the static cover-cell side broadcasts into every micro-batch; identical
    semantics and code path as the batch pip_join_boxes)."""
    from geotrellis_contrib_spark.functions import geometry as G
    from geotrellis_contrib_spark.operators.spatial_join import with_cover_cells

    cov = with_cover_cells(boxes, zoom).drop("cell_col", "cell_row")
    e = events.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull()) \
              .withColumn("cell", C.encode_point(F.col("lon"), F.col("lat"), zoom))
    joined = e.join(F.broadcast(cov), "cell", "inner")
    return joined.filter(
        G.point_in_box(F.col("lon"), F.col("lat"),
                       F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
    ).drop("cell", "xmin", "ymin", "xmax", "ymax")


def interval_join_stream(left: DataFrame, right: DataFrame,
                         interval: str = "12 hours",
                         watermark: str = "13 hours") -> DataFrame:
    """STREAM-STREAM interval inner join: pair every left event with the
    same user's right events inside ``[a_ts, a_ts + interval]``. Both
    sides carry event-time watermarks >= the interval so Spark's
    symmetric join state evicts rows once they can no longer match —
    the state-bounding contract that lets the join run forever at
    corpus scale (an unwatermarked stream-stream join accumulates state
    without bound). Watermark semantics (pytest-pinned): inner joins
    never wait on the watermark to OUTPUT, and non-late rows match
    across micro-batches AND across restarts (join state lives in the
    checkpoint); but input rows arriving BEHIND the watermark are
    dropped — the late-data contract shared with the windowed-agg tier.
    When everything arrives in one catch-up batch (the oracle gate's
    shape) nothing is late, so the result equals the batch join
    exactly. Output one row per pair: (user_id, a_ts, b_ts, a_value,
    b_value)."""
    a = left.withWatermark("ts", watermark).select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts"),
        F.col("value").alias("a_value"))
    b = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"),
        F.col("value").alias("b_value"))
    cond = F.expr(f"a_user = b_user AND b_ts >= a_ts "
                  f"AND b_ts <= a_ts + interval {interval}")
    return (a.join(b, cond, "inner")
            .select(F.col("a_user").alias("user_id"),
                    "a_ts", "b_ts", "a_value", "b_value"))


def run_available_now(agg: DataFrame, out_dir: str, checkpoint_dir: str,
                      timeout_s: int = 300) -> None:
    """Drain everything currently available, then stop — the incremental
    catch-up pattern; re-invoking continues from the stream checkpoint."""
    q = (agg.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
