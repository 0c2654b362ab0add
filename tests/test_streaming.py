"""Streaming rasterize: incremental availableNow runs, watermark, resume from
the stream checkpoint; stream result == batch recomputation."""

import tempfile

import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark.functions import cells as C
from geotrellis_contrib_spark.streaming import stream as st

ZOOM = 8


def _events(spark, ids, hour_base, day="2026-01-01"):
    return spark.createDataFrame(
        [(i, f"{day} {hour_base + (i % 2)}:{(i * 7) % 60:02d}:00",
          -74.0 + (i % 50) * 0.01, 40.5 + (i % 30) * 0.01, float(i % 10))
         for i in ids],
        "event_id bigint, ts_s string, lon double, lat double, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "lon", "lat", "value")


def test_stateful_running_totals_resume(spark, tmp_path_factory):
    """applyInPandasWithState: counters persist in the stream checkpoint —
    a second availableNow run CONTINUES the totals, never restarts them."""
    from geotrellis_contrib_spark.streaming import stateful

    src = str(tmp_path_factory.mktemp("st_src"))
    out = str(tmp_path_factory.mktemp("st_out"))
    chk = str(tmp_path_factory.mktemp("st_chk"))

    def run():
        events = st.read_event_stream(spark, src)
        agg = stateful.running_cell_totals(events, zoom=8)
        q = (agg.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", chk).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    _events(spark, range(0, 200), hour_base=10).write.mode("append").parquet(src)
    run()
    r1 = spark.read.parquet(out)
    assert r1.agg(F.sum("batch_events")).first()[0] == 200

    _events(spark, range(200, 300), hour_base=11).write.mode("append").parquet(src)
    run()
    r2 = spark.read.parquet(out)
    assert r2.agg(F.sum("batch_events")).first()[0] == 300  # 200 + 100
    # cumulative totals per cell: latest row per cell == total over all input
    latest = (r2.groupBy("cell").agg(F.max("total_events").alias("tot")))
    assert latest.agg(F.sum("tot")).first()[0] == 300


def test_streaming_spatial_join_equals_batch(spark, tmp_path_factory):
    """Stream-static PIP join over two micro-batches == batch PIP join."""
    from geotrellis_contrib_spark.operators import spatial_join as sj

    src = str(tmp_path_factory.mktemp("sj_src"))
    out = str(tmp_path_factory.mktemp("sj_out"))
    chk = str(tmp_path_factory.mktemp("sj_chk"))
    boxes = spark.createDataFrame(
        [("hot", -74.3, 40.4, -73.7, 41.0), ("west", -120.0, 30.0, -100.0, 45.0)],
        "poly_id string, xmin double, ymin double, xmax double, ymax double")

    _events(spark, range(0, 150), hour_base=10).write.mode("append").parquet(src)
    _events(spark, range(150, 260), hour_base=11).write.mode("append").parquet(src)

    def run():
        ev = st.read_event_stream(spark, src, max_files_per_trigger=1)
        joined = st.pip_join_stream(ev, boxes, zoom=6)
        q = (joined.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", chk).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    run()
    got = sorted((r.event_id, r.poly_id)
                 for r in spark.read.parquet(out).select("event_id", "poly_id").collect())
    batch = sj.pip_join_boxes(
        _events(spark, range(0, 150), hour_base=10)
        .unionByName(_events(spark, range(150, 260), hour_base=11)), boxes, zoom=6)
    expect = sorted((r.event_id, r.poly_id)
                    for r in batch.select("event_id", "poly_id").collect())
    assert got == expect and len(got) > 0


def test_stream_dedup_exactly_once(spark, tmp_path_factory):
    """dedup_stream: ids re-delivered in later batches are swallowed."""
    from geotrellis_contrib_spark.streaming import stateful

    src = str(tmp_path_factory.mktemp("dd_src"))
    out = str(tmp_path_factory.mktemp("dd_out"))
    chk = str(tmp_path_factory.mktemp("dd_chk"))

    def run():
        docs = (spark.readStream.schema("doc_id string, batch int").parquet(src))
        q = (stateful.dedup_stream(docs).writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", chk)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    spark.createDataFrame([(f"doc-{i}", 1) for i in range(100)],
                          "doc_id string, batch int").write.mode("append").parquet(src)
    run()
    assert spark.read.parquet(out).count() == 100

    # batch 2: 50 replays + 30 new
    spark.createDataFrame([(f"doc-{i}", 2) for i in range(50, 180)],
                          "doc_id string, batch int").write.mode("append").parquet(src)
    run()
    got = spark.read.parquet(out)
    assert got.count() == 180                       # no duplicates ever emitted
    assert got.select("doc_id").distinct().count() == 180
    # the replayed ids keep their original batch tag
    assert got.filter((F.col("doc_id") == "doc-60") & (F.col("first_seen_batch") == 1)).count() == 1
    assert got.filter((F.col("doc_id") == "doc-150") & (F.col("first_seen_batch") == 2)).count() == 1


@pytest.mark.parametrize("window", ["10 minutes"])
def test_incremental_equals_batch(spark, window, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    out = str(tmp_path_factory.mktemp("stream_out"))
    chk = str(tmp_path_factory.mktemp("stream_chk"))

    # micro-batch 1 (hours 10-11), then 2 (14-15) — event time advances, so
    # the watermark finalizes earlier windows; a far-future sentinel batch
    # flushes the remaining state (append mode only emits closed windows).
    _events(spark, range(0, 300), hour_base=10).write.mode("append").parquet(src)
    agg = st.rasterize_stream(st.read_event_stream(spark, src), ZOOM, window=window)
    st.run_available_now(agg, out, chk)
    assert spark.read.parquet(out).count() > 0  # run 1 emitted closed windows

    _events(spark, range(300, 500), hour_base=14).write.mode("append").parquet(src)
    agg2 = st.rasterize_stream(st.read_event_stream(spark, src), ZOOM, window=window)
    st.run_available_now(agg2, out, chk)

    _events(spark, [10000], hour_base=23).write.mode("append").parquet(src)  # flush
    agg3 = st.rasterize_stream(st.read_event_stream(spark, src), ZOOM, window=window)
    st.run_available_now(agg3, out, chk)

    got = (spark.read.parquet(out)
           .filter(F.hour("window_start") < 22)  # drop the sentinel's window
           .groupBy("window_start", "window_end", "cell")
           .agg(F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value")))

    # batch oracle over the full (non-sentinel) input
    full = _events(spark, range(0, 300), hour_base=10) \
        .unionByName(_events(spark, range(300, 500), hour_base=14))
    batch = (full
             .withColumn("cell", C.encode_point(F.col("lon"), F.col("lat"), ZOOM))
             .groupBy(F.window("ts", window).alias("w"), "cell")
             .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
             .select(F.col("w.start").alias("window_start"),
                     F.col("w.end").alias("window_end"),
                     "cell", "n_events", "sum_value"))
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert a == b
    # incrementality: each aggregate row was emitted exactly once
    assert spark.read.parquet(out).filter(F.hour("window_start") < 22) \
        .groupBy("window_start", "cell").count().filter("count > 1").count() == 0


def test_stream_stream_interval_join_state_and_lateness(spark,
                                                        tmp_path_factory):
    """Stream-stream interval inner join across TWO availableNow runs:
    (1) pairs within run 1 emit; (2) run-2 views match run-1 clicks
    through the CHECKPOINTED symmetric join state; (3) run-2 views
    arriving behind the persisted watermark are DROPPED (the late-data
    contract) — expected = batch interval join minus the late rows'
    pairs."""
    src = str(tmp_path_factory.mktemp("ij_src"))
    out = str(tmp_path_factory.mktemp("ij_out"))
    chk = str(tmp_path_factory.mktemp("ij_chk"))

    def mk(rows):
        return spark.createDataFrame(
            [(i, ts, u, typ, float(i % 10)) for i, ts, u, typ in rows],
            "event_id bigint, ts_s string, user_id bigint, "
            "event_type string, value double"
        ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
                 "user_id", "event_type", "value")

    b1 = mk([(i, f"2026-01-01 {8 + (i % 3)}:{(i * 7) % 60:02d}:00",
              i % 5, "click") for i in range(0, 30)]
            + [(990, "2026-01-01 07:00:00", 0, "click")]
            + [(i, f"2026-01-01 {9 + (i % 3)}:{(i * 7) % 60:02d}:00",
                i % 5, "view") for i in range(100, 130)])
    # the GLOBAL watermark is the MIN across inputs: clicks max ~10:59
    # -> wm 7:59 after run 1; a view at 7:30 is behind it -> dropped,
    # though it would batch-match the 7:00 click
    late_view = (900, "2026-01-01 07:30:00", 0, "view")
    b2 = mk([(i, f"2026-01-01 {10 + (i % 3)}:{(i * 7) % 60:02d}:00",
              i % 5, "view") for i in range(200, 230)] + [late_view])

    def run():
        schema = ("event_id bigint, ts timestamp, user_id bigint, "
                  "event_type string, value double")
        clicks = st.read_event_stream(spark, src, schema=schema) \
            .filter(F.col("event_type") == "click")
        views = st.read_event_stream(spark, src, schema=schema) \
            .filter(F.col("event_type") == "view")
        pairs = st.interval_join_stream(clicks, views,
                                        interval="2 hours",
                                        watermark="3 hours")
        q = (pairs.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", chk).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    b1.write.mode("append").parquet(src)
    run()
    n_run1 = spark.read.parquet(out).count()
    b2.write.mode("append").parquet(src)
    run()
    got = sorted((r.user_id, str(r.a_ts), str(r.b_ts))
                 for r in spark.read.parquet(out).collect())
    full = b1.unionByName(b2)
    a = full.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts"))
    b = full.filter((F.col("event_type") == "view")
                    & (F.col("event_id") != 900)).select(  # late: dropped
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    batch = a.join(b, F.expr(
        "a_user = b_user AND b_ts >= a_ts AND "
        "b_ts <= a_ts + interval 2 hours"))
    expect = sorted((r.a_user, str(r.a_ts), str(r.b_ts))
                    for r in batch.collect())
    assert got == expect and len(got) > n_run1 > 0
    # the late view WOULD have matched in batch (the drop is real)
    b_all = full.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    n_with_late = a.join(b_all, F.expr(
        "a_user = b_user AND b_ts >= a_ts AND "
        "b_ts <= a_ts + interval 2 hours")).count()
    assert n_with_late > len(expect)
