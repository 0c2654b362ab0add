"""Event-funnel and cohort analytics over the events fact table — the
product-analytics tier every OLAP engine ships (Amplitude/Mixpanel-style
ordered funnels, cohort retention triangles), here as plain declarative
DataFrame plans: tiny per-user aggregates joined back, no window state,
no UDFs. Timestamps are compared at microsecond precision via
unix_micros (session TZ is UTC, so the NTZ cast matches DuckDB's
EPOCH_US on the naive timestamp — the sessionize discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _us(col) -> F.Column:
    return F.unix_micros(F.col(col).cast("timestamp"))


def funnel(events: DataFrame, steps: tuple[str, ...] =
           ("view", "click", "purchase")) -> DataFrame:
    """ORDERED funnel: per user the first time each step happened
    STRICTLY AFTER the previous step's first qualifying time (the
    standard product-analytics semantics: the first view, the first
    click after that view, the first purchase after that click — NOT
    min-per-type, which would count a purchase that preceded the
    click). Returns (user_id, stage, t1..tK as microsecond epochs,
    NULL where the funnel stalled).

    Plan shape: one tiny (user, min-ts) aggregate per step, each
    joined back user-keyed — K map-side-combined aggregates over a
    filtered scan, no window, no state; at warehouse scale every one
    of these is a broadcast-sized dimension."""
    users = events.select("user_id").distinct()
    out = users
    prev_col = None
    tcols = []
    for i, step in enumerate(steps, start=1):
        name = f"t{i}"
        e = events.filter(F.col("event_type") == step) \
                  .select("user_id", _us("ts").alias("_t"))
        if prev_col is not None:
            e = e.join(out.select("user_id", prev_col), "user_id") \
                 .filter(F.col("_t") > F.col(prev_col))
        agg = e.groupBy("user_id").agg(F.min("_t").alias(name))
        out = out.join(agg, "user_id", "left")
        prev_col = name
        tcols.append(name)
    stage = F.lit(0)
    for i, name in enumerate(tcols, start=1):
        stage = F.when(F.col(name).isNotNull(), i).otherwise(stage)
    # stage must be the LAST consecutive non-null: later steps are
    # null whenever an earlier one is (the strictly-after join chains)
    return out.select("user_id", stage.cast("int").alias("stage"),
                      *tcols)


def cohort_retention(events: DataFrame,
                     signup_type: str = "signup") -> DataFrame:
    """COHORT RETENTION triangle: users bucketed by their first
    ``signup_type`` week (epoch-week from DATE arithmetic — the
    spacetime_layout discipline, immune to sub-second skew); for each
    (cohort_week, week_offset >= 0) the number of DISTINCT cohort
    members with any non-signup activity that week, plus the cohort
    size. Retention rate = two integers, divided by the caller.

    Plan shape: one (user, min signup) aggregate, one distinct
    (user, week) projection of the activity scan, one user-keyed join,
    one map-side-combined rollup — the classic triangle in four narrow
    stages, no window, no state."""
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    week = F.floor(day / F.lit(7)).cast("long")
    signup = (events.filter(F.col("event_type") == signup_type)
              .groupBy("user_id")
              .agg(F.min(week).alias("cohort_week")))
    activity = (events.filter(F.col("event_type") != signup_type)
                .select("user_id", week.alias("act_week")).distinct())
    sizes = signup.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users"))
    tri = (signup.join(activity, "user_id")
           .filter(F.col("act_week") >= F.col("cohort_week"))
           .groupBy("cohort_week",
                    (F.col("act_week") - F.col("cohort_week"))
                    .alias("week_offset"))
           .agg(F.count_distinct(F.col("user_id")).alias("active_users")))
    return (tri.join(F.broadcast(sizes), "cohort_week")
            .select("cohort_week", "week_offset", "active_users",
                    "cohort_users"))


def events_rollup(events: DataFrame, q: float = 100.0) -> DataFrame:
    """OLAP ROLLUP over (event_type, week): counts and quantized value
    sums at every aggregation level — (type, week), per-type subtotal,
    grand total — in ONE pass (Spark expands grouping sets inside the
    same map-side-combined aggregate; no self-union of three
    aggregations). Values are quantized floor(v*q + 0.5) BEFORE the
    sum, so every level's total is an exact order-free integer.
    ``gid`` = grouping(event_type)*2 + grouping(week) (the
    Postgres/Spark bit convention) distinguishes the levels."""
    day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    base = events.select(
        "event_type",
        F.floor(day / F.lit(7)).cast("long").alias("week"),
        F.floor(F.col("value") * F.lit(q) + F.lit(0.5))
        .cast("long").alias("vq"))
    return (base.rollup("event_type", "week")
            .agg((F.grouping("event_type") * 2
                  + F.grouping("week")).cast("int").alias("gid"),
                 F.count(F.lit(1)).alias("n"),
                 F.sum("vq").alias("v_sum"))
            .select("event_type", "week", "gid", "n", "v_sum"))


def events_pivot(events: DataFrame,
                 types: tuple[str, ...] = ("click", "error", "purchase",
                                           "signup", "view")) -> DataFrame:
    """PIVOT: the per-user event-type count matrix (the wide feature
    table every behavioral model starts from). The type list is pinned
    (never inferred — an inference pass is a whole extra job and a
    nondeterministic column order); absent combinations are 0, not
    NULL. One map-side-combined aggregate; the pivot is just K
    conditional counts inside it."""
    p = (events.groupBy("user_id")
         .pivot("event_type", list(types)).count())
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
          for t in types])


def twap(events: DataFrame, q: float = 100.0) -> DataFrame:
    """TIME-WEIGHTED AVERAGE of ``value`` per user (the TWAP/metrics
    rollup — a plain mean over-weights bursts; each observation should
    count for the time it was CURRENT): with events ordered by
    (ts, event_id),

        twap = Sum(vq_i * (t_{i+1} - t_i)) / (t_last - t_first)

    vq = floor(v*q + 0.5) int64 and dt in integer microseconds, so the
    numerator is an exact order-free integer sum (vq <= ~10^6, dt <=
    ~10^11 us — products bounded well inside int64) and ONE IEEE
    division ends the chain. Users with a single event have no span
    and are excluded (not zero — an honest NULL-shaped absence). One
    user-keyed window + one map-side-combined rollup."""
    from pyspark.sql import Window as W

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    base = events.select(
        "user_id", us.alias("t"), "event_id",
        F.floor(F.col("value") * F.lit(q) + F.lit(0.5))
        .cast("long").alias("vq"))
    stepped = base.withColumn(
        "dt", F.lead("t", 1).over(
            W.partitionBy("user_id").orderBy(F.col("t").asc(),
                                             F.col("event_id").asc()))
        - F.col("t"))
    agg = (stepped.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.when(F.col("dt").isNotNull(),
                             F.col("vq") * F.col("dt"))
                      .otherwise(0)).alias("num"),
                (F.max("t") - F.min("t")).alias("span_us")))
    # a zero span (all observations at one instant) has no time axis:
    # excluded with the single-event users rather than divided by zero
    return (agg.filter((F.col("n_events") >= 2)
                       & (F.col("span_us") > 0))
            .select("user_id", "n_events", "span_us",
                    F.floor(F.col("num") / F.col("span_us") + F.lit(0.5))
                    .cast("long").alias("twap_q")))


def transitions(events: DataFrame, q: float = 1048576.0) -> DataFrame:
    """FIRST-ORDER MARKOV TRANSITIONS over per-user event sequences —
    the behavioral transition matrix (what follows what): for each
    (prev_type, next_type) ordered by (ts, event_id) within a user,
    the corpus-wide count and the quantized row-conditional
    probability P(next | prev) = count / Sum_next(count) — integer
    counts until ONE IEEE division. One user-keyed lag window + one
    map-side-combined rollup + a per-prev window sum."""
    from pyspark.sql import Window as W

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    pairs = (events
             .withColumn("prev_type", F.lag("event_type", 1).over(w))
             .filter(F.col("prev_type").isNotNull())
             .groupBy("prev_type", F.col("event_type").alias("next_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    wp = W.partitionBy("prev_type")
    return (pairs.withColumn("row_total", F.sum("n").over(wp))
            .select("prev_type", "next_type", "n", "row_total",
                    F.floor(F.col("n") / F.col("row_total")
                            * F.lit(q) + F.lit(0.5))
                    .cast("long").alias("p_q")))
