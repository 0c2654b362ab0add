"""Custom stateful streaming operator: per-cell running totals via
``applyInPandasWithState`` — the engine's pattern for stateful logic that
windowed aggregation can't express (running counters, dedup-seen sets,
per-key model state). State lives in the stream checkpoint, so an
``availableNow`` catch-up run resumes counters exactly where the previous
run stopped (tested)."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geotrellis_contrib_spark.functions import cells as C

OUTPUT_SCHEMA = "cell bigint, batch_events bigint, total_events bigint, total_value double"
STATE_SCHEMA = "total_events bigint, total_value double"


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    total, value = state.get if state.exists else (0, 0.0)
    batch, bval = 0, 0.0
    for pdf in pdfs:
        batch += len(pdf)
        bval += float(pdf["value"].fillna(0.0).sum())
    total += batch
    value += bval
    state.update((total, value))
    yield pd.DataFrame([{
        "cell": key[0], "batch_events": batch,
        "total_events": total, "total_value": value,
    }])


def running_cell_totals(events: DataFrame, zoom: int) -> DataFrame:
    """Streaming per-cell running (count, value-sum) across ALL micro-batches
    — one row per (cell, batch) with cumulative totals."""
    e = events.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull()) \
              .withColumn("cell", C.encode_point(F.col("lon"), F.col("lat"), zoom))
    return (e.groupBy("cell")
            .applyInPandasWithState(_update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
