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


DEDUP_OUTPUT = "doc_id string, first_seen_batch int"
DEDUP_STATE = "seen int, batch int"


def _dedup_update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    if state.exists:
        # already emitted in an earlier micro-batch: swallow duplicates
        n = sum(len(p) for p in pdfs)  # drain the iterator
        _ = n
        yield pd.DataFrame({"doc_id": pd.Series(dtype=object),
                            "first_seen_batch": pd.Series(dtype="int64")})
        return
    batch = 0
    for p in pdfs:
        batch = max(batch, int(p["batch"].max()) if "batch" in p and len(p) else 0)
    state.update((1, batch))
    yield pd.DataFrame([{"doc_id": key[0], "first_seen_batch": batch}])


def dedup_stream(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exactly-once streaming ingestion dedup: a doc_id is emitted the FIRST
    time it is ever seen across all micro-batches; replays and duplicate
    deliveries are swallowed (seen-set state lives in the stream checkpoint).
    The training-pipeline guard in front of any append-only corpus sink."""
    d = docs
    if "batch" not in d.columns:
        d = d.withColumn("batch", F.lit(0))
    return (d.groupBy(F.col(id_col).alias("doc_id"))
            .applyInPandasWithState(_dedup_update, DEDUP_OUTPUT, DEDUP_STATE,
                                    "append", GroupStateTimeout.NoTimeout))


def running_cell_totals(events: DataFrame, zoom: int) -> DataFrame:
    """Streaming per-cell running (count, value-sum) across ALL micro-batches
    — one row per (cell, batch) with cumulative totals."""
    e = events.filter(F.col("lon").isNotNull() & F.col("lat").isNotNull()) \
              .withColumn("cell", C.encode_point(F.col("lon"), F.col("lat"), zoom))
    return (e.groupBy("cell")
            .applyInPandasWithState(_update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
