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
        # (no yield — an empty generator is a legal no-output group, and
        # skipping the per-key empty-DataFrame build halves the Python
        # cost of replay-heavy batches)
        return
    batch = 0
    for p in pdfs:
        batch = max(batch, int(p["batch"].max()) if "batch" in p and len(p) else 0)
    state.update((1, batch))
    yield pd.DataFrame({"doc_id": (key[0],), "first_seen_batch": (batch,)})


def dedup_stream(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exactly-once streaming ingestion dedup: a doc_id is emitted the FIRST
    time it is ever seen across all micro-batches; replays and duplicate
    deliveries are swallowed (seen state lives in the stream checkpoint).
    The training-pipeline guard in front of any append-only corpus sink.

    Two physical paths, same emitted-id semantics:

    * id-only input (no ``batch`` column): the built-in streaming
      ``dropDuplicates`` — JVM state store, zero Python per key. This is
      the 100 TB path: per-key cost is a state-store hash probe, not an
      Arrow round-trip, and it needs no custom state schema.
    * input with a ``batch`` column: the ``applyInPandasWithState``
      operator, which additionally tags each id with the micro-batch it
      was FIRST seen in (custom per-key state the built-in can't carry).
    """
    if "batch" not in docs.columns:
        return (docs.select(F.col(id_col).alias("doc_id"))
                .dropDuplicates(["doc_id"])
                .withColumn("first_seen_batch", F.lit(0)))
    return (docs.groupBy(F.col(id_col).alias("doc_id"))
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
