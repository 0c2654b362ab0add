"""Distributed AS-OF JOIN — the temporal-join primitive Spark lacks
natively (pandas merge_asof / kdb aj / Flint leftJoin): every left row
matches the LATEST right row with the same key and right.t <= left.t.
The reference's event streams motivate it (the spacetime layer keyed
reads, LayoutTileSource.scala:31-52, pair observations to the newest
preceding state row).

Spark-first shape — the union-tag window, NOT a per-row subquery:

    union(left tagged 1, right tagged 0)
      -> ONE shuffle on the key
      -> running last(right payload, ignorenulls) over
         (t ASC, side ASC, tie ASC) rows UNBOUNDED PRECEDING..CURRENT
      -> keep left rows

Right rows sort BEFORE left rows at equal t (<= semantics); right-side
ties at equal t resolve to the LARGEST tie column (last in ascending
order wins). The payload rides ONE struct column so legitimately-NULL
payload fields survive `ignorenulls` (only the struct itself marks
side). Cost: one shuffle + one sort — the same plan a plain windowed
agg pays; no explode, no range fan-out, skew bounded by per-key row
counts."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              t_col: str, payload_cols: list[str],
              tie_col: str) -> DataFrame:
    """Left rows + `m_<payload>` columns from the as-of matched right
    row (NULL when no right row precedes). ``tie_col`` must be a
    right-side column giving a total order among equal-t right rows."""
    if not on:
        raise ValueError("asof_join needs at least one key column")
    missing = [c for c in payload_cols + [t_col, tie_col]
               if c not in right.columns]
    if missing:
        raise ValueError(f"right side lacks columns: {missing}")

    l_tag = left.withColumn("_p", F.lit(None).cast(
        "struct<" + ", ".join(
            f"{c}: {dict(right.dtypes)[c]}" for c in payload_cols) + ">")) \
        .withColumn("_side", F.lit(1)) \
        .withColumn("_tie", F.lit(0).cast("long"))
    r_tag = right.select(
        *on, t_col,
        F.struct(*payload_cols).alias("_p"),
        F.lit(0).alias("_side"),
        F.col(tie_col).cast("long").alias("_tie"))
    # align schemas: left keeps its own columns; right contributes only
    # key/t/payload
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(
                dict(left.dtypes)[c]))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (Window.partitionBy(*on)
         .orderBy(F.col(t_col).asc(), F.col("_side").asc(),
                  F.col("_tie").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    out = m.filter(F.col("_side") == 1).drop("_p", "_side", "_tie")
    for c in payload_cols:
        out = out.withColumn(f"m_{c}", F.col("_m." + c))
    return out.drop("_m")
