"""Deterministic sampling / split assignment — the training-data
pipeline primitives next to dedup (a 10^12-doc corpus is downsampled
per-source and split train/val/test BEFORE anything expensive runs;
`df.sample()` is seed-and-partitioning dependent, so a resumed or
re-partitioned job would sample a DIFFERENT subset — these are pure
functions of the row id, reproducible across runs, cluster sizes and
engines).

Mechanics: Knuth multiplicative hashes over the id, with the
similarity-tier overflow discipline (mask into 2^31 BEFORE the
multiply so the product stays < 2^63 for any long id —
operators/similarity.py:267). Split and sample use DIFFERENT
multipliers so the two decisions are independent: a doc's split label
says nothing about whether it survives sampling. Rates are integer
SIXTEENTHS (exact bucket comparisons, no float thresholds).

Scale shape: both are narrow projections/filters (zero shuffle); the
per-stratum rate table rides a broadcast join — constant-size at any
corpus size, like the skew salt map."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M31 = 2147483648
KNUTH_SPLIT = 2654435761   # split labels
KNUTH_SAMPLE = 2246822519  # sampling decisions (xxhash32 prime 2)


def knuth31(id_col, mult: int) -> Column:
    """pmod(pmod(id, 2^31) * mult, 2^31) — the masked Knuth hash."""
    c = id_col if isinstance(id_col, Column) else F.col(id_col)
    return F.pmod(F.pmod(c.cast("long"), F.lit(_M31)) * F.lit(mult),
                  F.lit(_M31))


def sql_knuth31(id_expr: str, mult: int) -> str:
    """Dialect-common SQL twin (DuckDB % on non-negatives == pmod)."""
    return f"((({id_expr}) % {_M31}) * {mult}) % {_M31}"


def split_label(id_col, weights: dict[str, int],
                out_name: str = "split") -> Column:
    """Deterministic train/val/test label: bucket = hash % Σweights,
    assigned to labels by cumulative ranges (insertion order)."""
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    denom = sum(weights.values())
    b = F.pmod(knuth31(id_col, KNUTH_SPLIT), F.lit(denom))
    expr, lo = None, 0
    for name, w in weights.items():
        cond = b < F.lit(lo + w)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
        lo += w
    return expr.alias(out_name)


def sql_split_label(id_expr: str, weights: dict[str, int]) -> str:
    denom = sum(weights.values())
    b = f"(({sql_knuth31(id_expr, KNUTH_SPLIT)}) % {denom})"
    parts, lo = [], 0
    for name, w in weights.items():
        parts.append(f"WHEN {b} < {lo + w} THEN '{name}'")
        lo += w
    return "CASE " + " ".join(parts) + " END"


def stratified_sample(df: DataFrame, strata_col: str,
                      rates16: dict[str, int],
                      id_col: str = "doc_id") -> DataFrame:
    """Keep each row iff hash % 16 < rates16[stratum] (rows of strata
    absent from the map are DROPPED — an explicit rate of 16 keeps
    all). The rate table is broadcast-joined: constant-size at any
    corpus scale."""
    if any(not 0 <= r <= 16 for r in rates16.values()):
        raise ValueError(f"rates16 entries must be 0..16: {rates16}")
    spark = df.sparkSession
    rt = spark.createDataFrame(
        [(k, int(v)) for k, v in rates16.items()],
        f"{strata_col} string, _rate16 int")
    h16 = F.pmod(knuth31(id_col, KNUTH_SAMPLE), F.lit(16))
    return (df.join(F.broadcast(rt), strata_col)
            .filter(h16 < F.col("_rate16"))
            .drop("_rate16"))
