"""Deterministic sampling/split: exact python-replay parity,
repartition invariance (the property df.sample() lacks), broadcast
rate join in the plan, absent-stratum drop, fail-louds."""
import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark.operators import sampling as SA

M31 = 2147483648


def _h(i, mult):
    return ((i % M31) * mult) % M31


def test_exact_replay_and_repartition_invariance(spark):
    rows = [(i, f"s{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"s0": 4, "s1": 16, "s2": 0}
    kept = SA.stratified_sample(df, "source", rates)
    got = sorted(r.doc_id for r in kept.collect())
    want = sorted(i for i, s in rows
                  if _h(i, SA.KNUTH_SAMPLE) % 16 < rates[s])
    assert got == want
    assert all(i % 3 != 2 for i in got)  # rate-0 stratum fully dropped
    # the SAME subset regardless of physical partitioning
    got2 = sorted(r.doc_id for r in
                  SA.stratified_sample(df.repartition(13), "source",
                                       rates).collect())
    assert got2 == got
    # rate table rides a broadcast join
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_split_labels_and_independence(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    w = {"train": 13, "val": 2, "test": 1}
    out = df.select("doc_id", SA.split_label("doc_id", w)).collect()
    for r in out:
        b = _h(r.doc_id, SA.KNUTH_SPLIT) % 16
        want = "train" if b < 13 else ("val" if b < 15 else "test")
        assert r.split == want
    # different multipliers: split label and sample bucket decorrelated
    # (a perfectly correlated pair would make val/test vanish from any
    # low-rate stratum); check both hashes differ on most ids
    diff = sum(1 for i in range(1000)
               if _h(i, SA.KNUTH_SPLIT) % 16 != _h(i, SA.KNUTH_SAMPLE) % 16)
    assert diff > 800


def test_fail_louds(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="weights"):
        SA.split_label("doc_id", {})
    with pytest.raises(ValueError, match="weights"):
        SA.split_label("doc_id", {"train": 0})
    with pytest.raises(ValueError, match="rates16"):
        SA.stratified_sample(df, "source", {"a": 17})
