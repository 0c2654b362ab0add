"""Small shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Raise the partition count of a SMALL scan to the session's default
    parallelism before a high-fan-out broadcast join.

    Why: a broadcast-hash join's output parallelism equals the PROBE side's
    partition count. A probe table that is small on disk (one parquet
    split) but explodes 1000x through the join then runs the whole
    explosion in one task — at sf1.0 the kNN candidate join (49k points x
    10k co-located queries -> 150M pairs) ran in 2 tasks for 272s. Real
    at-scale fact tables always carry >= cores partitions, so this is a
    NO-OP there (the guard reads the partition count, no job); when it
    does fire, it round-robin shuffles a by-definition-small table (cost:
    milliseconds). Round-robin, NOT keyed: hash-repartitioning by the join
    key would re-concentrate the hot cell in one partition.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
