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


def compute_grouped(df: DataFrame, *keys: str):
    """``df.groupBy(*keys)`` with the feeding exchange PINNED to the
    session's default parallelism.

    Why: AQE coalesces post-shuffle partitions by BYTES
    (advisoryPartitionSizeInBytes / minPartitionSize), which is right
    for relational operators but wrong for grouped-map pandas stages
    over pixel blobs — a 96-tile scene's state is a few MB, so AQE
    folds it into ONE partition and the whole vectorized stencil /
    relaxation sweep runs on one core (measured: the converged
    flow-rounds state sat in 1 partition at local[32]). An explicit
    numPartitions repartition on the grouping key is exempt from AQE
    coalescing, satisfies the grouped-map clustering requirement (no
    second exchange), and scales with the cluster (defaultParallelism)
    instead of a constant."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, *keys).groupBy(*keys)


def compute_spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition of a SMALL compute-dense table to the
    session's default parallelism before a heavy mapInPandas stage —
    same AQE blind spot as :func:`compute_grouped`, for stages with no
    grouping key (e.g. the viewshed pair table: ~1k rows carrying 32 KB
    blobs each, coalesced to 1-2 partitions by byte-based AQE)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)
