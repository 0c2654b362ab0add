"""Per-group 2D convex hull — the vector-aggregation sibling of the
geometry scalar family (reference surface: the slick tier round-trips
JTS geometries whose `convexHull` is the canonical derived footprint,
PostgisSpec.scala:133-140; GeoTrellis vector exposes it as
`Geometry.convexHull`). Spark-first shape:

  * **Two-level distributed hull** — `hull(A ∪ B) = hull(hull(A) ∪
    hull(B))`, so stage 1 computes a PARTIAL hull per (group, input
    partition) and only hull vertices cross the wire; stage 2 merges
    per group. For a skewed 10^12-point group the shuffle moves
    O(partitions × hull_size) rows, not O(points) — hull size on
    random point sets grows ~O(log n), so the reduction is extreme.
  * **Exact integer predicates** — callers pass integer-quantized
    coordinates; every turn test is an int64 cross product (no float
    epsilon, bit-stable across hosts, SQL-replayable).

Hull semantics: STRICT vertices only (collinear boundary points are
dropped, matching JTS's convexHull vertex set), emitted as a CCW ring
(`seq` 0..k-1) starting at the lexicographically smallest vertex.
Degenerate groups: 1 point → 1 vertex; all-collinear → the 2 extreme
endpoints. Duplicate coordinates are deduped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "g bigint, seq int, x bigint, y bigint, area2 bigint"


def _chain(xy: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over deduped int64 points; returns the CCW
    ring (strict turns — collinear points popped) starting at the
    lexicographically smallest point."""
    pts = np.unique(xy, axis=0)  # sorts lexicographically by (x, y)
    n = len(pts)
    if n <= 2:
        return pts

    def half(order: np.ndarray) -> list[int]:
        out: list[int] = []
        for i in order:
            while len(out) >= 2:
                ax, ay = pts[out[-2]]
                bx, by = pts[out[-1]]
                px, py = pts[i]
                # strict left turn required: <= pops collinear too
                if (bx - ax) * (py - ay) - (by - ay) * (px - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append(int(i))
        return out

    idx = np.arange(n)
    lower = half(idx)
    upper = half(idx[::-1])
    ring = lower[:-1] + upper[:-1]
    return pts[ring]


def _emit(g: int, ring: np.ndarray) -> pd.DataFrame:
    """Ring rows + the per-group shoelace checksum: area2 = Σ edge
    (x_i·y_{i+1} − x_{i+1}·y_i) over the CLOSED ring, an int64 constant
    repeated per row (positive for CCW rings, 0 for degenerate ones).
    It pins the ring ORDER — the oracle rebuilds the same sum from the
    hull edge set, which needs no sequence knowledge."""
    nxt = np.roll(ring, -1, axis=0)
    area2 = int(np.sum(ring[:, 0] * nxt[:, 1] - nxt[:, 0] * ring[:, 1])) \
        if len(ring) >= 3 else 0
    return pd.DataFrame({
        "g": np.full(len(ring), g, dtype=np.int64),
        "seq": np.arange(len(ring), dtype=np.int32),
        "x": ring[:, 0], "y": ring[:, 1],
        "area2": np.full(len(ring), area2, dtype=np.int64)})


def convex_hull(pts: DataFrame, group_col: str = "g", x_col: str = "x",
                y_col: str = "y", two_level: bool = True) -> DataFrame:
    """Per-group convex hull of integer points → (g, seq, x, y) CCW
    rings. ``two_level=True`` (the scale path) pre-hulls every input
    partition so only candidate vertices shuffle; ``False`` groups raw
    points directly (pytest-pinned identical output)."""
    base = pts.select(F.col(group_col).cast("long").alias("g"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"))

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ring = _chain(pdf[["x", "y"]].to_numpy(dtype=np.int64))
        return _emit(int(key[0]), ring)

    if two_level:
        part = base.withColumn("_pid", F.spark_partition_id())

        def partial(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            ring = _chain(pdf[["x", "y"]].to_numpy(dtype=np.int64))
            return _emit(int(key[0]), ring)

        base = (part.groupBy("g", "_pid")
                .applyInPandas(partial, _OUT_SCHEMA)
                .drop("seq", "area2"))
    return base.groupBy("g").applyInPandas(solve, _OUT_SCHEMA)


def hull_diameter(pts: DataFrame, group_col: str = "g", x_col: str = "x",
                  y_col: str = "y", two_level: bool = True) -> DataFrame:
    """Farthest pair (DIAMETER) of each group — the ST_MaxDistance /
    ST_LongestLine analog: a point set's diameter is attained between
    convex-hull vertices, so the O(n^2) pair scan collapses to O(h^2)
    AFTER the hull reduction (h ~ log n on random inputs; the hull
    itself is the two-level distributed chain, so raw points never
    pair up and only candidate vertices shuffle). Squared distance in
    int64 — exact, no sqrt. The reported pair is canonical under the
    TOTAL order (d2 DESC, then (ax, ay, bx, b_y) ASC with a < b
    lexicographically) so ties resolve identically everywhere.
    Returns (g, n_hull, diam2, ax, ay, bx, b_y)."""
    h = convex_hull(pts, group_col, x_col, y_col, two_level) \
        .select("g", "x", "y")
    a = h.select("g", F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = h.select("g", F.col("x").alias("bx"), F.col("y").alias("b_y"))
    pairs = (a.join(b, "g")
             .filter((F.col("ax") < F.col("bx"))
                     | ((F.col("ax") == F.col("bx"))
                        & (F.col("ay") < F.col("b_y"))))
             .withColumn("d2", (F.col("bx") - F.col("ax"))
                         * (F.col("bx") - F.col("ax"))
                         + (F.col("b_y") - F.col("ay"))
                         * (F.col("b_y") - F.col("ay"))))
    best = pairs.groupBy("g").agg(
        F.min(F.struct((-F.col("d2")).alias("nd"),
                       F.col("ax"), F.col("ay"),
                       F.col("bx"), F.col("b_y"))).alias("t"))
    nh = h.groupBy("g").agg(F.count(F.lit(1)).alias("n_hull"))
    return (nh.join(best, "g")
            .select("g", "n_hull", (-F.col("t.nd")).alias("diam2"),
                    F.col("t.ax").alias("ax"), F.col("t.ay").alias("ay"),
                    F.col("t.bx").alias("bx"),
                    F.col("t.b_y").alias("b_y")))
