"""Douglas–Peucker polyline simplification — the GeoTrellis/JTS
`Simplify` analog (geotrellis.vector.methods delegate to JTS
DouglasPeuckerSimplifier; the reference round-trips such geometries
through its slick tier, PostgisSpec.scala:133-140). Exact-arithmetic
formulation so the result is bit-stable and SQL-replayable:

  * coordinates are integer-quantized; for segment (a, b) and interior
    point p the perpendicular-distance test `dist(p, ab) > eps` is the
    INTEGER comparison  cross(a,b,p)² > eps² · |ab|²  (cross/len² fit
    int64 for milli-degree coords; their squares need int128 — Python
    ints here, HUGEINT in the oracle).
  * degenerate closed segments (a == b) fall back to radial distance:
    |p − a|² > eps².
  * the split point is the MAX metric, ties broken by the SMALLEST
    index — a total order, so the kept set is unique.

Spark shape: one shuffle (groupBy line id), then a per-line Arrow task
runs the stack-based recursion. Lines are the natural partition unit —
a 10^12-vertex archive is billions of small lines, not one giant one;
DP is O(n log n) typical / O(n²) worst per line, CPU-trivial next to
the scan."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_OUT = "g bigint, i bigint, x bigint, y bigint"


def dp_keep_mask(xs, ys, eps2: int) -> np.ndarray:
    """Pure-python exact DP over one line's int coords (ordered);
    returns the kept-vertex boolean mask. Endpoints always kept."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    xs = [int(v) for v in xs]
    ys = [int(v) for v in ys]
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay, bx, by = xs[i], ys[i], xs[j], ys[j]
        degenerate = ax == bx and ay == by
        len2 = (bx - ax) ** 2 + (by - ay) ** 2
        best_k, best_m = -1, -1
        for k in range(i + 1, j):
            if degenerate:
                m = (xs[k] - ax) ** 2 + (ys[k] - ay) ** 2
            else:
                cr = (bx - ax) * (ys[k] - ay) - (by - ay) * (xs[k] - ax)
                m = cr * cr
            if m > best_m:
                best_k, best_m = k, m
        thr = eps2 if degenerate else eps2 * len2
        if best_m > thr:
            keep[best_k] = True
            stack.append((i, best_k))
            stack.append((best_k, j))
    return keep


def simplify_lines(pts: DataFrame, eps: int, group_col: str = "g",
                   order_col: str = "i", x_col: str = "x",
                   y_col: str = "y") -> DataFrame:
    """Simplify every line to tolerance ``eps`` (same integer units as
    the coordinates); returns the kept vertices (g, i, x, y)."""
    if eps < 0:
        raise ValueError(f"eps must be >= 0: {eps}")
    eps2 = int(eps) * int(eps)
    base = pts.select(pts[group_col].cast("long").alias("g"),
                      pts[order_col].cast("long").alias("i"),
                      pts[x_col].cast("long").alias("x"),
                      pts[y_col].cast("long").alias("y"))

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i", kind="mergesort")
        m = dp_keep_mask(pdf["x"].to_numpy(), pdf["y"].to_numpy(), eps2)
        return pdf.loc[m, ["g", "i", "x", "y"]]

    return base.groupBy("g").applyInPandas(solve, _OUT)
