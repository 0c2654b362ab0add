"""Douglas-Peucker: engine vs an independent recursive reference,
degenerate closed segments (radial fallback), collinear lines, ties to
the smallest index, eps=0/negative, unordered input rows."""
import numpy as np
import pytest

from geotrellis_contrib_spark.operators import simplify as SI
from geotrellis_contrib_spark.operators.simplify import dp_keep_mask


def ref_dp(pts, eps2):
    """Plain recursive reference (independent of the stack version)."""
    keep = {0, len(pts) - 1}

    def metric(a, b, p):
        if a == b:
            return (p[0] - a[0]) ** 2 + (p[1] - a[1]) ** 2
        cr = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        return cr * cr

    def thr(a, b):
        if a == b:
            return eps2
        return eps2 * ((b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2)

    def rec(i, j):
        if j - i < 2:
            return
        a, b = pts[i], pts[j]
        best = max(range(i + 1, j),
                   key=lambda k: (metric(a, b, pts[k]), -k))
        if metric(a, b, pts[best]) > thr(a, b):
            keep.add(best)
            rec(i, best)
            rec(best, j)

    rec(0, len(pts) - 1)
    return keep


def test_mask_vs_reference():
    for seed in range(6):
        pts = [(((i * 37 + seed * 13) % 223) - 100,
                ((i * 53 + seed * 7) % 211) - 105) for i in range(30)]
        for eps in (0, 5, 30, 120):
            xs = np.array([p[0] for p in pts])
            ys = np.array([p[1] for p in pts])
            got = set(np.flatnonzero(dp_keep_mask(xs, ys, eps * eps)))
            assert got == ref_dp(pts, eps * eps), (seed, eps)


def test_mask_edge_cases():
    # collinear: endpoints only at any positive eps
    xs = np.arange(10) * 3
    ys = np.arange(10) * 6
    assert list(np.flatnonzero(dp_keep_mask(xs, ys, 1))) == [0, 9]
    # eps=0: every non-collinear vertex survives
    xs = np.array([0, 1, 2, 3])
    ys = np.array([0, 5, -5, 0])
    assert dp_keep_mask(xs, ys, 0).all()
    # closed loop (first == last): radial fallback picks the farthest
    xs = np.array([0, 10, 0, -1, 0])
    ys = np.array([0, 0, 8, 0, 0])
    m = dp_keep_mask(xs, ys, 9)  # eps 3: keeps (10,0) then (0,8)
    assert list(np.flatnonzero(m)) == [0, 1, 2, 4]
    # tie -> smallest index: symmetric zigzag, equal metric at 1 and 3;
    # the FIRST split lands on index 1 and the reference agrees
    xs = np.array([0, 10, 20, 30, 40])
    ys = np.array([0, 7, 0, 7, 0])
    m = dp_keep_mask(xs, ys, 5 * 5)
    assert m[1]
    assert set(np.flatnonzero(m)) == ref_dp(list(zip(xs, ys)), 25)
    # empty / single / pair
    assert dp_keep_mask(np.array([]), np.array([]), 4).tolist() == []
    assert dp_keep_mask(np.array([5]), np.array([6]), 4).tolist() == [True]


def test_simplify_lines_spark(spark):
    rows = []
    for g in range(2):
        pts = [(((i * 37 + g * 13) % 223) - 100,
                ((i * 53 + g * 7) % 211) - 105) for i in range(20)]
        rows += [(g, i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "g long, i long, x long, y long") \
        .repartition(7)  # rows arrive unordered — solve() must sort
    out = SI.simplify_lines(df, eps=25)
    got = {}
    for r in out.collect():
        got.setdefault(r.g, set()).add(r.i)
    for g in range(2):
        pts = [(x, y) for gg, i, x, y in rows if gg == g]
        assert got[g] == ref_dp(pts, 25 * 25)
    with pytest.raises(ValueError, match="eps"):
        SI.simplify_lines(df, eps=-1)
