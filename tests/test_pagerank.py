"""Fixed-iteration quantized PageRank: python replay, structural
invariants (sink accumulates, no-in-link nodes sit at base), damping
fail-loud."""
import math

import pytest

from geotrellis_contrib_spark.operators import cluster as CL

Q = float(1 << 40)
D = 0.875


def _replay(edges, iters=3):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = math.floor((1.0 - D) * Q / n + 0.5)
    pr = {v: math.floor(Q / n + 0.5) for v in nodes}
    for _ in range(iters):
        inq = {v: 0 for v in nodes}
        for s, t in edges:
            inq[t] += math.floor(D * pr[s] / deg[s] + 0.5)
        pr = {v: base + inq[v] for v in nodes}
    return pr


def test_pagerank_vs_replay_and_structure(spark):
    # 0,1,2 -> 3 (hub sink with self-loop), 4 -> 0, 5 has no in-links
    edges = [(0, 3), (1, 3), (2, 3), (3, 3), (4, 0), (5, 3), (5, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pr_q for r in CL.pagerank(df, iters=3).collect()}
    exp = _replay(edges)
    assert got == exp
    n = len(got)
    base = math.floor((1.0 - D) * Q / n + 0.5)
    assert got[3] == max(got.values())      # the sink dominates
    assert got[5] == base                   # no in-links -> base only
    # dropped-dangling variant: total mass never exceeds q (+ rounding)
    assert sum(got.values()) <= int(Q) + n


def test_pagerank_damping_fail_loud(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        CL.pagerank(df, d=1.5)
