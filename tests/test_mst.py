"""Borůvka MST: independent Kruskal replica on a dense deterministic
graph, the forest (disconnected) case, parallel-edge handling, and the
duplicate-weight fail-loud."""
import pytest

from geotrellis_contrib_spark.operators.cluster import mst_boruvka


def _kruskal(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for a, b, w in sorted(edges, key=lambda e: e[2]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((min(a, b), max(a, b), w))
    return sorted(out)


def test_vs_kruskal_dense_graph(spark):
    edges = []
    w = 0
    for a in range(18):
        for b in range(a + 1, 18):
            if (a * 5 + b * 3) % 4 == 0:
                w += 1
                edges.append((a, b, 500 + w * 7))
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = sorted((r.a, r.b, r.w) for r in mst_boruvka(df).collect())
    assert got == _kruskal(edges)


def test_forest_two_components(spark):
    edges = [(0, 1, 10), (1, 2, 20), (0, 2, 30),
             (10, 11, 40), (11, 12, 50), (10, 12, 60)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = sorted((r.a, r.b, r.w) for r in mst_boruvka(df).collect())
    assert got == [(0, 1, 10), (1, 2, 20), (10, 11, 40), (11, 12, 50)]


def test_parallel_edges_keep_lighter(spark):
    edges = [(0, 1, 10), (1, 0, 5), (1, 2, 7)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = sorted((r.a, r.b, r.w) for r in mst_boruvka(df).collect())
    assert got == [(0, 1, 5), (1, 2, 7)]


def test_duplicate_weights_fail_loud(spark):
    df = spark.createDataFrame([(0, 1, 10), (1, 2, 10)],
                               "src long, dst long, w long")
    with pytest.raises(ValueError, match="duplicate edge weights"):
        mst_boruvka(df)
