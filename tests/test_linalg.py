"""Gram/mean reductions: engine vs numpy replay, partition-count
invariance (the order-free quantization claim), symmetry coverage,
dim fail-loud."""
import numpy as np
import pytest

from geotrellis_contrib_spark.operators import linalg as LA

Q = float(1 << 30)


def _fixture(n=37, d=8, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randn(n, d).astype(np.float32)


def _py_gram(X, d):
    Xd = X.astype(np.float64)
    g = np.floor(Xd[:, :, None] * Xd[:, None, :] * Q + 0.5) \
        .astype(np.int64).sum(axis=0)
    iu = np.triu_indices(d)
    return {(int(i), int(j)): int(g[i, j]) for i, j in zip(*iu)}


def test_gram_vs_numpy_and_partition_invariance(spark):
    X = _fixture()
    rows = [(k, [float(v) for v in X[k]]) for k in range(len(X))]
    exp = _py_gram(X, 8)
    for parts in (1, 7):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>").repartition(parts)
        got = {(r.i, r.j): (r.q_gram, r.n_vecs)
               for r in LA.gram_matrix(df, dim=8).collect()}
        assert len(got) == 8 * 9 // 2
        assert {k: v[0] for k, v in got.items()} == exp
        assert all(v[1] == len(X) for v in got.values())


def test_mean_vector_vs_numpy(spark):
    X = _fixture(n=21)
    rows = [(k, [float(v) for v in X[k]]) for k in range(len(X))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").repartition(4)
    got = {r.i: (r.q_sum, r.n_vecs)
           for r in LA.mean_vector(df, dim=8).collect()}
    s = np.floor(X.astype(np.float64) * Q + 0.5).astype(np.int64).sum(0)
    assert got == {i: (int(s[i]), 21) for i in range(8)}


def test_covariance_derivation_close(spark):
    # dequantized covariance from (gram, mean) within quantization noise
    X = _fixture(n=200, d=4, seed=7)
    rows = [(k, [float(v) for v in X[k]]) for k in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g = {(r.i, r.j): r.q_gram for r in
         LA.gram_matrix(df, dim=4).collect()}
    m = {r.i: r.q_sum for r in LA.mean_vector(df, dim=4).collect()}
    n = len(X)
    cov = np.cov(X.astype(np.float64).T, bias=True)
    for i in range(4):
        for j in range(i, 4):
            est = (g[(i, j)] / Q - (m[i] / Q) * (m[j] / Q) / n) / n
            assert abs(est - cov[i, j]) < 1e-6


def test_dim_fail_loud(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="expected dim"):
        LA.gram_matrix(df, dim=8).collect()
