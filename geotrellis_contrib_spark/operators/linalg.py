"""Distributed embedding linear algebra — the Gram/covariance
reduction every 100 TB embedding pipeline runs before PCA/whitening
(the eigendecomposition itself is a driver-side O(d³) solve on the
d×d result; the DISTRIBUTED work is exactly this reduction).

Scale shape: the canonical partial-aggregate Gram — each Arrow batch
contributes a CONSTANT-SIZE d(d+1)/2-row partial (numpy outer-product
accumulation), so NO row-level shuffle exists at all; the only
exchange is the tiny groupBy over (i, j) partials. This is the one
place a Pandas path beats JVM columns: the per-batch work is a dense
d² product that numpy vectorizes, where an explode+self-join plan
would shuffle n·d(d+1)/2 rows.

Exactness discipline (the quantize-first int64 rule): float32 inputs
have 24-bit mantissas, so every pairwise product is EXACT in float64;
each term is floor-quantized to int64 BEFORE summation, making the
sum order-free across batches/partitions — the DuckDB oracle replays
it with the identical expression over array subscripts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT = "i int, j int, q_gram bigint, n_vecs bigint"


def gram_matrix(emb: DataFrame, vec_col: str = "embedding",
                dim: int = 64, q: float = float(1 << 30)) -> DataFrame:
    """Upper-triangle quantized Gram matrix: for i <= j,
    q_gram[i, j] = Σ_rows floor(x_i · x_j · q + 0.5), plus the row
    count. Covariance follows driver-side as (G − s·sᵀ/n)/n on the
    dequantized matrix; the gate compares the exact integer state."""

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if X.shape[1] != dim:
                raise ValueError(f"expected dim {dim}, got {X.shape[1]}")
            terms = np.floor(X[:, :, None] * X[:, None, :] * q + 0.5)
            g = terms.astype(np.int64).sum(axis=0)
            iu = np.triu_indices(dim)
            yield pd.DataFrame({
                "i": iu[0].astype(np.int32), "j": iu[1].astype(np.int32),
                "q_gram": g[iu],
                "n_vecs": np.full(len(iu[0]), len(X), dtype=np.int64)})

    parts = emb.select(vec_col).mapInPandas(partial, _OUT)
    return parts.groupBy("i", "j").agg(
        F.sum("q_gram").alias("q_gram"),
        F.sum("n_vecs").alias("n_vecs"))


def mean_vector(emb: DataFrame, vec_col: str = "embedding",
                dim: int = 64, q: float = float(1 << 30)) -> DataFrame:
    """Quantized per-dimension sums (i, q_sum, n_vecs) — the companion
    first-moment reduction (mean = dequantized q_sum/n). Same
    partial-aggregate shape."""

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if X.shape[1] != dim:
                raise ValueError(f"expected dim {dim}, got {X.shape[1]}")
            s = np.floor(X * q + 0.5).astype(np.int64).sum(axis=0)
            yield pd.DataFrame({
                "i": np.arange(dim, dtype=np.int32), "q_sum": s,
                "n_vecs": np.full(dim, len(X), dtype=np.int64)})

    parts = emb.select(vec_col).mapInPandas(
        partial, "i int, q_sum bigint, n_vecs bigint")
    return parts.groupBy("i").agg(
        F.sum("q_sum").alias("q_sum"),
        F.sum("n_vecs").alias("n_vecs"))
