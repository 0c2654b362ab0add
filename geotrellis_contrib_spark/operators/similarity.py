"""Embedding similarity search over an ``array<float>`` column.

  - brute-force cosine top-k (the correctness baseline): cross join of a
    small query set against the corpus, dot/norm computed with JVM
    ``zip_with`` + ``aggregate`` folds (NO Python; Arrow never engaged);
  - random-hyperplane LSH bucketing (the scale path): deterministic
    arithmetic hyperplanes -> sign bits -> bucket key; near-dup candidate
    pairs come from an equi-join on the bucket instead of all pairs.

Float discipline: elements are cast to float64 BEFORE multiplication and
accumulated by an ordered left fold — the exact op sequence DuckDB's
list_dot_product/list_cosine_similarity use, so oracles match bitwise
(verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
_PLANE_MOD = 10007


def plane_weights(plane: int, dims: int) -> list[float]:
    """Deterministic pseudo-random hyperplane weights in [-0.5, 0.5):
    w = ((plane*2971 + i*6011 + 13) % 10007) / 10007 - 0.5 (pure arithmetic —
    reproducible in SQL for the oracle)."""
    return [((plane * 2971 + i * 6011 + 13) % _PLANE_MOD) / _PLANE_MOD - 0.5
            for i in range(dims)]


def _fold_dot(a, b, dims: int | None = None) -> F.Column:
    """Ordered float64 left-fold dot product (bit-matches list_dot_product).

    With ``dims`` known (the engine always knows its embedding width) the
    fold is UNROLLED into a left-associated codegen'd expression chain —
    higher-order-function lambdas are interpreted per element and ~10x
    slower; the unrolled chain adds in the identical order, so results stay
    bit-identical to the HOF fold and to the DuckDB oracle."""
    if dims is not None:
        def term(i):
            return (F.element_at(a, i).cast("double")
                    * F.element_at(b, i).cast("double"))
        acc = term(1)
        for i in range(2, dims + 1):
            acc = acc + term(i)
        return acc
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _fold_norm2(a, dims: int | None = None) -> F.Column:
    if dims is not None:
        def term(i):
            v = F.element_at(a, i).cast("double")
            return v * v
        acc = term(1)
        for i in range(2, dims + 1):
            acc = acc + term(i)
        return acc
    return F.aggregate(a, F.lit(0.0),
                       lambda acc, v: acc + v.cast("double") * v.cast("double"))


def cosine_cols(a, b, dims: int | None = None) -> F.Column:
    """cos = dot / (sqrt(|a|^2) * sqrt(|b|^2)) — the list_cosine_similarity
    op order, for bitwise oracle parity."""
    return _fold_dot(a, b, dims) / (F.sqrt(_fold_norm2(a, dims)) * F.sqrt(_fold_norm2(b, dims)))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int,
                dims: int | None = None,
                id_col="vec_id", vec_col="embedding",
                qid_col="query_id", qvec_col="qvec") -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force baseline).

    Queries are broadcast (small side); the corpus is scanned once — at
    cluster scale this is one pass over the fact table per query batch,
    the right baseline to measure LSH variants against. Norms are
    precomputed once per VECTOR (not per pair).
    Output: (query_id, vec_id, rank, cos)."""
    q = queries.select(F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qvec")) \
               .withColumn("qn", F.sqrt(_fold_norm2(F.col("qvec"), dims)))
    v = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")) \
              .withColumn("vn", F.sqrt(_fold_norm2(F.col("vec"), dims)))
    cand = v.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    cand = cand.withColumn(
        "cos", _fold_dot(F.col("qvec"), F.col("vec"), dims) / (F.col("qn") * F.col("vn")))
    # project the arrays AWAY before the rank window: the top-k shuffle then
    # moves (query_id, vec_id, cos) scalars, not 64-float embeddings
    cand = cand.select("query_id", "vec_id", "cos")
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", F.col("rank").cast("int").alias("rank"), "cos"))


def lsh_buckets(corpus: DataFrame, dims: int, n_planes: int = N_PLANES,
                id_col="vec_id", vec_col="embedding") -> DataFrame:
    """Random-hyperplane LSH: bucket = sum over planes of (dot(v, w_p) >= 0)
    << p. One narrow JVM stage. Output: (vec_id, bucket)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(*[F.lit(x) for x in plane_weights(p, dims)])
        bit = F.when(_fold_dot(F.col(vec_col), w, dims) >= 0, F.lit(1).cast("long")).otherwise(0)
        bucket = bucket + F.shiftleft(bit, p)
    return corpus.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def lsh_near_pairs(corpus: DataFrame, dims: int, min_cos: float = 0.8,
                   n_planes: int = N_PLANES,
                   id_col="vec_id", vec_col="embedding") -> DataFrame:
    """Near-duplicate embedding pairs: equi-join on the LSH bucket (the scale
    path: candidates collapse from O(n^2) to per-bucket blocks), exact cosine
    refine. Output: (vec_a, vec_b, cos)."""
    b = lsh_buckets(corpus, dims, n_planes, id_col, vec_col)
    v = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")) \
              .withColumn("nrm", F.sqrt(_fold_norm2(F.col("vec"), dims)))
    bv = b.join(v, "vec_id")
    left = bv.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"),
                     F.col("nrm").alias("na"), "bucket")
    right = bv.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"),
                      F.col("nrm").alias("nb"), "bucket")
    pairs = left.join(right, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    pairs = pairs.withColumn(
        "cos", _fold_dot(F.col("va"), F.col("vb"), dims) / (F.col("na") * F.col("nb")))
    return pairs.filter(F.col("cos") >= min_cos).select("vec_a", "vec_b", "cos")


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               dims: int | None = None,
               id_col="vec_id", vec_col="embedding",
               cid_col="centroid_id", cvec_col="cvec") -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    by cosine (broadcast centroid cross join + window pick; deterministic
    tie-break on centroid_id). Output: (vec_id, centroid_id, cos).

    At 10^12 scale this is the index-build pass: one scan of the corpus,
    centroid list broadcast, output range-partitioned by centroid_id becomes
    the posting-list table."""
    c = F.broadcast(centroids.select(F.col(cid_col).alias("centroid_id"),
                                     F.col(cvec_col).alias("cvec"))
                    .withColumn("cn", F.sqrt(_fold_norm2(F.col("cvec"), dims))))
    v = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")) \
              .withColumn("vn", F.sqrt(_fold_norm2(F.col("vec"), dims)))
    pairs = v.crossJoin(c).withColumn(
        "cos", _fold_dot(F.col("vec"), F.col("cvec"), dims) / (F.col("vn") * F.col("cn")))
    # nearest centroid via max(struct(...)): a declarative aggregate that
    # partial-aggregates map-side over scalars only (no window sort, no
    # array shuffle) — ordering (cos desc, centroid_id asc) encoded as
    # max of (cos, -centroid_id)
    win = F.max(F.struct(F.col("cos").alias("_c"),
                         (-F.col("centroid_id")).alias("_nc"),
                         F.col("centroid_id").alias("_id")))
    return (pairs.select("vec_id", "centroid_id", "cos")
            .groupBy("vec_id").agg(win.alias("_w"))
            .select("vec_id", F.col("_w._id").alias("centroid_id"),
                    F.col("_w._c").alias("cos")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int, nprobe: int = 4, dims: int | None = None,
             id_col="vec_id", vec_col="embedding",
             qid_col="query_id", qvec_col="qvec") -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` centroid buckets nearest
    each query, exact-rank only vectors in those buckets — the scale path
    that replaces the brute-force corpus scan with posting-list reads.
    Output: (query_id, vec_id, rank, cos); deterministic, oracle-checkable.
    """
    assign = ivf_assign(corpus, centroids, dims, id_col, vec_col)
    c = F.broadcast(centroids.select(F.col("centroid_id"), F.col("cvec"))
                    .withColumn("cn", F.sqrt(_fold_norm2(F.col("cvec"), dims))))
    q = queries.select(F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qvec")) \
               .withColumn("qn", F.sqrt(_fold_norm2(F.col("qvec"), dims)))
    qc = q.crossJoin(c).withColumn(
        "ccos", _fold_dot(F.col("qvec"), F.col("cvec"), dims) / (F.col("qn") * F.col("cn")))
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("centroid_id").asc())
    probes = (qc.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= nprobe)
              .select("query_id", "centroid_id", "qvec", "qn"))

    v = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")) \
              .withColumn("vn", F.sqrt(_fold_norm2(F.col("vec"), dims)))
    cand = assign.join(v, "vec_id").join(F.broadcast(probes), "centroid_id") \
                 .filter(F.col("vec_id") != F.col("query_id"))
    cand = cand.withColumn(
        "rcos", _fold_dot(F.col("qvec"), F.col("vec"), dims) / (F.col("qn") * F.col("vn")))
    # drop the embedding arrays before the re-rank shuffle (scalars only)
    cand = cand.select("query_id", "vec_id", "rcos")
    w = Window.partitionBy("query_id").orderBy(F.col("rcos").desc(), F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id",
                    F.col("rank").cast("int").alias("rank"),
                    F.col("rcos").alias("cos")))


def sql_plane_weights_list(plane: int, dims: int) -> str:
    """DuckDB list literal twin of plane_weights (same arithmetic, rendered
    as exact rationals so both engines parse identical doubles)."""
    terms = ", ".join(
        f"(({plane} * 2971 + {i} * 6011 + 13) % {_PLANE_MOD}) / {_PLANE_MOD}.0 - 0.5"
        for i in range(dims))
    return f"[{terms}]"
