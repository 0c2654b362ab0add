"""Multi-table hyperplane-LSH behavior: planted near-pair recall and
bucket-key cardinality (the 100TB shape: candidates come from
high-cardinality (table, bucket) keys, never from quadratic blocks)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark.operators import similarity as sim

DIMS = 64


def _mk_corpus(spark, n=400, planted_pairs=8, seed=7):
    """Deterministic corpus with `planted_pairs` near-identical pairs
    (cos >= 0.999): ids 2i / 2i+1 are copies with a tiny perturbation."""
    rng = np.random.RandomState(seed)
    base = rng.normal(size=(n, DIMS)).astype(np.float32)
    for i in range(planted_pairs):
        base[2 * i + 1] = base[2 * i] + rng.normal(scale=1e-3, size=DIMS).astype(np.float32)
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_near_pairs_recall(spark):
    corpus = _mk_corpus(spark)
    pairs = sim.lsh_near_pairs(corpus, dims=DIMS, min_cos=0.999)
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    want = {(2 * i, 2 * i + 1) for i in range(8)}
    # deterministic planes + deterministic corpus: with 4 tables of 12
    # planes a cos>=0.999 pair collides in >=1 table with prob ~1-(1-.93)^4;
    # this fixed instance finds all 8 (regression-pins the plane family)
    assert want <= got, f"missing planted pairs: {want - got}"


def test_bucket_cardinality_bounds_candidates(spark):
    """The scale guarantee: bucket keys are high-cardinality (L * 2^P
    possible), so candidate pairs stay near the true-near-pair count —
    NOT n^2/buckets blocks."""
    corpus = _mk_corpus(spark, n=400)
    b = sim.lsh_tables(corpus, dims=DIMS)
    per_bucket = (b.groupBy("table_id", "bucket").count()
                  .agg(F.max("count").alias("mx")).collect()[0].mx)
    # 400 random vectors over 4096 buckets/table: the densest bucket stays
    # tiny (quadratic blocks would need ~n/buckets >> 1)
    assert per_bucket <= 8
    n_cand = (b.alias("a").join(b.alias("b"),
                                (F.col("a.table_id") == F.col("b.table_id"))
                                & (F.col("a.bucket") == F.col("b.bucket"))
                                & (F.col("a.vec_id") < F.col("b.vec_id")))
              .select("a.vec_id", "b.vec_id").distinct().count())
    # candidates ~ planted pairs + a few random collisions, never ~n^2/64
    assert n_cand < 400


def test_sparse_plane_family_density():
    """Very-sparse projection family: density ~1/8, values in {-1,0,+1}."""
    total = nonzero = 0
    for p in range(48):
        ws = sim.plane_weights(p, DIMS)
        assert set(ws) <= {-1.0, 0.0, 1.0}
        total += len(ws)
        nonzero += sum(1 for w in ws if w != 0.0)
    assert 0.06 <= nonzero / total <= 0.20  # ~1/8 expected


def test_fixed_centroid_budget(spark):
    """select_centroids returns exactly K rows no matter the corpus size,
    and the selection is a deterministic function of ids only."""
    c1 = sim.select_centroids(_mk_corpus(spark, n=200), 16)
    c2 = sim.select_centroids(_mk_corpus(spark, n=400), 16)
    ids1 = [r.centroid_id for r in c1.orderBy("centroid_id").collect()]
    ids2 = [r.centroid_id for r in c2.orderBy("centroid_id").collect()]
    assert len(ids1) == len(ids2) == 16
    # growing the corpus can only swap members in/out by hash order —
    # the budget itself never grows
    assert c2.count() == 16


def test_dot_matches_numpy(spark):
    """The SQL-text fold equals numpy within fp tolerance (the oracle gate
    checks bitwise vs DuckDB; this pins plain correctness)."""
    corpus = _mk_corpus(spark, n=8, planted_pairs=2)
    pdf = corpus.toPandas()
    got = corpus.select(
        "vec_id", sim.dot_col("embedding", "embedding", DIMS).alias("d")).toPandas()
    for _, row in got.iterrows():
        v = np.array(pdf[pdf.vec_id == row.vec_id].embedding.iloc[0], dtype=np.float64)
        assert row.d == pytest.approx(float(v @ v), rel=1e-12)


def test_pq_encode_matches_brute_force(spark):
    """PQ codes equal a per-vector python argmin over the same
    Knuth-selected codebook; packed codes fit 4 bits per subspace."""
    import numpy as np

    from geotrellis_contrib_spark.operators import similarity as sim

    e = spark.createDataFrame(
        [(i, [float(((i * 37 + j * 11) % 19) - 9) / 9.0
              for j in range(64)]) for i in range(80)],
        "vec_id long, embedding array<float>")
    _, C = sim._pq_codebook(e, 64)
    out = {r.vec_id: r.pq_code
           for r in sim.pq_encode(e, dims=64).collect()}
    rows = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in e.collect()}
    assert set(out) == set(rows)
    for vid, v in rows.items():
        packed = 0
        for m in range(sim.PQ_M):
            acc = np.zeros(C.shape[0])
            for i in range(m * 8, (m + 1) * 8):
                d = v[i] - C[:, i]
                acc += d * d
            packed |= int(np.argmin(acc)) << (4 * m)
        assert out[vid] == packed
        assert 0 <= out[vid] < (1 << 32)


def test_pq_adc_exact_duplicate_ranks_first(spark):
    """A corpus vector identical to the query encodes to the query's own
    nearest codewords, so its ADC distance equals the query's own
    quantization residual — the minimum possible — and it ranks 1."""
    from geotrellis_contrib_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    # modulus 61 > corpus size so no accidental duplicates (61 prime)
    vecs = [(i, [float(((i * 53 + j * 7) % 61) - 30) / 30.0
                 for j in range(64)]) for i in range(60)]
    # vec 59 duplicates vec 3 (the query)
    vecs[59] = (59, vecs[3][1])
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    q = e.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"))
    rows = sim.pq_topk(e, q, dims=64, k=5).collect()
    top = min(rows, key=lambda r: r.rank)
    assert top.vec_id == 59 and top.rank == 1
    # and every other candidate scores >= the duplicate
    assert all(r.adc_q >= top.adc_q for r in rows)


def _np_lloyd_state(X, cents_sorted, q=float(1 << 30)):
    """Independent replay: cosine argmax (smallest-cid ties via argmax
    over ascending-cid columns) + quantized per-cluster dim sums."""
    cids = np.array(sorted(c[0] for c in cents_sorted))
    C = np.array([v for _, v in sorted(cents_sorted)], dtype=np.float64)
    cos = (X @ C.T) / (np.linalg.norm(X, axis=1)[:, None]
                       * np.linalg.norm(C, axis=1)[None, :])
    best = np.argmax(cos, axis=1)
    state = {}
    terms = np.floor(X * q + 0.5).astype(np.int64)
    for b in np.unique(best):
        m = best == b
        state[int(cids[b])] = (terms[m].sum(axis=0), int(m.sum()))
    return best, state


def test_kmeans_lloyd_two_iterations_vs_numpy(spark):
    # well-separated blobs + stragglers so iteration 2 actually MOVES
    # assignments (asserted — otherwise the 2-iteration claim is vacuous)
    rng = np.random.RandomState(11)
    centers = rng.normal(size=(3, DIMS)).astype(np.float64) * 4
    X = np.concatenate([
        centers[i] + rng.normal(scale=0.4, size=(30, DIMS))
        for i in range(3)]).astype(np.float32).astype(np.float64)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    X = np.stack([np.asarray(r[1], dtype=np.float32) for r in rows]) \
        .astype(np.float64)  # float32 round-trip = what the engine sees

    # replay: seeds = Knuth order, then one update + reassign
    k = 3
    h = [((i % 2**31) * 2654435761 % 2**31, i) for i in range(len(X))]
    seed_ids = [i for _, i in sorted(h)[:k]]
    cents = [(i, X[i].tolist()) for i in seed_ids]
    best1, state1 = _np_lloyd_state(X, cents)
    q = float(1 << 30)
    cents2 = [(cid, ((s / q) / n).tolist())
              for cid, (s, n) in state1.items()]
    best2, state2 = _np_lloyd_state(X, cents2)
    assert (best1 != best2).any()          # iteration 2 moved something

    got = {(r.centroid_id, r.i): (r.q_sum, r.n_vecs)
           for r in sim.kmeans_lloyd(df, k=3, iters=2).collect()}
    exp = {(cid, i): (int(s[i]), n)
           for cid, (s, n) in state2.items() for i in range(DIMS)}
    assert got == exp


def test_kmeans_lloyd_empty_cluster_fail_loud(spark):
    # two identical vectors, k=2: one seed captures both (smallest-cid
    # tie), the other cluster is empty -> must raise, not silently drop
    rows = [(0, [1.0] * DIMS), (1, [1.0] * DIMS)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty cluster"):
        sim.kmeans_lloyd(df, k=2, iters=2)


def test_kmeans_state_partition_invariance(spark):
    rng = np.random.RandomState(5)
    X = rng.normal(size=(50, DIMS)).astype(np.float32)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(50)]
    cents = [(0, X[0].astype(np.float64).tolist(),
              float(np.sqrt(np.sum(X[0].astype(np.float64)**2)))),
             (7, X[7].astype(np.float64).tolist(),
              float(np.sqrt(np.sum(X[7].astype(np.float64)**2))))]
    outs = []
    for parts in (1, 9):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>").repartition(parts)
        outs.append({(r.centroid_id, r.i): (r.q_sum, r.n_vecs)
                     for r in sim.kmeans_lloyd_state(df, cents).collect()})
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_embed_outlier_numpy_replay_and_centroid_identity(spark):
    import numpy as np
    from geotrellis_contrib_spark.operators.similarity import embed_outlier
    q = float(1 << 30)
    rows = []
    vecs = {}
    k = 0
    for lb in range(3):
        for j in range(5):
            v = [float(((k * 13 + d * 7) % 19) - 9) / 4.0
                 for d in range(8)]
            rows.append((k, v, lb))
            vecs[k] = (lb, v)
            k += 1
    # one vector exactly AT its group centroid: group 3 = two copies
    rows.append((100, [1.0] * 8, 3))
    rows.append((101, [1.0] * 8, 3))
    vecs[100] = (3, [1.0] * 8)
    vecs[101] = (3, [1.0] * 8)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r.cos_q
           for r in embed_outlier(df, dims=8).collect()}
    # replica: same quantized centroid + same cosine chain
    from collections import defaultdict
    sums = defaultdict(lambda: np.zeros(8, dtype=np.int64))
    cnt = defaultdict(int)
    for vid, (lb, v) in vecs.items():
        v64 = np.asarray(np.asarray(v, dtype=np.float32), dtype=np.float64)
        sums[lb] += np.floor(v64 * q + 0.5).astype(np.int64)
        cnt[lb] += 1
    for vid, (lb, v) in vecs.items():
        c = (sums[lb] / q) / cnt[lb]
        v64 = np.asarray(np.asarray(v, dtype=np.float32), dtype=np.float64)
        dot = 0.0
        na = nb = 0.0
        for d in range(8):
            dot += v64[d] * c[d]
            na += v64[d] * v64[d]
            nb += c[d] * c[d]
        cos = dot / (np.sqrt(na) * np.sqrt(nb))
        assert got[vid] == int(np.floor(cos * 1048576.0 + 0.5))
    # the at-centroid vectors score exactly 1.0
    assert got[100] == got[101] == 1048576
