"""BM25 ranked retrieval: engine vs a pure-Python reference on a
crafted corpus (exact integer score equality — the quantized
rational-idf contract), ranking invariants, query-term dedup, and plan
quality (pure JVM, broadcast dimension joins, vocabulary filter below
the shuffle)."""
import math

import numpy as np  # noqa: F401

from geotrellis_contrib_spark.operators.retrieval import (
    Q_SCALE, bm25_topk)


def _ref_scores(docs, queries, k1=1.2, b=0.75):
    """Independent BM25 reference (plain Python floats, same variant)."""
    n = len(docs)
    dls = {d: len(t.split(" ")) for d, t in docs}
    avgdl = sum(dls.values()) / n
    tf = {}
    for d, t in docs:
        for tok in t.split(" "):
            tf[(d, tok)] = tf.get((d, tok), 0) + 1
    df = {}
    for (d, tok), c in tf.items():
        df[tok] = df.get(tok, 0) + 1
    out = {}
    for qid, qt in queries:
        for tok in dict.fromkeys(qt.split(" ")):
            for d, _ in docs:
                f = tf.get((d, tok))
                if not f:
                    continue
                idf = ((n - df[tok]) + 0.5) / (df[tok] + 0.5)
                tfn = (f * (k1 + 1.0)) / (
                    f + k1 * ((1.0 - b) + b * (dls[d] / avgdl)))
                out[(qid, d)] = out.get((qid, d), 0) \
                    + math.floor(idf * tfn * Q_SCALE + 0.5)
    return out


def test_bm25_matches_reference_and_ranks(spark):
    docs = [(0, "spark join fast fast"), (1, "join slow table"),
            (2, "spark spark spark join"), (3, "table scan scan big"),
            (4, "fast join"), (5, "scan")]
    queries = [(0, "spark join"), (1, "scan table"), (2, "fast")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = bm25_topk(df, queries, top_k=10).collect()
    ref = _ref_scores(docs, queries)
    got = {(r.query_id, r.doc_id): r.score_q for r in rows}
    assert got == ref  # exact integer equality, every candidate ranked
    # ranks: strictly by (score desc, doc_id asc) within each query
    for qid in (0, 1, 2):
        qr = sorted([r for r in rows if r.query_id == qid],
                    key=lambda r: r.rank)
        keys = [(-r.score_q, r.doc_id) for r in qr]
        assert keys == sorted(keys)
        assert [r.rank for r in qr] == list(range(1, len(qr) + 1))
    # doc 2 (tf=3 for 'spark', short) must beat doc 0 on query 0
    r2 = next(r.rank for r in rows if r.query_id == 0 and r.doc_id == 2)
    assert r2 == 1


def test_bm25_query_term_dedup_and_topk(spark):
    docs = [(i, "alpha beta " + "gamma " * (i % 3)) for i in range(20)]
    docs = [(d, t.strip()) for d, t in docs]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    # duplicate query terms count once
    a = bm25_topk(df, [(0, "alpha alpha beta")], top_k=5).collect()
    b = bm25_topk(df, [(0, "alpha beta")], top_k=5).collect()
    assert [(r.doc_id, r.score_q, r.rank) for r in a] \
        == [(r.doc_id, r.score_q, r.rank) for r in b]
    assert len(a) == 5  # top_k enforced


def test_bm25_plan_quality(spark):
    docs = spark.createDataFrame([(0, "x y"), (1, "y z")],
                                 "doc_id bigint, text string")
    out = bm25_topk(docs, [(0, "y z")], top_k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas",
                 "MapInPandas"):
        assert node not in plan
    out.collect()


def test_tfidf_vs_reference(spark):
    from geotrellis_contrib_spark.operators.retrieval import tfidf_weights
    docs = [(1, "a b a c"), (2, "a b"), (3, "c c d")]
    df_s = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.tok): (r.tf, r.w_q)
           for r in tfidf_weights(df_s).collect()}
    n = len(docs)
    tf, dfc, dls = {}, {}, {}
    for d, t in docs:
        ts = t.split(" ")
        dls[d] = len(ts)
        for tok in ts:
            tf[(d, tok)] = tf.get((d, tok), 0) + 1
    for (d, tok) in tf:
        dfc[tok] = dfc.get(tok, 0) + 1
    exp = {}
    for (d, tok), f in tf.items():
        w = (f / dls[d]) * ((n + 1.0) / (dfc[tok] + 1.0))
        exp[(d, tok)] = (f, math.floor(w * Q_SCALE + 0.5))
    assert got == exp
    # ordering sanity: doc 3's dominant rare term outweighs doc 1's
    # repeated common term
    assert got[(3, "c")][1] > got[(1, "a")][1]


def test_tfidf_plan_no_python(spark):
    from geotrellis_contrib_spark.operators.retrieval import tfidf_weights
    df_s = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = tfidf_weights(df_s)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_bigram_novelty_vs_reference(spark):
    from geotrellis_contrib_spark.operators.retrieval import bigram_novelty
    docs = [(1, "a b a b c"), (2, "a b"), (3, "x y z"), (4, "solo"),
            (5, "a b a b")]
    df_s = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.n_novel, r.novelty_q)
           for r in bigram_novelty(df_s, top_k=2).collect()}
    # corpus bigrams: 'a b' x4, 'b a' x2, 'b c' x1, 'x y' x1, 'y z' x1
    # top-2 (count desc, bg asc): {'a b', 'b a'}
    q = 1048576.0
    assert got[1] == (4, 1, math.floor(1 / 4 * q + 0.5))   # 'b c' novel
    assert got[2] == (1, 0, 0)
    assert got[3] == (2, 2, math.floor(2 / 2 * q + 0.5))
    assert got[4] == (0, 0, 0)                              # single token
    assert got[5] == (3, 0, 0)


def test_bigram_novelty_tie_break_deterministic(spark):
    from geotrellis_contrib_spark.operators.retrieval import bigram_novelty
    # 'a a' and 'b b' both count 1: top-1 must pick 'a a' (bg ASC)
    docs = [(1, "a a"), (2, "b b")]
    df_s = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.n_novel
           for r in bigram_novelty(df_s, top_k=1).collect()}
    assert got == {1: 0, 2: 1}


def test_repetition_signals_hand_values(spark):
    from geotrellis_contrib_spark.operators.retrieval import (
        repetition_signals)
    docs = [
        (0, "a b a b a"),      # top tok a(3); bigrams: "a b"x2 "b a"x2
        (1, "x y z"),          # all unique: dup 0, top tok x (tie ASC)
        (2, "w"),              # single token: no bigram fields
        (3, "cc cc d"),        # top tok cc(2) chars 4; top bg "cc cc"
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in repetition_signals(df).collect()}
    r0 = got[0]
    # dup_tok = 5 (a x3 + b x2); top bigram tie "a b" vs "b a" -> ASC
    assert (r0["n_tokens"], r0["dup_tok"]) == (5, 5)
    assert (r0["top_tok"], r0["top_tok_cnt"], r0["top_tok_chars"]) \
        == ("a", 3, 3)
    assert (r0["top_bg"], r0["top_bg_cnt"], r0["top_bg_chars"]) \
        == ("a b", 2, 4)
    assert r0["rep_q"] == 1048576  # 5/5 exactly 1.0
    r1 = got[1]
    assert (r1["dup_tok"], r1["top_tok"], r1["top_tok_cnt"],
            r1["rep_q"]) == (0, "x", 1, 0)
    r2 = got[2]
    assert (r2["n_tokens"], r2["top_bg"], r2["top_bg_cnt"],
            r2["top_bg_chars"]) == (1, "", 0, 0)
    r3 = got[3]
    assert (r3["top_tok"], r3["top_tok_chars"]) == ("cc", 4)
    assert (r3["top_bg"], r3["top_bg_cnt"], r3["top_bg_chars"]) \
        == ("cc cc", 1, 4)
    # 2/3 quantized: floor(2/3 * 2^20 + .5)
    assert r3["rep_q"] == int(2 / 3 * 1048576.0 + 0.5)


def _bpe_ref(docs, vocab_size=20):
    """Independent replica: vocab by (count DESC, pair ASC), greedy
    left-to-right scan."""
    from collections import Counter
    cnt = Counter()
    for _, t in docs:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                cnt[w[i:i + 2]] += 1
    vocab = set(p for p, _ in sorted(
        cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size])
    out = {}
    for d, t in docs:
        words = t.split(" ")
        toks = 0
        for w in words:
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i:i + 2] in vocab:
                    i += 2
                else:
                    i += 1
                toks += 1
        out[d] = (len(words), sum(len(w) for w in words), toks)
    return out


def test_bpe_counts_vs_reference_and_greedy_nonoverlap(spark):
    from geotrellis_contrib_spark.operators.retrieval import (
        bpe_token_counts)
    docs = [
        (0, "banana bandana"),
        (1, "aaaa aaa"),          # greedy: aa|aa=2, aa|a=2 (not 1!)
        (2, "x yz banan"),
        (3, "na na na an"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_chars, r.bpe_tokens)
           for r in bpe_token_counts(df, vocab_size=3).collect()}
    assert got == _bpe_ref(docs, vocab_size=3)
    # the greedy non-overlap pin: "aa" is certainly in the top-3 vocab
    # (4 occurrences); "aaaa" -> 2 tokens, "aaa" -> 2 tokens
    assert got[1] == (2, 7, 4)


def test_bpe_counts_fixture_compression(spark):
    from geotrellis_contrib_spark.operators.retrieval import (
        bpe_token_counts)
    docs = [(i, "the quick brown fox jumps over the lazy dog".replace(
        " ", " ") ) for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bpe_token_counts(df).collect()
    ref = _bpe_ref(docs)
    assert {r.doc_id: (r.n_words, r.n_chars, r.bpe_tokens)
            for r in got} == ref
    # merges actually happened: tokens strictly under chars
    assert all(r.bpe_tokens < r.n_chars for r in got)
