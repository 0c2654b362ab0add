"""BM25 ranked retrieval over the documents table — the text-retrieval
tier of the training-data pipeline family (query -> top-k documents),
sibling to the dedup/fingerprint operators that share the space-token
convention (operators/dedup.py).

Scoring uses the BM25 shape with the RATIONAL idf variant

    idf(t)  = ((N - df_t) + 0.5) / (df_t + 0.5)          -- no log
    tfn(t,d)= (tf * (k1+1)) / (tf + k1*((1-b) + b*(dl/avgdl)))
    score   = sum_t floor(idf*tfn * 2^32 + 0.5)          -- int64

Dropping the log keeps every operation +,*,/ on IEEE doubles — both
the engine and the DuckDB oracle evaluate the IDENTICAL expression
chain, so each per-term contribution is the same double bit-for-bit;
quantizing each contribution to the 2^-32 grid BEFORE the per-document
sum makes the reduction an INTEGER sum — order-free, so Spark's
partial-aggregation order cannot flip a rank. (log is monotone, so
log-idf and rational-idf rank identically for single-term queries and
nearly so in practice; the variant is documented, not hidden.)

Plan shape at corpus scale: document tokens are FILTERED to the query
vocabulary with a broadcast semi-join BEFORE any shuffle, so the one
real shuffle — tf = groupBy(doc, term), map-side combined — moves only
matching tokens; df/avgdl/N are constant-small aggregates crossJoin-
broadcast back (the IVF constant-table shape); the final top-k is a
per-query window over candidate docs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Q_SCALE = 4294967296.0  # 2^32 contribution grid


def bm25_topk(docs: DataFrame, queries: list[tuple[int, str]],
              k1: float = 1.2, b: float = 0.75, top_k: int = 10,
              text_col: str = "text") -> DataFrame:
    """Top-``top_k`` documents per query by quantized BM25 (module
    docstring): returns (query_id, doc_id, score_q, rank). ``queries``
    is a constant-small [(query_id, text)] list — terms are de-duped
    per query (BM25 sums over DISTINCT query terms)."""
    spark = docs.sparkSession
    qrows = [(int(qid), tok) for qid, text in queries
             for tok in dict.fromkeys(text.split(" ")) if tok]
    qterms = spark.createDataFrame(qrows, "query_id int, tok string")

    toks = docs.select("doc_id",
                       F.size(F.split(F.col(text_col), " ")).alias("dl"),
                       F.explode(F.split(F.col(text_col), " "))
                       .alias("tok"))
    # broadcast vocabulary filter BEFORE the shuffle
    vocab = qterms.select("tok").distinct()
    hits = toks.join(F.broadcast(vocab), "tok")
    tf = hits.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    consts = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("sum_dl"))

    scored = (tf.join(F.broadcast(dft), "tok")
              .join(F.broadcast(qterms), "tok")
              .crossJoin(F.broadcast(consts)))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = ((F.col("n_docs") - F.col("df")) + F.lit(0.5)) \
        / (F.col("df") + F.lit(0.5))
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) \
        / (F.col("tf") + F.lit(k1)
           * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl)))
    contrib = F.floor(idf * tfn * F.lit(Q_SCALE) + F.lit(0.5)) \
        .cast("long")
    per_doc = (scored.withColumn("cq", contrib)
               .groupBy("query_id", "doc_id")
               .agg(F.sum("cq").alias("score_q")))
    w = Window.partitionBy("query_id") \
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
    return (per_doc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(top_k))
            .select("query_id", "doc_id", "score_q",
                    F.col("rank").cast("long").alias("rank")))


def tfidf_weights(docs: DataFrame, text_col: str = "text",
                  broadcast_df: bool = True) -> DataFrame:
    """TF-IDF document-term weights — the canonical text vectorizer
    (Spärck Jones 1972), the unranked sibling of :func:`bm25_topk`
    sharing its RATIONAL-idf discipline:

        w(d, t) = (tf / dl) * ((N + 1) / (df_t + 1))     -- no log
        w_q     = floor(w * 2^32 + 0.5)                  -- int64 grid

    Same exactness contract: every op is +,*,/ on IEEE doubles with
    identical expression ORDER on both sides, one floor-quantization
    ends the chain. Plan shape: tokens explode -> tf = groupBy(doc,
    term) (the ONE real shuffle, map-side combined) -> df per term
    joined back (broadcast when the vocabulary is bounded —
    ``broadcast_df=False`` flips to a shuffled equi-join for web-scale
    open vocabularies; same plan otherwise) -> constant (N) crossJoin.
    Output: (doc_id, tok, tf, w_q)."""
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_df:
        dft = F.broadcast(dft)
    consts = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    w = (F.col("tf") / F.col("dl")) \
        * ((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
    return (tf.join(dft, "tok").crossJoin(consts)
            .select("doc_id", "tok", "tf",
                    F.floor(w * F.lit(Q_SCALE) + F.lit(0.5))
                    .cast("long").alias("w_q")))


def bigram_novelty(docs: DataFrame, top_k: int = 200,
                   text_col: str = "text",
                   q: float = 1048576.0) -> DataFrame:
    """BIGRAM NOVELTY scoring — the LM-lite corpus-fit quality signal
    (a document whose word bigrams rarely appear among the corpus's
    top-``top_k`` bigrams is boilerplate-free but also more likely
    junk; web-scale pipelines bucket documents by exactly this kind of
    n-gram-model fit before sampling). Per doc:

        n_bigrams  = adjacent token pairs (docs with < 2 tokens -> 0)
        n_novel    = bigrams NOT in the corpus top-K reference set
        novelty_q  = floor(n_novel / n_bigrams * q + 0.5), 0 when empty

    The reference set is the corpus's ``top_k`` most frequent bigrams
    under the TOTAL order (count DESC, bigram ASC) — deterministic tie
    handling, so both sides select the identical set. Scale shape:
    bigrams via ONE doc-partitioned lead() window (the shingle
    discipline — never a nested-HOF O(tokens²) composition), counts
    map-side combined, the K-row reference TakeOrdered-collected
    (constant at any corpus size) and broadcast, the per-doc rollup on
    the window's own partitioning. ONE IEEE division per doc."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (toks.withColumn("nxt", F.lead("tok", 1).over(w))
          .filter(F.col("nxt").isNotNull())
          .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bg")))
    ref = (bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
           .orderBy(F.col("cnt").desc(), F.col("bg").asc())
           .limit(int(top_k)).select("bg", F.lit(1).alias("_hit")))
    per = (bg.join(F.broadcast(ref), "bg", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_bigrams"),
                F.sum(F.when(F.col("_hit").isNull(), 1)
                      .otherwise(0)).alias("n_novel")))
    all_docs = docs.select("doc_id").join(per, "doc_id", "left")
    return all_docs.select(
        "doc_id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
        F.when(F.coalesce(F.col("n_bigrams"), F.lit(0)) == 0, F.lit(0))
        .otherwise(F.floor(F.col("n_novel") / F.col("n_bigrams")
                           * F.lit(q) + F.lit(0.5)))
        .cast("long").alias("novelty_q"))


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       q: float = 1048576.0) -> DataFrame:
    """GOPHER-STYLE repetition signals — the quality filters web-scale
    pipelines apply before sampling (Rae et al. 2021 §A1.1 filter
    excessively repetitive documents by the character fraction of the
    most frequent n-gram and the duplicate-line fraction; this corpus
    is single-line, so the token-level trio applies). Per doc:

        n_tokens       total tokens (space split)
        dup_tok        tokens occurring >= 2 times (occurrences, not
                       distinct types)
        top_tok(+cnt/chars)   most frequent token under the TOTAL
                       order (count DESC, token ASC — the
                       bigram_novelty tie discipline); chars =
                       cnt * len(token)
        top_bg(+cnt/chars)    most frequent adjacent bigram; chars =
                       cnt * (len(bigram) - 1) — the separator space
                       is NOT a document character
        rep_q          floor(dup_tok / n_tokens * q + 0.5) — ONE IEEE
                       division, identical operand order both sides

    Integer counts end-to-end (order-free partial aggregation); docs
    with < 2 tokens get ('', 0, 0) bigram fields, never NULL. Scale
    shape: ONE map-side-combined shuffle per n-gram arity keyed
    (doc_id, gram) + the doc_id window the bigram build already needs;
    argmax per doc is a struct-min — no second shuffle, no collect."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"))
    tc = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    per_tok = (tc.groupBy("doc_id")
               .agg(F.sum("cnt").alias("n_tokens"),
                    F.sum(F.when(F.col("cnt") >= 2, F.col("cnt"))
                          .otherwise(0)).alias("dup_tok"),
                    F.min(F.struct((-F.col("cnt")).alias("nc"),
                                   F.col("tok").alias("tk"))).alias("t1"))
               .select("doc_id", "n_tokens", "dup_tok",
                       F.col("t1.tk").alias("top_tok"),
                       (-F.col("t1.nc")).alias("top_tok_cnt"),
                       ((-F.col("t1.nc")) * F.length("t1.tk"))
                       .alias("top_tok_chars")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (toks.withColumn("nxt", F.lead("tok", 1).over(w))
          .filter(F.col("nxt").isNotNull())
          .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bg")))
    per_bg = (bg.groupBy("doc_id", "bg")
              .agg(F.count(F.lit(1)).alias("cnt"))
              .groupBy("doc_id")
              .agg(F.min(F.struct((-F.col("cnt")).alias("nc"),
                                  F.col("bg").alias("b"))).alias("b1"))
              .select("doc_id", F.col("b1.b").alias("top_bg"),
                      (-F.col("b1.nc")).alias("top_bg_cnt"),
                      ((-F.col("b1.nc")) * (F.length("b1.b") - F.lit(1)))
                      .alias("top_bg_chars")))
    return (per_tok.join(per_bg, "doc_id", "left")
            .select("doc_id", "n_tokens", "dup_tok", "top_tok",
                    "top_tok_cnt", "top_tok_chars",
                    F.coalesce(F.col("top_bg"), F.lit("")).alias("top_bg"),
                    F.coalesce(F.col("top_bg_cnt"), F.lit(0))
                    .cast("long").alias("top_bg_cnt"),
                    F.coalesce(F.col("top_bg_chars"), F.lit(0))
                    .cast("long").alias("top_bg_chars"),
                    F.floor(F.col("dup_tok") / F.col("n_tokens")
                            * F.lit(q) + F.lit(0.5))
                    .cast("long").alias("rep_q")))


def bpe_token_counts(docs: DataFrame, vocab_size: int = 20,
                     text_col: str = "text") -> DataFrame:
    """BPE-ISH subword token counting — the tokenizer-budget signal
    training pipelines bill by (chars/token compression): the merge
    vocabulary is the corpus's top-``vocab_size`` IN-WORD character
    bigrams under the TOTAL order (count DESC, pair ASC — the
    bigram_novelty tie discipline), and each word is tokenized by ONE
    greedy left-to-right pass (at a non-consumed position, consume two
    chars if they form a vocab pair else one — a single-merge-level
    BPE). Per doc: n_words, n_chars (word chars, separators excluded),
    bpe_tokens.

    Plan shape: bigram counting is a bounded substring explode + ONE
    map-side-combined shuffle; the K-row vocabulary is TakeOrdered-
    collected (constant at any corpus size — the IVF discipline) and
    inlined as an array literal; the greedy scan itself is a pure JVM
    F.aggregate fold over char positions — sequential semantics
    WITHOUT leaving whole-stage codegen (no Python in the hot path;
    the fold's accumulator carries (skip, count)). The oracle replays
    the identical scan as a precomputed step table + a recursive
    pure-join walk — visited positions ARE the token count."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("widx", "word"))
    pairs = (toks
             .select(F.explode(F.expr(
                 "transform(sequence(1, greatest(length(word) - 1, 0)), "
                 "i -> substring(word, i, 2))")).alias("pr"))
             .filter(F.length("pr") == 2))
    vocab = [r.pr for r in
             (pairs.groupBy("pr").agg(F.count(F.lit(1)).alias("c"))
              .orderBy(F.col("c").desc(), F.col("pr").asc())
              .limit(int(vocab_size)).collect())]
    varr = F.array(*[F.lit(p) for p in sorted(vocab)]) if vocab \
        else F.array().cast("array<string>")
    scan = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.struct(F.lit(False).alias("skip"),
                 F.lit(0).alias("cnt")),
        lambda acc, i: F.struct(
            F.when(acc.skip, F.lit(False)).otherwise(
                (i < F.length("word"))
                & F.array_contains(varr, F.col("word").substr(i, F.lit(2)))
            ).alias("skip"),
            F.when(acc.skip, acc.cnt).otherwise(acc.cnt + 1).alias("cnt")),
        lambda acc: acc.cnt)
    # Spark's sequence(1, 0) DESCENDS instead of returning empty — an
    # empty word (double separator) must be guarded to 0 tokens
    per_word = toks.select(
        "doc_id", F.length("word").alias("wlen"),
        F.when(F.length("word") == 0, F.lit(0))
        .otherwise(scan).alias("wtok"))
    return (per_word.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("wlen").alias("n_chars"),
                 F.sum("wtok").cast("long").alias("bpe_tokens")))


def gini_by_group(docs: DataFrame, value_col: str = "n_chars",
                  group_col: str = "source",
                  q: float = 1048576.0) -> DataFrame:
    """GINI COEFFICIENT of a per-document size/score distribution by
    group — the corpus-inequality diagnostic (a source whose token
    mass concentrates in a few documents skews sampling): the exact
    sorted-rank identity

        G = (2*Sum(i*x_i) - (n+1)*Sum(x)) / (n*Sum(x)),  x ascending

    with integer x — both operands of the ONE IEEE division are exact
    int64 sums, and Sum(i*x_i) is tie-permutation-invariant (equal x
    swap freely), so the row_number tie order cannot change the value.
    One per-group window + one map-side-combined rollup."""
    w = Window.partitionBy(group_col).orderBy(F.col("x").asc(),
                                              F.col("doc_id").asc())
    ranked = docs.select(group_col, "doc_id",
                         F.col(value_col).cast("long").alias("x")) \
        .withColumn("i", F.row_number().over(w).cast("long"))
    return (ranked.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("x").alias("x_sum"),
                 F.sum(F.col("i") * F.col("x")).alias("ix_sum"))
            .select(group_col, "n_docs", "x_sum",
                    # a zero-mass group has no inequality to measure:
                    # pin G = 0 rather than divide by zero
                    F.when(F.col("x_sum") == 0, F.lit(0))
                    .otherwise(
                        F.floor((F.lit(2) * F.col("ix_sum")
                                 - (F.col("n_docs") + 1)
                                 * F.col("x_sum"))
                                / (F.col("n_docs") * F.col("x_sum"))
                                * F.lit(q) + F.lit(0.5)))
                    .cast("long").alias("gini_q")))
