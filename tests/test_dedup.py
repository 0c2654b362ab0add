"""Dedup operator unit tests: simhash banding recall guarantee and the
jaccard stop-shingle document-frequency cap (VERDICT r1 items 6-7)."""

import pytest

from geotrellis_contrib_spark.operators import dedup as dd


def test_simhash_near_pairs_guard_rejects_recall_hole(spark):
    sims = spark.createDataFrame([("a", 1), ("b", 2)], "doc_id string, simhash long")
    # 3 bands of 16 bits cannot guarantee hamming <= 8 (the r1 bug)
    with pytest.raises(ValueError, match="recall hole"):
        dd.simhash_near_pairs(sims, max_hamming=8, band_bits=16)


def test_simhash_near_pairs_planted_hamming6_found(spark):
    # flip 6 bits spread across 6 DIFFERENT 6-bit bands (worst case for
    # banding): bands 6 and 7 stay identical -> pigeonhole must surface it
    base = 0x0000_5A5A_5A5A
    flipped = base
    for bit in (0, 6, 12, 18, 24, 30):
        flipped ^= 1 << bit
    sims = spark.createDataFrame(
        [("a", base), ("b", flipped), ("far", base ^ ((1 << 40) - 1))],
        "doc_id string, simhash long")
    out = dd.simhash_near_pairs(sims, max_hamming=7, band_bits=6).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out}
    assert pairs.get(("a", "b")) == 6
    assert ("a", "far") not in pairs and ("b", "far") not in pairs


def test_jaccard_max_df_caps_hot_shingle(spark):
    # 30 docs share the boilerplate prefix "a b c d e" (hot shingles with
    # df=30); two docs are true exact dups of each other.
    rows = [(f"doc-{i:02d}", f"a b c d e w{i} x{i} y{i}") for i in range(30)]
    rows += [("dup-1", "p q r s t u v"), ("dup-2", "p q r s t u v")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    uncapped = dd.jaccard_pairs(docs, n=3, threshold=0.3).collect()
    capped = dd.jaccard_pairs(docs, n=3, threshold=0.3, max_df=10).collect()
    # without the cap the boilerplate makes every doc pair a candidate
    assert len(uncapped) > len(capped)
    # the true dup pair survives the cap (its shingles have df=2)
    capped_pairs = {(r.doc_a, r.doc_b) for r in capped}
    assert ("dup-1", "dup-2") in capped_pairs
    # no boilerplate-only pair survives: every surviving pair has jaccard
    # computed over CAPPED sets, so boilerplate docs share nothing
    assert all("dup" in a or "dup" in b for a, b in capped_pairs)


def test_jaccard_default_cap_is_on_and_lossless_below_cap(spark):
    """r5 verdict task 6: max_df defaults to a FINITE cap (1000). On a
    corpus whose every shingle has df << 1000 the default is lossless
    (identical pairs to the uncapped run); on a crafted corpus with a
    shingle hotter than the cap the default prunes it."""
    rows = [(f"doc-{i:02d}", f"m{i} n{i} o{i} p{i} q{i}") for i in range(20)]
    rows += [("dup-1", "p q r s t u v"), ("dup-2", "p q r s t u v")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    default = dd.jaccard_pairs(docs, n=3, threshold=0.3).collect()
    uncapped = dd.jaccard_pairs(docs, n=3, threshold=0.3,
                                max_df=None).collect()
    key = lambda r: (r.doc_a, r.doc_b, r.inter, r.size_a, r.size_b)  # noqa: E731
    assert sorted(map(key, default)) == sorted(map(key, uncapped))
    # crafted hot shingle: 1500 docs sharing one 3-gram would exceed the
    # default cap — prove the cap engages by using an explicit tiny corpus
    hot = [(f"h-{i:04d}", "a b c") for i in range(5)]
    hot_docs = spark.createDataFrame(hot, "doc_id string, text string")
    assert dd.jaccard_pairs(hot_docs, n=3, threshold=0.3,
                            max_df=4).count() == 0
    assert dd.jaccard_pairs(hot_docs, n=3, threshold=0.3).count() > 0


def test_simhash_scale_mode_recall_and_bounded_candidates(spark):
    """Scale mode (4 x 12-bit bands, h <= 3): planted hamming-3 pairs are
    guaranteed found, and the candidate count stays near the true-pair
    count — NOT n^2/64 (the r2 wide-radius mode's fan-out at scale)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    n = 2000
    base = [rng.getrandbits(48) for _ in range(n)]
    rows = [(f"d{i:05d}", h) for i, h in enumerate(base)]
    # plant 5 pairs at exact hamming 3 (flip 3 distinct bits)
    planted = []
    for i in range(5):
        h = base[i]
        bits = rng.sample(range(48), 3)
        h2 = h
        for b in bits:
            h2 ^= 1 << b
        rows.append((f"p{i:05d}", h2))
        planted.append((f"d{i:05d}", f"p{i:05d}"))
    sims = spark.createDataFrame(rows, "doc_id string, simhash long")
    out = dd.simhash_near_pairs(sims, max_hamming=3, band_bits=12)
    got = {(r.doc_a, r.doc_b) for r in out.collect()}
    for a, b in planted:
        assert (min(a, b), max(a, b)) in got
    # candidate volume check: count the banded join's raw candidates
    n_bands, mask = 4, (1 << 12) - 1
    bands = F.array(*[F.struct(
        F.lit(bi).alias("band_idx"),
        F.shiftright(F.col("simhash"), bi * 12).bitwiseAND(F.lit(mask)).alias("band_key"))
        for bi in range(n_bands)])
    e = sims.select("doc_id", F.explode(bands).alias("b")) \
            .select("doc_id", F.col("b.band_idx").alias("band_idx"),
                    F.col("b.band_key").alias("band_key"))
    a = e.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
    b = e.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
    n_cand = (a.join(b, ["band_idx", "band_key"])
              .filter(F.col("doc_a") < F.col("doc_b")).count())
    # 2005 random 48-bit hashes over 4096 buckets/band: ~n^2/4096 per band
    # ~ 4 * 500 expected; the old 64-bucket keys would give ~250k
    assert n_cand < 10000, n_cand


def test_winnow_fingerprints_vs_reference(spark):
    """Engine winnowing equals a pure-Python MOSS reference (hash chain,
    window min, RIGHTMOST tie) on crafted docs, and the guarantee holds:
    two docs sharing a >= window+n-1 token substring share >= 1
    fingerprint hash."""
    from geotrellis_contrib_spark.functions.text import FP_BASE, FP_MOD
    from geotrellis_contrib_spark.operators.dedup import (
        SHINGLE_COMBINE, winnow_fingerprints)

    n, w = 3, 4
    shared = "alpha bravo charlie delta echo foxtrot golf"  # w+n-1=6 < 7
    docs = [(0, "zulu yankee " + shared + " xray whiskey"),
            (1, shared + " victor uniform tango sierra"),
            (2, "november november november november november november"),
            (3, "one two")]  # < n tokens -> no shingles
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, n=n, window=w).collect():
        got.setdefault(r.doc_id, set()).add((r.fp, r.fp_pos))

    def ref(text):
        toks = text.split(" ")
        hs = []
        for t in toks:
            a = 0
            for ch in t:
                a = (a * FP_BASE + ord(ch)) % FP_MOD
            hs.append(a)
        sh = []
        for i in range(len(hs) - n + 1):
            a = hs[i]
            for j in range(1, n):
                a = (a * SHINGLE_COMBINE + hs[i + j]) % FP_MOD
            sh.append((i, a))
        out = set()
        for i in range(len(sh) - w + 1):
            win = sh[i:i + w]
            m = min(s for _, s in win)
            pos = max(p for p, s in win if s == m)  # rightmost tie
            out.add((m, pos))
        return out

    for did, text in docs:
        assert got.get(did, set()) == ref(text), did
    # the winnowing guarantee across docs 0 and 1
    h0 = {fp for fp, _ in got[0]}
    h1 = {fp for fp, _ in got[1]}
    assert h0 & h1, "shared >= w+n-1 substring must share a fingerprint"
    # all-identical-token doc: every shingle equal -> exactly one hash,
    # rightmost selection slides -> positions dedupe per window
    assert len({fp for fp, _ in got[2]}) == 1


def test_edit_distance_pairs_complete_vs_brute(spark):
    """SymSpell deletion blocking finds EVERY d<=1 pair (substitution,
    insertion, deletion, equality) and excludes d=2; exact vs a brute
    python Levenshtein."""
    from geotrellis_contrib_spark.operators.dedup import edit_distance_pairs

    titles = [
        (0, "winterthur"), (1, "wxnterthur"),   # substitution -> 1
        (2, "winterthur"),                      # equal to 0 -> 0
        (3, "winterthurs"),                     # insertion -> 1 vs 0/2
        (4, "winterthu"),                       # deletion -> 1 vs 0/2
        (5, "wxnterthurs"),                     # 2 from 0; 1 from 1(ins)
        (6, "completely different"),
        (7, ""), (8, "a"),                      # empty/1-char edges
    ]
    df = spark.createDataFrame(titles, "doc_id long, title string")
    got = {(r.doc_a, r.doc_b): r.dist
           for r in edit_distance_pairs(df).collect()}

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[n]

    want = {(a, b): lev(ta, tb)
            for a, ta in titles for b, tb in titles
            if a < b and lev(ta, tb) <= 1}
    assert got == want
    assert (0, 5) not in got and (2, 5) not in got  # d=2 excluded


def test_edit_distance_pairs_max_bucket_cap(spark):
    from geotrellis_contrib_spark.operators.dedup import edit_distance_pairs

    # 30 identical titles: every variant bucket holds all 30 -> the cap
    # drops them all (documented recall loss); uncapped finds C(30,2)
    df = spark.createDataFrame([(i, "samesame") for i in range(30)],
                               "doc_id long, title string")
    assert edit_distance_pairs(df).count() == 30 * 29 // 2
    assert edit_distance_pairs(df, max_bucket=10).count() == 0


def test_span_dedup_hand_values(spark):
    from geotrellis_contrib_spark.operators.dedup import span_dedup
    # window=3: doc 0 and 1 share "a b c"; doc 2 self-repeats
    # "x y z ... x y z" (same-doc duplication counts); doc 3 is short
    docs = [
        (0, "a b c d e"),              # span "a b c" dup at pos 0
        (1, "q a b c r"),              # dup at pos 1
        (2, "x y z w x y z"),          # "x y z" at 0 and 4 (self-dup)
        (3, "s t"),                    # shorter than the window
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens, r.dup_q)
           for r in span_dedup(df, window=3).collect()}
    q = 1048576.0
    assert got[0] == (5, 1, 3, int(3 / 5 * q + 0.5))
    assert got[1] == (5, 1, 3, int(3 / 5 * q + 0.5))
    # doc 2: two dup spans [0,3) and [4,7) -> union 6 of 7 tokens
    assert got[2] == (7, 2, 6, int(6 / 7 * q + 0.5))
    assert got[3] == (2, 0, 0, 0)


def test_span_dedup_overlapping_union(spark):
    from geotrellis_contrib_spark.operators.dedup import span_dedup
    # overlapping duplicated spans must union, not double-count:
    # "a a a a a a" has spans (a a a) at 0..3, all identical -> dup;
    # union covers ALL 6 tokens, not 4*3
    df = spark.createDataFrame([(0, "a a a a a a")],
                               "doc_id long, text string")
    r = span_dedup(df, window=3).collect()[0]
    assert (r.n_tokens, r.n_dup_spans, r.dup_tokens) == (6, 4, 6)


def test_decontaminate_hand_case(spark):
    from pyspark.sql import functions as F
    from geotrellis_contrib_spark.operators.dedup import decontaminate
    docs = [
        (0, "a b c d e f"),         # EVAL (pred: doc_id % 2 == 0 -> 0, 2)
        (2, "z z z"),               # EVAL, too short for w=3? no: 1 span
        (1, "x a b c y q r s"),     # shares span "a b c" with eval 0
        (3, "p q r s t"),           # clean
        (5, "z z z w"),             # shares "z z z" with eval 2
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_spans, r.n_contaminated, r.contaminated)
           for r in decontaminate(df, F.col("doc_id") % 2 == 0,
                                  window=3).collect()}
    assert set(got) == {1, 3, 5}      # eval docs excluded from output
    assert got[1] == (6, 1, 1)
    assert got[3] == (3, 0, 0)
    assert got[5] == (2, 1, 1)
