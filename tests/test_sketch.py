"""Sketch family: HLL state vs python replay + estimation accuracy,
count-min state/guarantees, Bloom state/membership, merge properties,
fail-louds."""
import pytest

from geotrellis_contrib_spark.functions.text import FP_BASE, FP_MOD
from geotrellis_contrib_spark.operators import sketch as SK

M31 = 2147483648


def char_hash(s):
    a = 0
    for c in s:
        a = (a * FP_BASE + ord(c)) % FP_MOD
    return a


def fmix31(i):
    """Murmur3 fmix32 of the id, top 31 bits — the python replay of
    sketch.sql_hash31."""
    h = i % (2 * M31)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) % (2 * M31)
    h ^= h >> 13
    h = (h * 0xC2B2AE35) % (2 * M31)
    h ^= h >> 16
    return h >> 1


def py_state(ids, p=9):
    wbits = 31 - p
    regs = {}
    for i in ids:
        h = fmix31(i)
        reg = h >> wbits
        w = h % (1 << wbits)
        rho = wbits + 1 if w == 0 else wbits - w.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_state_vs_python_and_duplicates(spark):
    ids = [i * 7 + 3 for i in range(400)]
    df = spark.createDataFrame([(i, "a") for i in ids]
                               + [(i, "a") for i in ids[:100]],  # dups
                               "doc_id long, source string")
    got = {r.register: r.rho
           for r in SK.hll_state(df, "doc_id", "source", p=9).collect()}
    assert got == py_state(ids)


def test_estimate_accuracy_and_merge(spark):
    # large regime: 30k distincts, m=512 -> rse ~4.6%; allow 3 sigma
    ids = list(range(1, 30001))
    est = SK.estimate(list(py_state(ids).items()), p=9)
    assert abs(est - 30000) / 30000 < 0.15, est
    # small regime (linear counting): 300 distincts within 10%
    est2 = SK.estimate(list(py_state(ids[:300]).items()), p=9)
    assert abs(est2 - 300) / 300 < 0.10, est2
    # merge = elementwise MAX: state(A u B) == max-merge(state A, state B)
    a, b = ids[:17000], ids[12000:]
    sa, sb = py_state(a), py_state(b)
    merged = dict(sa)
    for k, v in sb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == py_state(ids)


def test_avalanche_across_id_shapes():
    # the docstring claim: the fmix32 finalizer holds HLL error on
    # sequential, strided and random-ish id sets alike (an affine mix
    # fails the sequential case by 20-60%). m=512 -> rse ~4.6%.
    shapes = {
        "sequential": list(range(1, 20001)),
        "strided": [i * 7919 for i in range(1, 20001)],
        "randomish": [(i * 1000003 + 17) % (1 << 40)
                      for i in range(1, 20001)],
    }
    for name, ids in shapes.items():
        est = SK.estimate(list(py_state(ids).items()), p=9)
        assert abs(est - 20000) / 20000 < 0.15, (name, est)


CORPUS = (["the"] * 40 + ["cat"] * 12 + ["sat"] * 12 + ["on"] * 6
          + [f"w{i}" for i in range(120)])  # zipf-ish head + long tail


def py_cm(tokens, d=4, w=64):
    st = {}
    for tok in tokens:
        th = char_hash(tok)
        for j in range(d):
            b = SK._py_hash31(th + j * SK.CM_SEED) % w
            st[(j, b)] = st.get((j, b), 0) + 1
    return st


def test_cm_state_vs_python(spark):
    # two groups, empty tokens (double space) dropped, empty doc ok
    df = spark.createDataFrame(
        [(" ".join(CORPUS[:90]), "a"), (" ".join(CORPUS[90:]) + "  x", "a"),
         ("the quick  brown fox", "b"), ("", "b")],
        "text string, source string")
    got = {}
    for r in SK.cm_state(df, "text", "source", d=4, w=64).collect():
        got.setdefault(r.g, {})[(r.hrow, r.bucket)] = r.cnt
    toks_a = CORPUS + ["x"]
    toks_b = ["the", "quick", "brown", "fox"]
    assert got["a"] == py_cm(toks_a)
    assert got["b"] == py_cm(toks_b)


def test_cm_guarantees():
    # never underestimates; heavy hitters estimate within e*N/w
    st = py_cm(CORPUS, d=4, w=64)
    rows = [(j, b, c) for (j, b), c in st.items()]
    n = len(CORPUS)
    import collections
    true = collections.Counter(CORPUS)
    for tok, t in true.items():
        est = SK.cm_estimate(rows, char_hash(tok), d=4, w=64)
        assert est >= t, (tok, est, t)
        assert est <= t + 2.72 * n / 64 + 1, (tok, est, t)
    # top-1 heavy hitter recovered exactly by estimate ranking
    ranked = max(true, key=lambda tk: SK.cm_estimate(
        rows, char_hash(tk), d=4, w=64))
    assert ranked == "the"


def test_bloom_state_and_membership(spark):
    ids = [i * 13 + 5 for i in range(200)]
    df = spark.createDataFrame([(i, "a") for i in ids],
                               "doc_id long, source string")
    bits = {r.bit for r in
            SK.bloom_state(df, "doc_id", "source", m=4096, k=3).collect()}
    exp = {SK._py_hash31(i + j * SK.CM_SEED) % 4096
           for i in ids for j in range(3)}
    assert bits == exp
    # no false negatives
    member = lambda x: all(  # noqa: E731
        SK._py_hash31(x + j * SK.CM_SEED) % 4096 in bits for j in range(3))
    assert all(member(i) for i in ids)
    # false-positive rate near (1 - e^{-kn/m})^k ~ 0.25% for n=200
    fp = sum(member(x) for x in range(10 ** 6, 10 ** 6 + 4000)) / 4000
    assert fp < 0.02, fp


def test_fail_loud(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="p must"):
        SK.hll_state(df, "doc_id", "source", p=3)
    with pytest.raises(ValueError, match="need d"):
        SK.cm_state(df.withColumnRenamed("doc_id", "t"), "t", "source", d=0)
    with pytest.raises(ValueError, match="need m"):
        SK.bloom_state(df, "doc_id", "source", m=1)
