"""HLL sketches: state vs python replay, estimation accuracy on both
linear-counting and HLL regimes, MAX-merge property, duplicates don't
move the state, fail-louds."""
import pytest

from geotrellis_contrib_spark.operators import sketch as SK

M31 = 2147483648


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


def test_fail_loud(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="p must"):
        SK.hll_state(df, "doc_id", "source", p=3)
