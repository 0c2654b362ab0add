"""As-of join: hand-built fixtures covering <= semantics at equal t,
right-tie resolution, no-match NULLs, legitimately-NULL payload fields
(the struct trick), multi-key joins, and the one-shuffle plan shape."""
import pytest
from pyspark.sql import functions as F

from geotrellis_contrib_spark.operators import asof as AS


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_semantics(spark):
    left = _mk(spark, [
        (1, 10, 100), (2, 10, 205), (3, 10, 300),   # user 10
        (4, 20, 150),                               # user 20: no match
        (5, 30, 200),                               # user 30: equal-t
    ], "event_id long, user_id long, t long")
    right = _mk(spark, [
        (10, 100, 11, 1.5),    # t == left(1).t -> matches (<=)
        (10, 205, 12, 2.5),    # t == left(2).t
        (10, 204, 13, 3.5),
        (30, 200, 14, 4.5),    # two right rows at SAME (key, t):
        (30, 200, 15, 5.5),    # tie -> larger event_id (15) wins
        (40, 1, 16, 6.5),      # other key, never matches
    ], "user_id long, t long, event_id long, value double")
    out = AS.asof_join(left, right, on=["user_id"], t_col="t",
                       payload_cols=["event_id", "value"],
                       tie_col="event_id")
    # exactly ONE shuffle (the window's key exchange), no join node —
    # read the plan BEFORE executing (the finalized AQE plan string
    # nests the Exchange inside its ShuffleQueryStage, double-counting)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Join" not in plan
    got = {r.event_id: (r.m_event_id, r.m_value) for r in out.collect()}
    assert got == {
        1: (11, 1.5),       # equal t matches
        2: (12, 2.5),       # newest of {204, 205}
        3: (12, 2.5),       # 300 > both -> still newest
        4: (None, None),    # nothing precedes
        5: (15, 5.5),       # equal-t right tie -> largest id
    }


def test_asof_null_payload_field(spark):
    # a NULL payload FIELD must survive (the struct marks presence)
    left = _mk(spark, [(1, 7, 50)], "event_id long, user_id long, t long")
    right = _mk(spark, [(7, 10, 21, None), (7, 40, 22, 9.0)],
                "user_id long, t long, event_id long, value double")
    r = AS.asof_join(left, right, ["user_id"], "t",
                     ["event_id", "value"], "event_id").collect()[0]
    assert (r.m_event_id, r.m_value) == (22, 9.0)
    # now make the NEWEST row the NULL-valued one: it must still win
    # (a bare last(value, ignorenulls) would skip back to the 9.0 row)
    right2 = _mk(spark, [(7, 40, 22, 9.0), (7, 45, 23, None)],
                 "user_id long, t long, event_id long, value double")
    row = AS.asof_join(left, right2, ["user_id"], "t",
                       ["event_id", "value"], "event_id").collect()[0]
    assert (row.m_event_id, row.m_value) == (23, None)


def test_asof_multi_key_and_fail_louds(spark):
    left = _mk(spark, [(1, 1, 2, 100)],
               "event_id long, k1 long, k2 long, t long")
    right = _mk(spark, [(1, 2, 50, 5, 1.0), (1, 3, 60, 6, 2.0)],
                "k1 long, k2 long, t long, event_id long, value double")
    r = AS.asof_join(left, right, ["k1", "k2"], "t",
                     ["event_id"], "event_id").collect()[0]
    assert r.m_event_id == 5  # (1,3) row excluded by the second key
    with pytest.raises(ValueError, match="key"):
        AS.asof_join(left, right, [], "t", ["event_id"], "event_id")
    with pytest.raises(ValueError, match="lacks"):
        AS.asof_join(left, right, ["k1"], "t", ["nope"], "event_id")
