"""Funnel + cohort retention: hand-built event streams covering the
ordered-semantics trap (purchase BEFORE click must not count), stalled
stages, cohort week bucketing, and distinct-user counting."""
import datetime as dt

from geotrellis_contrib_spark.operators.events import (
    cohort_retention, funnel)

SCHEMA = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double, props string")


def _ev(i, day, hour, uid, typ):
    return (i, dt.datetime(2024, 1, day, hour, 0, 0), uid, typ, 0.0, "")


def test_funnel_ordered_semantics(spark):
    rows = [
        # user 1: full ordered funnel
        _ev(0, 1, 1, 1, "view"), _ev(1, 1, 2, 1, "click"),
        _ev(2, 1, 3, 1, "purchase"),
        # user 2: purchase BEFORE click -> stage 2, t3 NULL
        _ev(3, 1, 1, 2, "view"), _ev(4, 1, 3, 2, "click"),
        _ev(5, 1, 2, 2, "purchase"),
        # user 3: click before any view -> stage 1 (click not counted)
        _ev(6, 1, 1, 3, "click"), _ev(7, 1, 2, 3, "view"),
        # user 4: no view at all -> stage 0
        _ev(8, 1, 1, 4, "error"),
        # user 5: second click after purchase-able order: view, click,
        # early purchase, then a LATER purchase counts
        _ev(9, 1, 1, 5, "view"), _ev(10, 1, 4, 5, "click"),
        _ev(11, 1, 2, 5, "purchase"), _ev(12, 1, 6, 5, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user_id: (r.stage, r.t1 is not None, r.t2 is not None,
                       r.t3 is not None) for r in funnel(df).collect()}
    assert got[1] == (3, True, True, True)
    assert got[2] == (2, True, True, False)
    assert got[3] == (1, True, False, False)
    assert got[4] == (0, False, False, False)
    assert got[5] == (3, True, True, True)
    t = {r.user_id: r for r in funnel(df).collect()}
    # user 5's t3 is the LATER purchase (day 1, 6:00)
    assert t[5].t3 == int(dt.datetime(2024, 1, 1, 6)
                          .replace(tzinfo=dt.timezone.utc).timestamp()
                          * 1_000_000)


def test_cohort_retention_hand_triangle(spark):
    # weeks: 2024-01-01 is a Monday; epoch day 19723 -> week 2817
    # user 1 signs up week W, active weeks W and W+1
    # user 2 signs up week W, active week W+1 only
    # user 3 signs up week W+1, active week W+1 (offset 0)
    rows = [
        _ev(0, 1, 1, 1, "signup"), _ev(1, 2, 1, 1, "view"),
        _ev(2, 9, 1, 1, "click"),
        _ev(3, 3, 1, 2, "signup"), _ev(4, 10, 1, 2, "view"),
        # activity BEFORE signup week must not appear (offset >= 0)
        _ev(5, 1, 1, 3, "view"),
        _ev(6, 8, 1, 3, "signup"), _ev(7, 9, 1, 3, "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r.cohort_week, r.week_offset): (r.active_users,
                                            r.cohort_users)
           for r in cohort_retention(df).collect()}
    w = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days // 7
    assert got[(w, 0)] == (1, 2)       # only user 1 active in week W
    assert got[(w, 1)] == (2, 2)       # both users active W+1
    assert got[(w + 1, 0)] == (1, 1)   # user 3
    assert set(got) == {(w, 0), (w, 1), (w + 1, 0)}


def test_triangle_count_hand_graph(spark):
    from geotrellis_contrib_spark.operators.cluster import triangle_count
    # K4 on {0,1,2,3} (4 triangles, each node in 3) + pendant 4 + an
    # isolated edge 5-6; duplicate + reversed edges must not matter
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (5, 6), (1, 0), (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0, 5: 0, 6: 0}


def test_events_rollup_levels(spark):
    from geotrellis_contrib_spark.operators.events import events_rollup
    rows = [_ev(0, 1, 1, 1, "view"), _ev(1, 1, 2, 1, "view"),
            _ev(2, 9, 1, 1, "click")]
    rows = [(i, ts, u, t, 2.5, p) for i, ts, u, t, _, p in rows]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r.event_type, r.week, r.gid): (r.n, r.v_sum)
           for r in events_rollup(df).collect()}
    w = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days // 7
    vq = 250  # floor(2.5*100+0.5)
    assert got[("view", w, 0)] == (2, 2 * vq)
    assert got[("click", w + 1, 0)] == (1, vq)
    assert got[("view", None, 1)] == (2, 2 * vq)     # per-type subtotal
    assert got[("click", None, 1)] == (1, vq)
    assert got[(None, None, 3)] == (3, 3 * vq)       # grand total
    assert len(got) == 5


def test_events_pivot_zeros_and_counts(spark):
    from geotrellis_contrib_spark.operators.events import events_pivot
    rows = [_ev(0, 1, 1, 1, "view"), _ev(1, 1, 2, 1, "view"),
            _ev(2, 1, 3, 1, "purchase"), _ev(3, 1, 1, 2, "error")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user_id: (r.view, r.click, r.purchase, r.signup, r.error)
           for r in events_pivot(df).collect()}
    assert got[1] == (2, 0, 1, 0, 0)
    assert got[2] == (0, 0, 0, 0, 1)


def test_gini_known_distributions(spark):
    from geotrellis_contrib_spark.operators.retrieval import gini_by_group
    # group a: all equal -> G = 0 exactly by the identity
    # group b: one doc holds everything -> G = (n-1)/n = 3/4
    docs = [("a", i, 10) for i in range(5)] \
        + [("b", 10, 0), ("b", 11, 0), ("b", 12, 0), ("b", 13, 100)]
    df = spark.createDataFrame(docs, "source string, doc_id long, "
                                     "n_chars long")
    got = {r.source: (r.n_docs, r.x_sum, r.gini_q)
           for r in gini_by_group(df).collect()}
    assert got["a"] == (5, 50, 0)
    assert got["b"] == (4, 100, int(0.75 * 1048576.0 + 0.5))


def test_twap_hand_weights(spark):
    from geotrellis_contrib_spark.operators.events import twap
    # user 1: value 10 held for 3h, then 20 for 1h -> twap = 12.5
    rows = [(0, dt.datetime(2024, 1, 1, 0), 1, "view", 10.0, ""),
            (1, dt.datetime(2024, 1, 1, 3), 1, "view", 20.0, ""),
            (2, dt.datetime(2024, 1, 1, 4), 1, "view", 99.0, ""),
            # user 2: single event -> excluded
            (3, dt.datetime(2024, 1, 1, 0), 2, "view", 5.0, ""),
            # user 3: two events at the SAME instant -> zero span,
            # excluded (not a division by zero)
            (4, dt.datetime(2024, 1, 1, 0), 3, "view", 5.0, ""),
            (5, dt.datetime(2024, 1, 1, 0), 3, "view", 7.0, "")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user_id: (r.n_events, r.twap_q) for r in twap(df).collect()}
    # num = 1000*(3h) + 2000*(1h); span 4h -> 1250
    assert got == {1: (3, 1250)}


def test_transitions_hand_counts(spark):
    from geotrellis_contrib_spark.operators.events import transitions
    # user 1: view -> click -> view; user 2: view -> click
    rows = [_ev(0, 1, 1, 1, "view"), _ev(1, 1, 2, 1, "click"),
            _ev(2, 1, 3, 1, "view"),
            _ev(3, 1, 1, 2, "view"), _ev(4, 1, 2, 2, "click")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r.prev_type, r.next_type): (r.n, r.row_total, r.p_q)
           for r in transitions(df).collect()}
    q = 1048576.0
    assert got[("view", "click")] == (2, 2, int(q))
    assert got[("click", "view")] == (1, 1, int(q))
    assert set(got) == {("view", "click"), ("click", "view")}
    # cross-user boundary must NOT create a click->view transition
    # from user 1's last event to user 2's first (partitioned window)


def test_gini_zero_mass_group_guarded(spark):
    from geotrellis_contrib_spark.operators.retrieval import gini_by_group
    docs = [("z", 1, 0), ("z", 2, 0), ("a", 3, 5)]
    df = spark.createDataFrame(docs, "source string, doc_id long, "
                                     "n_chars long")
    got = {r.source: r.gini_q for r in gini_by_group(df).collect()}
    assert got == {"z": 0, "a": 0}
