"""Segment-intersection join: hand-checked rational point, exclusion
of touches/collinear overlaps, free-dedupe uniqueness across shared
cells, exact on-both-segments property, fail-louds."""
import pytest

from geotrellis_contrib_spark.operators import spatial_join as sj

SCHEMA = "seg_id long, x1 long, y1 long, x2 long, y2 long"


def _run(spark, a_rows, b_rows, **kw):
    a = spark.createDataFrame(a_rows, SCHEMA)
    b = spark.createDataFrame(b_rows, SCHEMA)
    return sj.segment_intersection_join(a, b, **kw).collect()


def test_hand_checked_cross(spark):
    out = _run(spark, [(1, 0, 0, 4, 4)], [(2, 0, 4, 4, 0)])
    assert len(out) == 1
    r = out[0]
    assert (r.a_id, r.b_id) == (1, 2)
    assert (r.num_x, r.num_y, r.den) == (64, 64, 32)  # (2, 2)
    assert r.den > 0


def test_touch_and_collinear_excluded(spark):
    # endpoint touch at (4,4); collinear overlap; disjoint parallels
    out = _run(spark, [(1, 0, 0, 4, 4)],
               [(2, 4, 4, 8, 0),      # touches a's endpoint
                (3, 2, 2, 6, 6),      # collinear overlap
                (4, 0, 1, 4, 5)])     # parallel
    assert out == []


def test_multi_cell_pair_emitted_once(spark):
    # both segments span many cells (long diagonals) and share several
    # cover cells — the canonical-cell rule must emit the pair ONCE
    out = _run(spark, [(1, 0, 0, 120, 120)], [(2, 0, 120, 120, 0)])
    assert len(out) == 1
    assert (out[0].num_x / out[0].den, out[0].num_y / out[0].den) \
        == (60.0, 60.0)


def test_point_lies_on_both_segments_property(spark):
    # the fixture family from the driver gate, checked as big-int
    # rational identities: crossing point collinear with and inside
    # BOTH segments
    a_rows = [(m, m % 89, (m * 7) % 97, (m % 89) + 1 + m % 11,
               (m * 7) % 97 - 13 + (m * 3) % 27)
              for m in range(0, 600, 2)]
    b_rows = [(m, m % 89, (m * 7) % 97, (m % 89) + 1 + m % 11,
               (m * 7) % 97 - 13 + (m * 3) % 27)
              for m in range(1, 600, 2)]
    segs = {r[0]: r for r in a_rows + b_rows}
    out = _run(spark, a_rows, b_rows)
    assert len(out) > 50
    seen = set()
    for r in out:
        assert (r.a_id, r.b_id) not in seen
        seen.add((r.a_id, r.b_id))
        for sid in (r.a_id, r.b_id):
            _, x1, y1, x2, y2 = segs[sid]
            # collinear: (P - p1) x (p2 - p1) == 0 with P = num/den
            assert ((r.num_x - x1 * r.den) * (y2 - y1)
                    == (r.num_y - y1 * r.den) * (x2 - x1))
            # strictly inside the bbox span along x OR y
            assert (min(x1, x2) * r.den <= r.num_x <= max(x1, x2) * r.den)
            assert (min(y1, y2) * r.den <= r.num_y <= max(y1, y2) * r.den)


def test_fail_louds(spark):
    with pytest.raises(Exception, match="envelope|degenerate"):
        _run(spark, [(1, 0, 0, 1 << 15, 4)], [(2, 0, 4, 4, 0)])
    with pytest.raises(Exception, match="degenerate"):
        _run(spark, [(1, 3, 3, 3, 3)], [(2, 0, 4, 4, 0)])


def test_box_overlay_known_cases(spark):
    sch = "poly_id string, xmin double, ymin double, xmax double, ymax double"
    boxes = spark.createDataFrame([
        ("a", 0.0, 0.0, 10.0, 10.0),
        ("b", 5.0, 5.0, 15.0, 15.0),    # proper overlap with a
        ("c", 10.0, 0.0, 20.0, 10.0),   # touches a's edge -> excluded
        ("d", 40.0, 40.0, 41.0, 41.0),  # disjoint
        ("e", 2.0, 2.0, 3.0, 3.0),      # fully inside a
    ], sch)
    out = {(r.a_id, r.b_id): r
           for r in sj.box_overlap_join(boxes, boxes).collect()}
    assert set(out) == {("a", "b"), ("a", "e"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab.ixmin, ab.iymin, ab.ixmax, ab.iymax, ab.area) \
        == (5.0, 5.0, 10.0, 10.0, 25.0)
    ae = out[("a", "e")]
    assert ae.area == 1.0                        # containment case
    bc = out[("b", "c")]                          # partial side overlap
    assert (bc.ixmin, bc.ixmax) == (10.0, 15.0)
    assert bc.area == 5.0 * 5.0


def test_box_overlay_multicell_once(spark):
    # boxes spanning MANY zoom-6 cells still emit each pair once
    sch = "poly_id string, xmin double, ymin double, xmax double, ymax double"
    boxes = spark.createDataFrame([
        ("p", -30.0, -30.0, 30.0, 30.0),
        ("q", -20.0, -20.0, 40.0, 40.0),
    ], sch)
    out = sj.box_overlap_join(boxes, boxes).collect()
    assert len(out) == 1
    assert out[0].area == 50.0 * 50.0
