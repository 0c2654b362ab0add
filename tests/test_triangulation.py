"""Delaunay/TIN: empty-circumcircle property vs brute-force big-int
check (incl. near-collinear and exactly-cocircular fixtures), Euler
invariants, full-coverage area identity, summary aggregation on
Spark, degenerate inputs."""
import itertools

import pytest

from geotrellis_contrib_spark.operators import triangulation as TR


def brute_check(pts, tris):
    """Every triangle non-degenerate CCW with NO point strictly inside
    its circumcircle; triangles tile the hull (area + Euler)."""
    for a, b, c in tris:
        assert TR._orient(pts[a], pts[b], pts[c]) > 0
        for i, p in enumerate(pts):
            if i in (a, b, c):
                continue
            assert TR._incircle(pts[a], pts[b], pts[c], p) <= 0, \
                (pts[a], pts[b], pts[c], p)


def hull_quantities(pts):
    """(b, hull_area2) by brute force: b = points on the hull
    boundary; area2 via the strict-vertex ring."""
    def on_boundary(p):
        for q, r in itertools.combinations(pts, 2):
            if q == p or r == p:
                continue
            if TR._orient(q, r, p) == 0 and \
               (p[0]-q[0])*(r[0]-p[0]) + (p[1]-q[1])*(r[1]-p[1]) >= 0:
                # p on segment qr: boundary iff qr on the hull edge line
                if all(TR._orient(q, r, s) <= 0 for s in pts) or \
                   all(TR._orient(q, r, s) >= 0 for s in pts):
                    return True
        # strict vertex: some directed line through p has all others left
        for q in pts:
            if q == p:
                continue
            if all(TR._orient(p, q, s) <= 0 for s in pts) or \
               all(TR._orient(p, q, s) >= 0 for s in pts):
                return True
        return False

    b = sum(on_boundary(p) for p in pts)
    # hull area via monotone chain
    ps = sorted(set(pts))
    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and \
                    TR._orient(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out
    ring = half(ps)[:-1] + half(ps[::-1])[:-1]
    area2 = sum(ring[i][0] * ring[(i+1) % len(ring)][1]
                - ring[(i+1) % len(ring)][0] * ring[i][1]
                for i in range(len(ring))) if len(ring) >= 3 else 0
    return b, area2


FIXTURES = {
    "general": [(0, 0), (10, 1), (3, 9), (7, 6), (2, 4), (9, 9),
                (5, 2), (1, 8)],
    "cocircular_square": [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2),
                          (7, 1)],
    "near_collinear": [(0, 0), (1000000, 1), (2000000, 0), (5, 7),
                       (999999, 500000)],
    "collinear_on_hull_edge": [(0, 0), (4, 0), (8, 0), (4, 6), (2, 2)],
    "grid": [(x, y) for x in range(4) for y in range(4)],
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_delaunay_property_and_invariants(name):
    pts = FIXTURES[name]
    tris = TR.delaunay_triangles(pts)
    brute_check(pts, tris)
    n = len(set(pts))
    b, harea2 = hull_quantities(pts)
    assert len(tris) == 2 * n - b - 2, (name, len(tris), n, b)
    edges = {tuple(sorted((t[i], t[(i+1) % 3]))) for t in tris
             for i in range(3)}
    assert len(edges) == 3 * n - b - 3
    assert sum(TR._orient(pts[a], pts[b_], pts[c])
               for a, b_, c in tris) == harea2


def test_degenerate_inputs():
    assert TR.delaunay_triangles([]) == []
    assert TR.delaunay_triangles([(1, 2)]) == []
    assert TR.delaunay_triangles([(1, 2), (3, 4)]) == []
    assert TR.delaunay_triangles([(0, 0), (2, 2), (5, 5), (9, 9)]) == []


def test_tin_interpolate_plane_and_edges(spark):
    # points sampled from the exact plane z = 2x + 3y + 5: EVERY TIN
    # of them interpolates the plane exactly at integer lattice points
    # where 2px+3py+5 is exactly representable (it's an int).
    fix = FIXTURES["general"]
    rows = [(0, x * 10, y * 10, 2 * (x * 10) + 3 * (y * 10) + 5)
            for x, y in fix]
    df = spark.createDataFrame(rows, "g long, x long, y long, z long")
    got = TR.tin_interpolate(df, 0, 11, 10, 0, 11, 10).collect()
    assert len(got) > 20
    for r in got:
        assert r.val == 2 * r.px + 3 * r.py + 5, r
    # vertices themselves are lattice points here -> z reproduced
    lattice = {(r.px, r.py): r.val for r in got}
    for x, y in fix:
        assert lattice[(x * 10, y * 10)] == 2 * x * 10 + 3 * y * 10 + 5
    # outside-hull lattice corners absent: (100,0) right of all pts
    assert (100, 0) not in lattice


def test_tin_interpolate_fail_louds(spark):
    dup = spark.createDataFrame(
        [(0, 1, 1, 5), (0, 1, 1, 6), (0, 9, 2, 1), (0, 4, 8, 2)],
        "g long, x long, y long, z long")
    with pytest.raises(Exception, match="conflicting z"):
        TR.tin_interpolate(dup, 0, 4, 1, 0, 4, 1).collect()
    big = spark.createDataFrame(
        [(0, 1 << 21, 1, 5), (0, 9, 2, 1), (0, 4, 8, 2)],
        "g long, x long, y long, z long")
    with pytest.raises(Exception, match="envelope"):
        TR.tin_interpolate(big, 0, 4, 1, 0, 4, 1).collect()


def test_voronoi_vertices_exact(spark):
    # right triangle (0,0)(2,0)(0,2): circumcenter (1,1), den = 8
    df = spark.createDataFrame(
        [(0, 0, 0), (0, 2, 0), (0, 0, 2)], "g long, x long, y long")
    tri = TR.delaunay(df)
    vv = TR.voronoi_vertices(tri).collect()
    assert len(vv) == 1 and (vv[0].cnum_x, vv[0].cnum_y, vv[0].den) \
        == (8, 8, 8)
    # general fixture: every circumcenter exactly equidistant from its
    # triangle's three vertices (big-int rational identity)
    pts = FIXTURES["general"]
    df2 = spark.createDataFrame([(0, x, y) for x, y in pts],
                                "g long, x long, y long")
    tri_rows = TR.delaunay(df2).collect()
    vv2 = TR.voronoi_vertices(TR.delaunay(df2)).collect()
    assert len(vv2) == len(tri_rows)
    for t in tri_rows:
        den = 2 * t.area2
        bb = (t.bx - t.ax) ** 2 + (t.by - t.ay) ** 2
        cc = (t.cx - t.ax) ** 2 + (t.cy - t.ay) ** 2
        cx = den * t.ax + ((t.cy - t.ay) * bb - (t.by - t.ay) * cc)
        cy = den * t.ay + ((t.bx - t.ax) * cc - (t.cx - t.ax) * bb)
        d2 = [(cx - den * px) ** 2 + (cy - den * py) ** 2
              for px, py in ((t.ax, t.ay), (t.bx, t.by), (t.cx, t.cy))]
        assert d2[0] == d2[1] == d2[2]
        assert (0, cx, cy, den) in {(v.g, v.cnum_x, v.cnum_y, v.den)
                                    for v in vv2}


def test_spark_delaunay_and_summary(spark):
    rows = [(g, x, y) for g in (0, 1)
            for x, y in FIXTURES["general" if g == 0 else "grid"]]
    rows += [(0, 0, 0)]  # duplicate point dedupes
    df = spark.createDataFrame(rows, "g long, x long, y long")
    tri = TR.delaunay(df).collect()
    for g, fix in ((0, FIXTURES["general"]), (1, FIXTURES["grid"])):
        got = [t for t in tri if t.g == g]
        pts = sorted(set(fix))
        index = {p: i for i, p in enumerate(pts)}
        idx = [(index[(t.ax, t.ay)], index[(t.bx, t.by)],
                index[(t.cx, t.cy)]) for t in got]
        brute_check(pts, idx)
        n, (b, harea2) = len(pts), hull_quantities(pts)
        assert len(got) == 2 * n - b - 2
        assert all(t.area2 > 0 for t in got)
    summ = {r.g: r for r in
            TR.tin_summary(TR.delaunay(df)).collect()}
    for g, fix in ((0, FIXTURES["general"]), (1, FIXTURES["grid"])):
        pts = sorted(set(fix))
        n, (b, harea2) = len(pts), hull_quantities(pts)
        s = summ[g]
        assert (s.n_points, s.n_boundary, s.n_triangles, s.n_edges,
                s.area2_sum) == (n, b, 2*n - b - 2, 3*n - b - 3, harea2)
