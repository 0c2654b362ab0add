"""Convex hull: monotone chain vs an independent O(n^4) Caratheodory
brute force (the SAME membership logic the SQL oracle runs), two-level
distributed merge ≡ single-level, ring-order/area invariants, degenerate
groups (collinear, duplicates, singleton)."""
import numpy as np
import pytest

from geotrellis_contrib_spark.operators import hull as H


def brute_vertices(pts: np.ndarray) -> set[tuple[int, int]]:
    """p is a hull vertex iff p not in conv(others): by Caratheodory in
    2D, iff p lies on no segment between two others and inside/on no
    nondegenerate triangle of others."""
    pts = np.unique(pts, axis=0)
    out = set()
    n = len(pts)

    def cross(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    for pi in range(n):
        p = pts[pi]
        others = [pts[i] for i in range(n) if i != pi]
        inside = False
        for qi in range(len(others)):
            for ri in range(len(others)):
                if ri == qi:
                    continue
                q, r = others[qi], others[ri]
                if cross(q, r, p) == 0 and \
                        np.dot(p - q, r - p) >= 0:
                    inside = True
        for qi in range(len(others)):
            for ri in range(qi + 1, len(others)):
                for si in range(ri + 1, len(others)):
                    q, r, s = others[qi], others[ri], others[si]
                    t = cross(q, r, s)
                    if t == 0:
                        continue
                    c1, c2, c3 = cross(q, r, p), cross(r, s, p), \
                        cross(s, q, p)
                    if (t > 0 and c1 >= 0 and c2 >= 0 and c3 >= 0) or \
                       (t < 0 and c1 <= 0 and c2 <= 0 and c3 <= 0):
                        inside = True
        if not inside:
            out.add((int(p[0]), int(p[1])))
    return out


def brute_area2(verts: set[tuple[int, int]]) -> int:
    """Order-free shoelace: sum qx*ry - rx*qy over CCW hull edges —
    directed pairs with every other vertex strictly left."""
    vs = sorted(verts)
    tot = 0
    for q in vs:
        for r in vs:
            if q == r:
                continue
            if all((r[0] - q[0]) * (s[1] - q[1])
                   - (r[1] - q[1]) * (s[0] - q[0]) > 0
                   for s in vs if s != q and s != r):
                tot += q[0] * r[1] - r[0] * q[1]
    return tot


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g long, x long, y long") \
        .repartition(5)


def _rows(spark, df):
    return sorted(map(tuple, df.collect()))


def test_hull_vs_brute_and_two_level(spark):
    # deterministic scatter, 3 groups x ~14 points
    rows = []
    for g in range(3):
        for i in range(14):
            rows.append((g, (i * 37 + g * 11) % 23 - 11,
                         (i * 53 + g * 7) % 19 - 9))
    df = _mk(spark, rows)
    one = H.convex_hull(df, two_level=False)
    two = H.convex_hull(df, two_level=True)
    assert _rows(spark, one) == _rows(spark, two)
    got = {}
    for r in one.collect():
        got.setdefault(r.g, []).append(r)
    for g in range(3):
        pts = np.array([(x, y) for gg, x, y in rows if gg == g],
                       dtype=np.int64)
        want = brute_vertices(pts)
        ring = sorted(got[g], key=lambda r: r.seq)
        assert {(r.x, r.y) for r in ring} == want
        # starts at the lexicographically smallest vertex
        assert (ring[0].x, ring[0].y) == min(want)
        # every consecutive triple turns strictly left (CCW, no
        # collinear), and the closed shoelace matches the order-free
        # edge-set sum the SQL oracle uses
        k = len(ring)
        assert k >= 3
        for i in range(k):
            a, b, c = ring[i], ring[(i + 1) % k], ring[(i + 2) % k]
            assert (b.x - a.x) * (c.y - a.y) \
                - (b.y - a.y) * (c.x - a.x) > 0
        area2 = sum(ring[i].x * ring[(i + 1) % k].y
                    - ring[(i + 1) % k].x * ring[i].y for i in range(k))
        assert area2 > 0
        assert ring[0].area2 == area2 == brute_area2(want)


def test_hull_degenerate(spark):
    rows = (
        # g0: all collinear -> the two extreme endpoints, area2 0
        [(0, i, 2 * i) for i in range(6)]
        # g1: a square plus edge midpoints + duplicates + interior
        + [(1, 0, 0), (1, 4, 0), (1, 4, 4), (1, 0, 4), (1, 2, 0),
           (1, 4, 2), (1, 2, 4), (1, 0, 2), (1, 1, 1), (1, 0, 0)]
        # g2: a single point
        + [(2, 7, -3)])
    out = {}
    for r in H.convex_hull(_mk(spark, rows), two_level=True).collect():
        out.setdefault(r.g, []).append(r)
    g0 = sorted(out[0], key=lambda r: r.seq)
    assert [(r.x, r.y) for r in g0] == [(0, 0), (5, 10)]
    assert all(r.area2 == 0 for r in g0)
    g1 = sorted(out[1], key=lambda r: r.seq)
    assert [(r.x, r.y) for r in g1] == [(0, 0), (4, 0), (4, 4), (0, 4)]
    assert g1[0].area2 == 32
    assert [(r.x, r.y, r.area2) for r in out[2]] == [(7, -3, 0)]


def test_hull_matches_brute_property(spark):
    # a denser single group exercising many pop paths
    rows = [(0, (i * i * 7 + 3) % 29 - 14, (i * i * i + 5 * i) % 31 - 15)
            for i in range(40)]
    df = _mk(spark, rows)
    ring = sorted(H.convex_hull(df, two_level=True).collect(),
                  key=lambda r: r.seq)
    pts = np.array([(x, y) for _, x, y in rows], dtype=np.int64)
    assert {(r.x, r.y) for r in ring} == brute_vertices(pts)


def test_hull_diameter_square_tie_and_interior(spark):
    from geotrellis_contrib_spark.operators.hull import hull_diameter
    # unit square scaled: both diagonals tie at d2=200; canonical pick
    # is the lexicographically smallest pair (0,0)-(10,10); interior
    # points must not affect anything
    pts = [(0, 0, 0), (0, 10, 0), (0, 0, 10), (0, 10, 10),
           (0, 5, 5), (0, 3, 7)]
    df = spark.createDataFrame(pts, "g long, x long, y long")
    r = hull_diameter(df).collect()[0]
    assert (r.n_hull, r.diam2) == (4, 200)
    assert (r.ax, r.ay, r.bx, r.b_y) == (0, 0, 10, 10)


def test_hull_diameter_equals_bruteforce_all_points(spark):
    from geotrellis_contrib_spark.operators.hull import hull_diameter
    pts = [(int(k % 3), int((k * 37) % 101) - 50,
            int((k * 61) % 97) - 48) for k in range(120)]
    df = spark.createDataFrame(pts, "g long, x long, y long")
    got = {r.g: r.diam2 for r in hull_diameter(df).collect()}
    for g in range(3):
        ps = [(x, y) for gg, x, y in pts if gg == g]
        brute = max((bx - ax) ** 2 + (by - ay) ** 2
                    for ax, ay in ps for bx, by in ps)
        assert got[g] == brute
