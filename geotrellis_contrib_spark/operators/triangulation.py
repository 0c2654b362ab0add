"""Per-group Delaunay triangulation (TIN construction) — the
GeoTrellis-core vector-triangulation family the contrib tier feeds
(`geotrellis.vector.triangulation.DelaunayTriangulation`, consumed by
TIN rasterization and the euclidean-distance tier; the contrib repo
reaches it through the same core dependency as the focal family).

Spark-first shape: the triangulation UNIT is the group (a scene, an
AOI, a tile neighborhood — matching GeoTrellis's per-collection
`DelaunayTriangulation.apply`); groups solve in parallel as ONE
`applyInPandas` task each, so the distributed axis is #groups, the
same grain GeoTrellis's StitchedDelaunay distributes over. Points
shuffle once on the group key; triangles come back O(2n) per group.

Exactness discipline: callers pass integer-quantized coordinates and
the solver is Bowyer-Watson over **python big-int arithmetic** — the
incircle determinant of milli-degree coordinates reaches ~10^23,
far past int64 AND past float64's 2^53 mantissa, so neither numpy
int64 nor doubles can decide it; arbitrary-precision ints make every
orientation/incircle test exact (the oracle's twin runs the same
determinants in DuckDB HUGEINT). The super-triangle sits at ±2^100:
any integer triple's circumradius is bounded by ~2.9·span^3 ≤ 2^63
for span ≤ 2^21, so the super vertices provably lie outside every
real circumcircle and cannot distort the interior triangulation.

Degeneracy posture: duplicate points dedupe; exactly-collinear
triples never form triangles; exactly-cocircular quadruples make the
Delaunay triangulation NON-unique — this solver picks a valid one
(insertion order resolves ties), and the oracle gate therefore
compares triangulation-INVARIANT quantities that every valid full
triangulation of the point set shares exactly:

    n_triangles = 2n - b - 2      (Euler, b = hull-boundary points)
    n_edges     = 3n - b - 3
    area2_sum   = hull shoelace   (triangles partition the hull)

while the Delaunay empty-circumcircle property itself is pinned by
pytest against a brute-force big-int check (including near-collinear
and exactly-cocircular fixtures).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRI_SCHEMA = ("g bigint, ax bigint, ay bigint, bx bigint, by bigint, "
               "cx bigint, cy bigint, area2 bigint")

_SUPER = 1 << 100


def _orient(a, b, c) -> int:
    """2×signed area of (a,b,c); >0 = CCW. Exact (python ints)."""
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _incircle(a, b, c, p) -> int:
    """>0 iff p is strictly inside the circumcircle of CCW (a,b,c).
    Exact (python ints)."""
    adx, ady = a[0] - p[0], a[1] - p[1]
    bdx, bdy = b[0] - p[0], b[1] - p[1]
    cdx, cdy = c[0] - p[0], c[1] - p[1]
    return ((adx * adx + ady * ady) * (bdx * cdy - bdy * cdx)
            - (bdx * bdx + bdy * bdy) * (adx * cdy - ady * cdx)
            + (cdx * cdx + cdy * cdy) * (adx * bdy - ady * bdx))


def delaunay_triangles(pts: list[tuple[int, int]]) -> list[tuple[int, int, int]]:
    """Bowyer-Watson over deduped integer points; returns index triples
    (CCW) into ``pts``. Empty for n < 3 or all-collinear input."""
    n = len(pts)
    if n < 3:
        return []
    verts = list(pts) + [(-_SUPER, -_SUPER), (_SUPER, -_SUPER), (0, _SUPER)]
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    for pi in range(n):
        p = verts[pi]
        bad = [t for t in tris
               if _incircle(verts[t[0]], verts[t[1]], verts[t[2]], p) > 0]
        if not bad:
            # possible only if p duplicates a vertex (callers dedupe)
            raise ValueError("point in no circumcircle — undeduped input?")
        edge_count: dict[tuple[int, int], int] = {}
        edge_dir: dict[tuple[int, int], tuple[int, int]] = {}
        for t in bad:
            for u, v in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (u, v) if u < v else (v, u)
                edge_count[k] = edge_count.get(k, 0) + 1
                edge_dir[k] = (u, v)
        tris = [t for t in tris if t not in bad]
        for k, cnt in edge_count.items():
            if cnt != 1:
                continue  # interior cavity edge
            u, v = edge_dir[k]  # keeps the bad triangle's winding → CCW fan
            if _orient(verts[u], verts[v], p) <= 0:
                raise ValueError("degenerate cavity fan — non-star cavity")
            tris.append((u, v, pi))
    return [t for t in tris if max(t) < n]


def _canon(tri: np.ndarray) -> np.ndarray:
    """Rotate each CCW triangle so the lexicographically smallest
    (x, y) vertex leads — a deterministic row identity."""
    out = np.empty_like(tri)
    for i, row in enumerate(tri):
        v = row.reshape(3, 2)
        k = min(range(3), key=lambda j: (v[j, 0], v[j, 1]))
        out[i] = np.roll(v, -k, axis=0).reshape(6)
    return out


def delaunay(pts: DataFrame, group_col: str = "g", x_col: str = "x",
             y_col: str = "y") -> DataFrame:
    """Per-group Delaunay TIN over integer points → one row per CCW
    triangle (g, ax..cy, area2) with area2 its exact 2×area. Groups
    with < 3 non-collinear points yield no rows."""
    base = pts.select(F.col(group_col).cast("long").alias("g"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"))

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        xy = np.unique(pdf[["x", "y"]].to_numpy(dtype=np.int64), axis=0)
        plist = [(int(x), int(y)) for x, y in xy]
        idx = delaunay_triangles(plist)
        if not idx:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in ("g", "ax", "ay", "bx", "by",
                                           "cx", "cy", "area2")})
        rows = np.array([[*plist[a], *plist[b], *plist[c]]
                         for a, b, c in idx], dtype=np.int64)
        rows = _canon(rows)
        area2 = [
            _orient((int(r[0]), int(r[1])), (int(r[2]), int(r[3])),
                    (int(r[4]), int(r[5]))) for r in rows]
        return pd.DataFrame({
            "g": np.full(len(rows), int(key[0]), dtype=np.int64),
            "ax": rows[:, 0], "ay": rows[:, 1], "bx": rows[:, 2],
            "by": rows[:, 3], "cx": rows[:, 4], "cy": rows[:, 5],
            "area2": np.asarray(area2, dtype=np.int64)})

    return base.groupBy("g").applyInPandas(solve, _TRI_SCHEMA)


def tin_interpolate(pts: DataFrame, x0: int, nx: int, dx: int,
                    y0: int, ny: int, dy: int, group_col: str = "g",
                    x_col: str = "x", y_col: str = "y",
                    z_col: str = "z") -> DataFrame:
    """TIN linear rasterization (DelaunayRasterizer analog,
    geotrellis.raster.triangulation): sample the per-group TIN surface
    at the integer lattice {x0 + i·dx} × {y0 + j·dy}, i < nx, j < ny.
    Value at P inside CCW triangle (a,b,c) is the barycentric plane

        (wa·za + wb·zb + wc·zc) / area2,   wa = orient(b, c, P) …

    — an exact-int64 numerator and denominator with ONE IEEE division,
    so the result is the correctly-rounded exact rational: points on a
    shared edge get BIT-identical values from either triangle (both
    divisions round the same real), which is what lets engine-side
    first-triangle-wins and oracle-side DISTINCT agree with no
    tie-break rule. Lattice points outside the hull emit nothing.
    Duplicate (x, y) inputs must carry equal z (fail-loud)."""
    base = pts.select(F.col(group_col).cast("long").alias("g"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"),
                      F.col(z_col).cast("long").alias("z"))
    out_schema = "g bigint, px bigint, py bigint, val double"

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        arr = pdf[["x", "y", "z"]].drop_duplicates().to_numpy(np.int64)
        if len(np.unique(arr[:, :2], axis=0)) != len(arr):
            raise ValueError("duplicate (x,y) with conflicting z")
        # int64 envelope: |w| < 2·span² < 2^41 and |w·z| < 2^61 when
        # every coordinate/z magnitude stays under 2^20
        hi = max(abs(int(arr.min())), abs(int(arr.max())),
                 abs(x0) + nx * abs(dx), abs(y0) + ny * abs(dy))
        if hi >= 1 << 20:
            raise ValueError(f"coordinate magnitude {hi} >= 2^20: "
                             "int64 barycentric envelope exceeded")
        plist = [(int(x), int(y)) for x, y, _ in arr]
        idx = delaunay_triangles(plist)
        gx = x0 + np.arange(nx, dtype=np.int64) * dx
        gy = y0 + np.arange(ny, dtype=np.int64) * dy
        px, py = [a.ravel() for a in np.meshgrid(gx, gy, indexing="ij")]
        val = np.full(len(px), np.nan)
        for a, b, c in idx:
            (axv, ayv), (bxv, byv), (cxv, cyv) = plist[a], plist[b], plist[c]
            za, zb, zc = (int(arr[a, 2]), int(arr[b, 2]), int(arr[c, 2]))
            wa = (cxv - bxv) * (py - byv) - (cyv - byv) * (px - bxv)
            wb = (axv - cxv) * (py - cyv) - (ayv - cyv) * (px - cxv)
            wc = (bxv - axv) * (py - ayv) - (byv - ayv) * (px - axv)
            inside = (wa >= 0) & (wb >= 0) & (wc >= 0) & np.isnan(val)
            den = _orient((axv, ayv), (bxv, byv), (cxv, cyv))
            val[inside] = (wa[inside] * za + wb[inside] * zb
                           + wc[inside] * zc).astype(np.float64) / den
        keep = ~np.isnan(val)
        return pd.DataFrame({
            "g": np.full(int(keep.sum()), int(key[0]), dtype=np.int64),
            "px": px[keep], "py": py[keep], "val": val[keep]})

    return base.groupBy("g").applyInPandas(solve, out_schema)


def voronoi_vertices(tri: DataFrame) -> DataFrame:
    """Voronoi-diagram vertices (geotrellis.vector.voronoi
    .VoronoiDiagram analog) as EXACT rationals: the Voronoi vertex
    dual to each Delaunay triangle is its circumcenter

        ( (den·ax + ux) / den , (den·ay + uy) / den ),
        ux = (cy-ay)·|b-a|² − (by-ay)·|c-a|² … den = 2·area2

    emitted as the integer triple (cnum_x, cnum_y, den). With den
    PINNED to 2·area2 (vertex-rotation invariant for canonical CCW
    rows) the numerators are uniquely determined — cnum = cc·den is
    an integer identity — so the representation is independent of
    which vertex anchors the formula and compares exactly with no
    gcd reduction. Pure JVM-side int64 Column arithmetic (no Python):
    |coords| < 2^15 keeps every product under 2^62."""
    bpx = F.col("bx") - F.col("ax")
    bpy = F.col("by") - F.col("ay")
    cpx = F.col("cx") - F.col("ax")
    cpy = F.col("cy") - F.col("ay")
    bb = bpx * bpx + bpy * bpy
    cc = cpx * cpx + cpy * cpy
    den = F.lit(2) * F.col("area2")
    return tri.select(
        "g",
        (den * F.col("ax") + (cpy * bb - bpy * cc)).alias("cnum_x"),
        (den * F.col("ay") + (bpx * cc - cpx * bb)).alias("cnum_y"),
        den.alias("den"))


def tin_summary(tri: DataFrame) -> DataFrame:
    """Triangulation-invariant per-group summary from the triangle
    table alone (all quantities any valid full triangulation shares):
    (g, n_points, n_boundary, n_triangles, n_edges, area2_sum).
    Boundary = endpoints of edges incident to exactly one triangle.
    Pure DataFrame aggs — one explode + two small shuffles on g."""
    edges = tri.select("g", F.explode(F.array(
        F.struct(F.least("ax", "bx").alias("x1"),
                 F.when(F.col("ax") < F.col("bx"), F.col("ay"))
                  .when(F.col("ax") > F.col("bx"), F.col("by"))
                  .otherwise(F.least("ay", "by")).alias("y1"),
                 F.greatest("ax", "bx").alias("x2"),
                 F.when(F.col("ax") < F.col("bx"), F.col("by"))
                  .when(F.col("ax") > F.col("bx"), F.col("ay"))
                  .otherwise(F.greatest("ay", "by")).alias("y2")),
        F.struct(F.least("bx", "cx").alias("x1"),
                 F.when(F.col("bx") < F.col("cx"), F.col("by"))
                  .when(F.col("bx") > F.col("cx"), F.col("cy"))
                  .otherwise(F.least("by", "cy")).alias("y1"),
                 F.greatest("bx", "cx").alias("x2"),
                 F.when(F.col("bx") < F.col("cx"), F.col("cy"))
                  .when(F.col("bx") > F.col("cx"), F.col("by"))
                  .otherwise(F.greatest("by", "cy")).alias("y2")),
        F.struct(F.least("cx", "ax").alias("x1"),
                 F.when(F.col("cx") < F.col("ax"), F.col("cy"))
                  .when(F.col("cx") > F.col("ax"), F.col("ay"))
                  .otherwise(F.least("cy", "ay")).alias("y1"),
                 F.greatest("cx", "ax").alias("x2"),
                 F.when(F.col("cx") < F.col("ax"), F.col("ay"))
                  .when(F.col("cx") > F.col("ax"), F.col("cy"))
                  .otherwise(F.greatest("cy", "ay")).alias("y2")),
    )).alias("e")).select("g", "e.x1", "e.y1", "e.x2", "e.y2")
    euse = (edges.groupBy("g", "x1", "y1", "x2", "y2")
            .agg(F.count("*").alias("uses")))
    n_edges = euse.groupBy("g").agg(
        F.count("*").alias("n_edges"))
    bpts = (euse.filter(F.col("uses") == 1)
            .select("g", F.explode(F.array(
                F.struct(F.col("x1").alias("x"), F.col("y1").alias("y")),
                F.struct(F.col("x2").alias("x"), F.col("y2").alias("y"))
            )).alias("p")).select("g", "p.x", "p.y").distinct()
            .groupBy("g").agg(F.count("*").alias("n_boundary")))
    vpts = (tri.select("g", F.explode(F.array(
                F.struct(F.col("ax").alias("x"), F.col("ay").alias("y")),
                F.struct(F.col("bx").alias("x"), F.col("by").alias("y")),
                F.struct(F.col("cx").alias("x"), F.col("cy").alias("y"))
            )).alias("p")).select("g", "p.x", "p.y").distinct()
            .groupBy("g").agg(F.count("*").alias("n_points")))
    tcounts = tri.groupBy("g").agg(
        F.count("*").alias("n_triangles"),
        F.sum("area2").alias("area2_sum"))
    return (tcounts.join(n_edges, "g").join(bpts, "g").join(vpts, "g")
            .select("g", "n_points", "n_boundary", "n_triangles",
                    "n_edges", "area2_sum"))
