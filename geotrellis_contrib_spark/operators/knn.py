"""kNN join: k nearest points per query, cell-ring expansion + exact re-rank.

Target operator from BASELINE.json north_star (the reference itself delegates
proximity queries to PostGIS; distance semantics oracle
/root/reference/slick/src/test/.../PostgisSpec.scala:174-188).

Plan (SURVEY.md §2.3):
  1. queries explode to their cell + ring-1..R neighbor cells at ``zoom``
     (JVM explode; no Python);
  2. equi-join candidates on (cell_col, cell_row) — shuffle hash / broadcast
     chosen by Catalyst; queries are usually the small side -> broadcast;
  3. exact distance + ``row_number() OVER (PARTITION BY query ORDER BY
     dist, id)`` re-rank, keep <= k. The id tie-break makes output
     deterministic under shuffle.

Exactness: results are exact iff the k-th neighbor lies within the ring's
guaranteed radius (ring R at zoom z covers Chebyshev distance >= R cells
~ R * 360/2^z * cos(lat) degrees). :func:`knn_join_exact` solves each
query's required ring in closed form from its ring-1 candidates and
re-joins only unresolved queries at their own ring — exact for any
distribution in TWO jobs, no driver loop. (A per-ring-doubling driver
loop variant existed through round 3; it serialized 3-5 full jobs through
``limit(1).count()`` actions and was retired once the one-plan rewrite
matched it bit-for-bit.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geotrellis_contrib_spark.functions import cells as C
from geotrellis_contrib_spark.functions import geometry as G
from geotrellis_contrib_spark.util import ensure_min_parallelism


def _ring_cells(queries: DataFrame, zoom: int, ring: int) -> DataFrame:
    """Explode queries to all cells with Chebyshev distance <= ring, packed
    into the single-long ``cell`` join key (LongHashedRelation fast path)."""
    n = 1 << zoom
    offs = list(range(-ring, ring + 1))
    q = queries.withColumn("_dc", F.explode(F.array(*[F.lit(i) for i in offs]))) \
               .withColumn("_dr", F.explode(F.array(*[F.lit(i) for i in offs])))
    return (q.withColumn("cell", C.cell_id(
                F.lit(zoom),
                F.pmod(F.col("q_cell_col") + F.col("_dc"), F.lit(n)),
                F.col("q_cell_row") + F.col("_dr")))
             .filter((F.col("q_cell_row") + F.col("_dr") >= 0)
                     & (F.col("q_cell_row") + F.col("_dr") < n))
             .drop("_dc", "_dr"))


def knn_join(queries: DataFrame, points: DataFrame, k: int, zoom: int,
             ring: int = 1,
             query_id="query_id", qlon="qlon", qlat="qlat",
             point_id="doc_id", lon="lon", lat="lat") -> DataFrame:
    """k nearest ``points`` per query row. Bounded-ring variant: exact when
    the k-th neighbor is within ``ring`` cells (caller picks zoom/ring from
    the known density floor; see module docstring).

    Output: (query_id, point_id, rank, dist) — rank 1..k by (dist, point_id).
    """
    if (1 << zoom) <= 2 * ring:
        raise ValueError(f"ring {ring} wraps the zoom-{zoom} grid onto "
                         f"itself (duplicate candidates); use a finer zoom")
    q = (queries.select(F.col(query_id).alias("query_id"),
                        F.col(qlon).alias("qlon"), F.col(qlat).alias("qlat"))
         .withColumn("q_cell_col", C.tile_col(F.col("qlon"), zoom))
         .withColumn("q_cell_row", C.tile_row(F.col("qlat"), zoom)))
    q = _ring_cells(q, zoom, ring).drop("q_cell_col", "q_cell_row")

    p = (points.filter(F.col(lon).isNotNull() & F.col(lat).isNotNull())
         .select(F.col(point_id).alias("point_id"),
                 F.col(lon).alias("p_lon"), F.col(lat).alias("p_lat"))
         .withColumn("cell", C.encode_point(F.col("p_lon"), F.col("p_lat"), zoom)))
    # the candidate join can fan out 1000x per probe row (dense query sets
    # sharing the hot cell): guarantee the probe side has enough partitions
    # to spread the explosion (no-op on real at-scale tables — see util)
    p = ensure_min_parallelism(p)

    # queries (exploded) are the small side -> broadcast them, stream points.
    cand = p.join(F.broadcast(q), "cell", "inner")
    cand = cand.withColumn(
        "dist", G.planar_distance(F.col("qlon"), F.col("qlat"), F.col("p_lon"), F.col("p_lat")))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("point_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "point_id", "rank", "dist"))


def knn_join_exact(queries: DataFrame, points: DataFrame, k: int, zoom: int,
                   max_ring: int = 8, **names) -> DataFrame:
    """Exact kNN in ONE plan (no per-ring driver loop; two jobs total).

      pass 1   ring-1 cell join -> per-query kth candidate distance d1
               (an UPPER bound on the true kth distance: more candidates
               can only shrink it);
      solve    per query, the smallest ring whose coverage bound exceeds
               d1 — solved in closed form from the tile geometry
               (lon: ceil(d1 * n / 360); lat: the mercator row containing
               qlat +/- d1), plus ONE whole-cell margin so coverage is
               STRICT (a point at distance exactly d1 could win the
               (dist, point_id) tie-break);
      pass 2   only unresolved queries re-join at their OWN ring
               (variable explode over sequence(-r, r)), exact re-rank.

    Queries with < k ring-1 candidates take ring = max_ring directly (no
    density assumption — the documented sparse-region fallback). A query
    WITH >= k ring-1 candidates whose closed-form required ring exceeds
    ``max_ring`` raises inside the plan instead of silently capping (an
    "exact" function must not return inexact results; callers widen
    max_ring or coarsen the zoom). The ring-1 result is
    localCheckpoint'ed once (a single materialization; the union plan
    references it three times), so the whole operator is two jobs.
    Output: (query_id, point_id, rank, dist)."""
    qid = names.get("query_id", "query_id")
    qlon = names.get("qlon", "qlon")
    qlat = names.get("qlat", "qlat")
    pid = names.get("point_id", "doc_id")
    lon = names.get("lon", "lon")
    lat = names.get("lat", "lat")
    n = 1 << zoom
    ring_cap = min(max_ring, n // 2 - 1)
    if ring_cap < 1:
        raise ValueError(f"zoom {zoom} grid too small for any ring")

    res1 = knn_join(queries, points, k, zoom, ring=1, query_id=qid,
                    qlon=qlon, qlat=qlat, point_id=pid, lon=lon, lat=lat) \
        .localCheckpoint(eager=True)

    # per-query ring-1 coverage bound (same geometry as the iterative guard)
    qb = (queries.select(F.col(qid).alias("query_id"),
                         F.col(qlon).alias("_qlon"), F.col(qlat).alias("_qlat"))
          .withColumn("_qrow", C.tile_row(F.col("_qlat"), zoom)))
    inf = F.lit(1e9)
    gx = F.lit(360.0 / n)
    gy_n = F.when(F.col("_qrow") - 1 <= 0, inf).otherwise(
        C.tile_ymax(F.lit(zoom), F.col("_qrow") - 1) - F.col("_qlat"))
    gy_s = F.when(F.col("_qrow") + 1 >= n - 1, inf).otherwise(
        F.col("_qlat") - C.tile_ymin(F.lit(zoom), F.col("_qrow") + 1))
    qb = qb.withColumn("_covered", F.least(gx, gy_n, gy_s))

    agg1 = res1.groupBy("query_id").agg(F.max("dist").alias("_kth"),
                                        F.count("*").alias("_nres"))
    st = qb.join(agg1, "query_id", "left")  # left keeps 0-candidate queries
    resolved = (F.col("_nres") >= k) & (F.col("_kth") < F.col("_covered"))
    # closed-form required ring from d1 (kth observed): cover the
    # (|dlon|, |dlat|) <= d1 box, +1 cell margin for strictness
    rx = (F.floor(F.col("_kth") * n / F.lit(360.0)) + 1).cast("int")
    rn = (F.col("_qrow")
          - C.tile_row(F.col("_qlat") + F.col("_kth"), zoom)).cast("int")
    rs = (C.tile_row(F.col("_qlat") - F.col("_kth"), zoom)
          - F.col("_qrow")).cast("int")
    ring_needed = F.greatest(rx, rn, rs, F.lit(1)) + F.lit(1)
    # fail-LOUD when the closed-form ring exceeds the cap for a query that
    # HAS >= k ring-1 candidates: capping silently would return inexact
    # results from a function named "exact" (unreachable at the entry's
    # zoom-8/max_ring-64 config, but latent for tighter configs). The check
    # rides the ring value itself so Catalyst cannot prune it away.
    ring_over = (F.coalesce(resolved, F.lit(False)) == F.lit(False)) \
        & (F.coalesce(F.col("_nres"), F.lit(0)) >= k) \
        & (ring_needed > F.lit(ring_cap))
    ring_checked = F.when(ring_over, F.raise_error(F.concat(
        F.lit("knn_join_exact: required ring "), ring_needed.cast("string"),
        F.lit(f" exceeds max_ring {ring_cap} at zoom {zoom} for query "),
        F.col("query_id").cast("string"),
        F.lit("; raise max_ring or coarsen the zoom"))).cast("int")) \
        .otherwise(ring_needed)
    ring_col = F.when(F.coalesce(F.col("_nres"), F.lit(0)) >= k, ring_checked) \
                .otherwise(F.lit(ring_cap))
    st = (st.withColumn("_resolved", F.coalesce(resolved, F.lit(False)))
            .withColumn("_ring", ring_col))

    ok_ids = st.filter(F.col("_resolved")).select("query_id")
    done = res1.join(F.broadcast(ok_ids), "query_id", "left_semi")

    todo = st.filter(~F.col("_resolved")) \
             .select("query_id", "_qlon", "_qlat", "_qrow", "_ring")
    q2 = (todo.withColumn("_qcol", C.tile_col(F.col("_qlon"), zoom))
          .withColumn("_dc", F.explode(F.sequence(-F.col("_ring"), F.col("_ring"))))
          .withColumn("_dr", F.explode(F.sequence(-F.col("_ring"), F.col("_ring"))))
          .filter((F.col("_qrow") + F.col("_dr") >= 0)
                  & (F.col("_qrow") + F.col("_dr") < n))
          .withColumn("cell", C.cell_id(
              F.lit(zoom),
              F.pmod(F.col("_qcol") + F.col("_dc"), F.lit(n)),
              F.col("_qrow") + F.col("_dr")))
          .select("query_id", F.col("_qlon").alias("qlon"),
                  F.col("_qlat").alias("qlat"), "cell"))
    p = (points.filter(F.col(lon).isNotNull() & F.col(lat).isNotNull())
         .select(F.col(pid).alias("point_id"),
                 F.col(lon).alias("p_lon"), F.col(lat).alias("p_lat"))
         .withColumn("cell", C.encode_point(F.col("p_lon"), F.col("p_lat"), zoom)))
    p = ensure_min_parallelism(p)
    cand2 = p.join(F.broadcast(q2), "cell", "inner").withColumn(
        "dist", G.planar_distance(F.col("qlon"), F.col("qlat"),
                                  F.col("p_lon"), F.col("p_lat")))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(),
                                               F.col("point_id").asc())
    res2 = (cand2.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "point_id", "rank", "dist"))
    return done.unionByName(res2)
