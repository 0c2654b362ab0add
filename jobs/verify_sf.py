#!/usr/bin/env python
"""Scale-posture verification: run EVERY driver query at an arbitrary sf
dir (default the .scratch/sf1.0 built by jobs/make_sf.py) and compare the
full result set against its DuckDB oracle EXACTLY (symmetric EXCEPT ALL
over name-sorted columns cast to VARCHAR — no pandas, no sampling).

Engine results are written to parquet and compared inside DuckDB, so the
compare itself scales to 10^8-row results. Each oracle runs in its own
subprocess under a time budget; a budget overrun records
``oracle="budget"`` (the quadratic self-join oracles are O(n^2) in DuckDB
with no index — the ENGINE result is still produced and timed).

Prints one JSON line per query:
  {"q": name, "engine_s": ..., "rows": ..., "oracle_s": ...,
   "match": true|false|"budget"|"no-oracle"}
and a final summary line.

Usage: python jobs/verify_sf.py [sf_dir] [oracle_budget_s] [only,names]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scale_oracles() -> dict[str, str]:
    """Scale-mode REWRITES of the O(n^2) oracles: same values, expressed
    as bucketed equi-joins DuckDB can execute at sf1.0 (the driver-facing
    oracles in __spark_entry__ stay in their simplest declarative form —
    the sf0.01 gate runs those; these exist only so the sf1.0 posture run
    gets VALUE checks instead of budget timeouts). The refine predicates
    and output expressions are copied verbatim, so results are
    bit-identical to the simple forms."""
    import __spark_entry__ as E
    from geotrellis_contrib_spark import derive
    from geotrellis_contrib_spark.functions import cells as C
    o = {}
    # distance theta self-join: 0.5-deg buckets, 3x3 neighbor equi-join
    # (a pair within dist < 0.5 differs by < 0.5 in each axis, so it
    # shares or neighbors a bucket — identical pair set)
    dd = E._dist_sql("a.lon", "a.lat", "b.lon", "b.lat")
    o["distance_join"] = f"""
{derive.cte('anchors')},
pts AS (SELECT doc_id, lon, lat,
               CAST(FLOOR(lon/0.5) AS BIGINT) AS bx,
               CAST(FLOOR(lat/0.5) AS BIGINT) AS by
        FROM anchors WHERE lon IS NOT NULL),
offs AS (SELECT dx, dy FROM (SELECT UNNEST([-1,0,1]) AS dx),
                            (SELECT UNNEST([-1,0,1]) AS dy))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {dd} AS dist,
       CAST(FLOOR({dd} * 10000.0 + 0.5) AS BIGINT) AS dist_e4
FROM pts a JOIN offs ON TRUE
JOIN pts b ON b.bx = a.bx + offs.dx AND b.by = a.by + offs.dy
          AND a.doc_id < b.doc_id
WHERE {dd} < {E.DIST_RADIUS}
"""
    # windows x tiles range join -> explicit cover-cell equi-join (the
    # BETWEEN ranges ARE the cover cells; join on (col,row) keys)
    wc0 = C.sql_tile_col("w.xmin", 6)
    wc1 = C.sql_tile_col("w.xmax", 6)
    wr0 = C.sql_tile_row("w.ymax", 6)
    wr1 = C.sql_tile_row("w.ymin", 6)
    o["windows_read"] = f"""
{derive.cte('windows', 'tiles')},
cov AS (
  SELECT w.win_id, cc.col, rr.row
  FROM windows w,
       LATERAL (SELECT UNNEST(RANGE({wc0}, {wc1}+1)) AS col) cc,
       LATERAL (SELECT UNNEST(RANGE({wr0}, {wr1}+1)) AS row) rr)
SELECT cov.win_id, CAST(COUNT(*) AS BIGINT) AS n_tiles, SUM(t.val) AS sum_val
FROM cov JOIN tiles t ON t.col = cov.col AND t.row = cov.row
GROUP BY cov.win_id
"""
    o["windows_read_multizoom"] = o["windows_read"]
    # CC oracles: force MATERIALIZED on the non-recursive CTEs — DuckDB
    # otherwise re-inlines the whole LSH candidate join into every
    # recursive-closure step (identical results, orders of magnitude
    # slower at sf1.0)
    for qn in ("dedup_clusters", "embed_dup_clusters"):
        sql = E.oracle_sql()[qn]
        for cte_name in ("eb", "ev", "sh", "sigs", "bands", "cand",
                         "pairs", "nodes", "cedges", "dup_docs"):
            sql = sql.replace(f"{cte_name} AS (", f"{cte_name} AS MATERIALIZED (")
        o[qn] = sql
    return o


def _oracle_worker(sf_dir: str, name: str, spark_parquet: str) -> None:
    """Subprocess: run one oracle in DuckDB and compare vs the engine
    parquet. Prints one JSON line."""
    import duckdb

    import __spark_entry__ as E
    from geotrellis_contrib_spark import derive
    con = duckdb.connect()
    for t in derive.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    sql = (_scale_oracles().get(name) if os.environ.get("SCALE_ORACLES")
           else None) or E.oracle_sql()[name]
    t0 = time.time()
    con.execute(f"CREATE TABLE ocl AS ({sql})")
    oracle_s = time.time() - t0
    cols = sorted(r[0] for r in con.execute("DESCRIBE ocl").fetchall())
    sel = ", ".join(f'CAST("{c}" AS VARCHAR) AS "{c}"' for c in cols)
    con.execute(f"CREATE VIEW spk AS SELECT {sel} FROM "
                f"read_parquet('{spark_parquet}/*.parquet')")
    con.execute(f"CREATE VIEW ocl_v AS SELECT {sel} FROM ocl")
    n_o = con.execute("SELECT COUNT(*) FROM ocl_v").fetchone()[0]
    n_s = con.execute("SELECT COUNT(*) FROM spk").fetchone()[0]
    if n_o != n_s:
        match, mode = False, "rows"
    elif n_o <= 20_000_000:
        diff = con.execute(
            "SELECT (SELECT COUNT(*) FROM (SELECT * FROM ocl_v EXCEPT ALL "
            "SELECT * FROM spk)) + (SELECT COUNT(*) FROM (SELECT * FROM spk "
            "EXCEPT ALL SELECT * FROM ocl_v))").fetchone()[0]
        match, mode = bool(diff == 0), "except_all"
    else:
        # huge results: order-independent per-row hash-sum multiset
        # checksum (DuckDB hash() on BOTH sides — same engine, same bits;
        # EXCEPT ALL on 10^8 VARCHAR rows is what blows the budget, the
        # values compared are identical). Multi-argument hash() keeps each
        # column a distinct hash input — no separator ambiguity
        # (('a|b','c') vs ('a','b|c')) and no NULL-vs-sentinel collisions
        # the old string-concat form allowed.
        args = ", ".join(f'"{c}"' for c in cols)
        hs = f"SELECT SUM(CAST(hash({args}) AS HUGEINT))"
        h_o = con.execute(f"{hs} FROM ocl_v").fetchone()[0]
        h_s = con.execute(f"{hs} FROM spk").fetchone()[0]
        match, mode = bool(h_o == h_s), "hash_sum"
    print(json.dumps({"oracle_rows": n_o, "spark_rows": n_s,
                      "oracle_s": round(oracle_s, 2),
                      "compare": mode, "match": match}))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, ".scratch", "sf1.0")
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 900.0
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    import __spark_entry__ as E
    from geotrellis_contrib_spark.session import get_session
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(app_name="verify-sf", cores=cpus)
    out_root = tempfile.mkdtemp(prefix="verify_sf_")
    results = {}
    names = [n for n in E.queries() if only is None or n in only]
    for name in names:
        fn = E.queries()[name]
        dest = os.path.join(out_root, name)
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.mode("overwrite").parquet(dest)
            engine_s = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001 — record and continue
            results[name] = {"q": name, "engine_s": None,
                             "match": f"engine-error: {exc}"[:300]}
            print(json.dumps(results[name]), flush=True)
            continue
        rec = {"q": name, "engine_s": engine_s}
        if budget <= 0:
            rec["match"] = "skipped"   # timing-only run (ratio baselines)
        elif name not in E.oracle_sql():
            rec["match"] = "no-oracle"
        else:
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--oracle-worker", sf_dir, name, dest],
                    capture_output=True, text=True, timeout=budget)
                lines = [ln for ln in out.stdout.splitlines()
                         if ln.startswith("{")]
                if out.returncode != 0 or not lines:
                    rec["match"] = f"oracle-error: {out.stderr[-300:]}"
                else:
                    rec.update(json.loads(lines[-1]))
            except subprocess.TimeoutExpired:
                rec["match"] = "budget"
        results[name] = rec
        print(json.dumps(rec), flush=True)
    ok = sum(1 for r in results.values() if r.get("match") is True)
    print(json.dumps({"summary": True, "sf_dir": sf_dir, "n": len(results),
                      "value_match": ok,
                      "budget": [n for n, r in results.items()
                                 if r.get("match") == "budget"],
                      "engine_total_s": round(sum(
                          r["engine_s"] or 0 for r in results.values()), 1)}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--oracle-worker":
        _oracle_worker(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main()
