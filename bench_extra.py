#!/usr/bin/env python
"""Side benchmark for the optimization round (bench.py is FROZEN).

Times an arbitrary subset of the declared queries with the SAME methodology
as bench.py (same session factory, same view registration, same Python-worker
and streaming warmup, noop sink), optionally several repeats per query, and
can dump .explain("formatted") plans.

Usage:
  python bench_extra.py q1 q2 ...            # time those queries (1 rep)
  python bench_extra.py --reps 3 q1 q2       # min of 3 reps each
  python bench_extra.py --all                # whole registry once
  python bench_extra.py --explain DIR q1 ... # also write DIR/<q>.txt plans

Prints one JSON line: {"queries": {name: sec}, "reps": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from geotrellis_contrib_spark import derive  # noqa: E402
from geotrellis_contrib_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    explain_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif a == "--all":
            names = list(entrymod.queries().keys()); i += 1
        else:
            names.append(a); i += 1

    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    import bench as benchmod  # reuse the frozen warmers verbatim
    spark = get_session(app_name="bench_extra", cores=CPUS)
    derive.register_views(spark, SF_DIR)
    benchmod._warm_python_workers(spark)
    needs_stream = any(n.startswith("stream_") for n in names)
    if needs_stream:
        benchmod._warm_streaming(spark)

    times: dict[str, float] = {}
    for name in names:
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            _noop(df)
            samples.append(round(time.time() - t0, 3))
        times[name] = min(samples)
        if reps > 1:
            times[f"{name}__samples"] = samples  # type: ignore[assignment]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
    spark.stop()
    total = sum(v for k, v in times.items() if not k.endswith("__samples"))
    print(json.dumps({"queries": times, "reps": reps,
                      "total": round(total, 3), "sf": SF_DIR}))


if __name__ == "__main__":
    main()
