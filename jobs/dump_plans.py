#!/usr/bin/env python
"""Dump .explain('formatted') for every declared query to a directory.

Usage: python jobs/dump_plans.py OUT_DIR [suffix] [only,names]

Writes OUT_DIR/<query><suffix>.txt. Building a query's DataFrame may run
bounded driver collects (observer tables, probes) and the streaming gates
drain their streams at build time — that is part of the declared query and
is reflected in the captured final plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from geotrellis_contrib_spark import derive  # noqa: E402
from geotrellis_contrib_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else ""
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="dump_plans", cores=CPUS)
    derive.register_views(spark, SF_DIR)
    qs = entrymod.queries()
    names = only or list(qs)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            txt = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok" if not txt.startswith("PLAN CAPTURE") else "FAIL")
    spark.stop()


if __name__ == "__main__":
    main()
