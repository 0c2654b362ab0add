#!/usr/bin/env python
"""spark-submit entry point: the flagship spatial-join + tile-assignment
pipeline as a packaged cluster job (BASELINE.json north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Usage (local sandbox; on a cluster swap --master and the paths):

    cd /root/repo && zip -qr /tmp/gcs.zip geotrellis_contrib_spark
    /opt/spark/bin/spark-submit --master 'local[8]' \
        --py-files /tmp/gcs.zip \
        jobs/run_pipeline.py \
        --sf-dir /root/testdata/sf0.01 --n-docs 1000000 \
        --output /tmp/gcs_out --checkpoint

The job: synthesize/read the interleaved corpus -> extract anchors from
spans (spans stay opaque) -> broadcast PIP join to polygons -> zoom-12 tile
assignment -> per-tile counts, written through the checkpointed stage runner
(per-partition watermarks + lineage metrics; re-submitting resumes).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--output", required=True)
    ap.add_argument("--job-id", default="pipeline-1")
    ap.add_argument("--checkpoint", action="store_true",
                    help="write through the watermark-checkpointed stage runner")
    ap.add_argument("--fail-after", type=int, default=None,
                    help="simulate a mid-job kill after N committed batches "
                         "(resume by re-submitting without this flag)")
    args = ap.parse_args()

    # on a cluster the session comes from spark-submit's conf; only fall back
    # to the engine factory when run standalone
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from geotrellis_contrib_spark import corpus, derive
    from geotrellis_contrib_spark.operators import spatial_join as sj
    from geotrellis_contrib_spark.operators import tiling
    from geotrellis_contrib_spark.plans import checkpoint as cp

    derive.register_views(spark, args.sf_dir)
    t0 = time.time()
    docs = corpus.synth_docs(spark, args.n_docs)
    anchors = corpus.extract_anchors(docs)
    hits = sj.pip_join_boxes(anchors, spark.table("polygon_boxes"), zoom=6)
    tiles = tiling.assign_tiles(hits, [12])
    out = tiles.groupBy("poly_id", "zoom", "col", "row").agg(
        F.count("*").alias("n_docs"))

    if args.checkpoint:
        out = out.withColumn(
            "cell", F.shiftleft(F.col("zoom").cast("long"), 58)
            + F.shiftleft(F.col("col"), 29) + F.col("row"))
        cp.run_stage(spark, out, output_root=args.output, job_id=args.job_id,
                     stage="tile_counts", key_col="cell", n_buckets=16,
                     fail_after_batches=args.fail_after)
        n = cp.read_stage(spark, args.output, "tile_counts").count()
    else:
        out.write.mode("overwrite").parquet(args.output + "/tile_counts")
        n = spark.read.parquet(args.output + "/tile_counts").count()

    dt = time.time() - t0
    print(json.dumps({"job": "run_pipeline", "docs": args.n_docs,
                      "output_rows": n, "sec": round(dt, 2),
                      "docs_per_sec": round(args.n_docs / dt)}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
