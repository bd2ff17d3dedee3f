#!/usr/bin/env python
"""spark-submit entry point: the flagship spatial pipeline, resumable.

Cluster usage (the shipped path — identical code runs in the sandbox):

    cd /root/repo && zip -r /tmp/pygeoops_spark.zip pygeoops_spark
    spark-submit --py-files /tmp/pygeoops_spark.zip \
        scripts/run_pipeline.py --pages 100000000 \
        --output s3://bucket/run1 --grid 64 --cell-level 8

Local smoke:

    python scripts/run_pipeline.py --pages 100000 --output /tmp/run1

Re-running with the same --output resumes from the per-partition
checkpoint manifest (only missing tile partitions recompute).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--zones", type=int, default=64)
    ap.add_argument("--grid", type=int, default=16, help="tiles per axis")
    ap.add_argument("--cell-level", type=int, default=5)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--batch-partitions",
        type=int,
        default=None,
        help="checkpoint granularity: commit (data+manifest) every N "
        "partitions so a crash loses at most one batch",
    )
    args = ap.parse_args()

    from pygeoops_spark.corpus.pages import synth_pages, synth_zones
    from pygeoops_spark.join.pip import pip_join_rects
    from pygeoops_spark.operators.grid import assign_to_grid
    from pygeoops_spark.run.checkpoint import lineage_report, run_checkpointed
    from pygeoops_spark.session import get_spark

    spark = get_spark("pygeoops_spark-pipeline", master=args.master)
    t0 = time.time()
    pages = synth_pages(spark, args.pages)
    joined = pip_join_rects(pages, synth_zones(spark, args.zones), level=args.cell_level)
    tiled = assign_to_grid(
        joined, "x", "y", (0.0, 0.0, 1000.0, 1000.0), args.grid, args.grid
    ).select("url", "warc_ts", "text", "lang", "x", "y", "zone_id", "tile_id")
    summary = run_checkpointed(
        spark, tiled, args.output, "tile_id", batch_partitions=args.batch_partitions
    )
    summary["wall_sec"] = round(time.time() - t0, 3)
    rep = lineage_report(spark, args.output)
    summary["partitions_total"] = rep.count() if rep is not None else 0
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
