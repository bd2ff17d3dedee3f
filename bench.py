#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput": {...},
   "scaling": {...}}   # scaling block when SPARK_GRAFT_SCALING=1

The scaling block evidences the N -> 4N criterion by running the
flagship spatial pipeline at local[8] and local[32] on identical input
and reporting throughput at both plus efficiency
( = (T8/T32) / 4 clamped to [0,1] ... i.e. speedup/4 ).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_N = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "2000000"))

BENCH_QUERIES = [
    "pip_join",
    "knn_join",
    "tile_assign",
    "bbox_join",
    "view_angles",
    "simplify_rdp",
    "dedup_exact",
    "token_count",
    "text_quality",
    "langid",
    "doc_fingerprint",
    "jaccard_pairs",
    "minhash_lsh",
    "simhash",
    "ann_cosine",
    "ann_lsh",
    "media_features",
]


def _run_flagship(spark, n_pages: int) -> int:
    """Flagship spatial pipeline: synth pages -> PIP join -> tile rollup.
    Returns number of input docs processed (for docs/sec)."""
    from pyspark.sql import functions as F

    from pygeoops_spark.corpus.pages import synth_pages, synth_zones
    from pygeoops_spark.join.pip import pip_join_rects
    from pygeoops_spark.operators.grid import assign_to_grid

    pages = synth_pages(spark, n_pages)
    joined = pip_join_rects(pages, synth_zones(spark), level=5)
    tiled = assign_to_grid(joined, "x", "y", (0.0, 0.0, 1000.0, 1000.0), 8, 8)
    tiled.groupBy("zone_id", "tile_id").agg(F.count("*").alias("n")).count()
    return n_pages


def _mk_spark(cpus: int):
    from pygeoops_spark.session import get_spark

    return get_spark(
        f"bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )


def main() -> None:
    import __spark_entry__ as entrymod

    results: dict[str, float] = {}
    throughput: dict[str, float] = {}

    spark = _mk_spark(CPUS)
    # warm the JVM/Python workers so per-query times measure the queries
    spark.range(1000).selectExpr("sum(id)").collect()

    qs = entrymod.queries()
    t_total0 = time.time()
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        dt = time.time() - t0
        results[name] = round(dt, 3)
        throughput[name + "_rows_out"] = n

    # flagship docs/sec at bench scale
    t0 = time.time()
    n_docs = _run_flagship(spark, PAGES_N)
    dt = time.time() - t0
    results["flagship_pip_tile"] = round(dt, 3)
    throughput["flagship_docs_per_sec"] = round(n_docs / dt, 1)
    total = time.time() - t_total0
    spark.stop()

    out = {
        "metric": "spatial-join+tile-assignment pipeline + operator suite wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "throughput": throughput,
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "0") == "1":
        scaling = {}
        for cpus in (8, 32):
            s = _mk_spark(cpus)
            s.range(1000).selectExpr("sum(id)").collect()
            t0 = time.time()
            n = _run_flagship(s, PAGES_N)
            dt = time.time() - t0
            scaling[f"local[{cpus}]"] = {
                "sec": round(dt, 3),
                "docs_per_sec": round(n / dt, 1),
            }
            s.stop()
        speedup = scaling["local[8]"]["sec"] / scaling["local[32]"]["sec"]
        scaling["speedup_8_to_32"] = round(speedup, 3)
        scaling["efficiency"] = round(speedup / 4.0, 3)
        out["scaling"] = scaling

    print(json.dumps(out))


if __name__ == "__main__":
    main()
