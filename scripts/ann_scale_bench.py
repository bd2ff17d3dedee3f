"""ANN layer at realistic scale: 100k x 64-d clustered embeddings.

The driver embeddings tables cap at 2000 vectors (sf0.1); this
measures the ANN scale path the design claims: exact brute-force
(mapInPandas matmul, no crossJoin), IVF-flat (hash-sampled k-means,
multi-assign), SRP-LSH banding — recall vs exact and wall/throughput
at 100k targets, on a DETERMINISTIC clustered corpus generated
executor-side in pure SQL (64 centroids + 0.3-sigma noise; clustered
structure is what makes quantization meaningful — uniform random
vectors have near-orthogonal neighbors and no recall headroom for ANY
index). Writes BENCH/ann_scale_r06.json.

Run: python scripts/ann_scale_bench.py      (~3-6 min)
Env: ANN_SCALE_N (default 100_000), ANN_SCALE_QUERIES (100)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("ANN_SCALE_N", "100000"))
NQ = int(os.environ.get("ANN_SCALE_QUERIES", "100"))
DIM = 64
K = 5
N_CLUSTERS = 64


def synth_embeddings(spark, n: int):
    """Deterministic clustered embeddings, generated executor-side
    (pure SQL, 10^12-safe): vec = centroid[xxhash(id)%64] + 0.3*noise,
    every component a pure function of (cluster, j) / (id, j)."""
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    i = F.col("id")
    c = F.pmod(F.xxhash64(i), F.lit(N_CLUSTERS))

    def unit(h):  # [-1, 1) from a hash
        return (F.pmod(h, F.lit(2000)).cast("double") - 1000.0) / 1000.0

    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            unit(F.xxhash64(c, j, F.lit("ctr")))
            + unit(F.xxhash64(i, j, F.lit("nse"))) * 0.3
        ).cast("float"),
    )
    return df.select(i.alias("vec_id"), emb.alias("embedding"))


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _cpu_probe_ms
    from pygeoops_spark.ann.cosine import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )
    from pygeoops_spark.session import get_spark

    spark = get_spark("ann-scale", shuffle_partitions=64)
    emb = synth_embeddings(spark, N)
    emb.write.mode("overwrite").parquet("/tmp/ann_scale_emb.parquet")
    emb = spark.read.parquet("/tmp/ann_scale_emb.parquet")
    queries = emb.where(F.col("vec_id") < NQ)

    out: dict = {
        "task": "ANN layer at 100k x 64-d (clustered corpus)",
        "n_targets": N,
        "n_queries": NQ,
        "k": K,
        "methods": {},
    }

    def timed(fn):
        probe = _cpu_probe_ms()
        t0 = time.time()
        df = fn().select("query_id", "neighbor_id")
        rows = {(r[0], r[1]) for r in df.collect()}
        return rows, round(time.time() - t0, 2), probe

    # warm the Python-worker pool / codegen before any timed pass
    cosine_topk_bruteforce(queries, emb.limit(5000), k=K).count()

    exact, exact_sec, p0 = timed(lambda: cosine_topk_bruteforce(queries, emb, k=K))
    out["methods"]["brute"] = {
        "sec": exact_sec,
        "probe_ms": p0,
        "targets_per_sec": round(N / exact_sec, 1),
    }

    from pygeoops_spark.ann.cosine import ivf_build_index, ivf_query_index

    idx_path = "/tmp/ann_scale_ivf_idx"
    t0 = time.time()
    ivf_build_index(emb, idx_path, n_cells=64, t_assign=3, train_iters=8)
    out["ivf_index_build_sec"] = round(time.time() - t0, 2)

    methods = [
        (
            "ivf_prebuilt_c64_p8",
            lambda: ivf_query_index(spark, idx_path, queries, k=K, nprobe=8),
        ),
        (
            "ivf_c64_p8",
            lambda: cosine_topk_ivf(
                queries, emb, k=K, n_cells=64, nprobe=8, t_assign=3, train_iters=8
            ),
        ),
        ("lsh_16x3", lambda: cosine_topk_lsh(queries, emb, k=K, n_bits=48, bands=16)),
    ]
    only = os.environ.get("ANN_SCALE_METHODS")
    if only:
        methods = [m for m in methods if m[0] in only.split(",")]
    for name, fn in methods:
        approx, sec, probe = timed(fn)
        hits_per_q: dict[int, int] = {}
        for q, nbr in approx:
            if (q, nbr) in exact:
                hits_per_q[q] = hits_per_q.get(q, 0) + 1
        hits = [hits_per_q.get(q, 0) for q in range(NQ)]
        out["methods"][name] = {
            "sec": sec,
            "probe_ms": probe,
            "speedup_vs_brute": round(exact_sec / sec, 2),
            "recall_min": min(hits),
            "recall_mean": round(sum(hits) / len(hits), 3),
        }
        print(json.dumps({name: out["methods"][name]}))

    spark.stop()
    path = os.path.join(
        REPO, "BENCH", os.environ.get("ANN_SCALE_OUT", "ann_scale_r06.json")
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
