"""Checkpointed, resumable partitioned writes with lineage + metrics.

Design (north rule: "resumable from per-partition checkpoints with
lineage + metrics"):

* Work is keyed by a PARTITION COLUMN (e.g. coarse cell id, tile id,
  date). Each run writes `part_key=<v>/` directories plus one manifest
  row per completed partition: (part_key, rows_in, rows_out, checksum,
  wall_ms, finished_ts).
* Resume = anti-join the work list against the manifest: only
  partitions without a manifest entry are recomputed. Partially
  written partition dirs (no manifest row) are overwritten thanks to
  dynamic partition overwrite — the write is idempotent per partition.
* The checksum is an order-insensitive xor/sum over xxhash64 of the
  output rows — cheap, computed in the same pass (one extra agg), and
  comparable across retries for lineage audits.

At 100 TB: the manifest is tiny (one row per partition), the data
write is append-only per partition, and failure recovery re-runs only
missing partitions — no global restart, no driver state beyond the
manifest table.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def manifest_path(base: str) -> str:
    return os.path.join(base, "_manifest")


def data_path(base: str) -> str:
    return os.path.join(base, "data")


def completed_partitions(spark: SparkSession, base: str) -> DataFrame | None:
    """Manifest rows of completed partitions, or None if no manifest."""
    p = manifest_path(base)
    try:
        return spark.read.parquet(p)
    except Exception:  # noqa: BLE001 — missing path on first run
        return None


def _write_batch(
    spark: SparkSession, batch_df: DataFrame, base: str, part_col: str, columns
) -> dict:
    """One commit unit: write the batch's partitions + append their
    manifest rows. A kill between batches loses at most the in-flight
    batch (its partition dirs are overwritten idempotently on resume —
    dynamic partition overwrite)."""
    t0 = time.time()
    batch_df = batch_df.cache()
    # per-partition lineage in the same pass as the write: rows + checksum
    stats_rows = (
        batch_df.groupBy(F.col(part_col).alias("part_key"))
        .agg(
            F.count("*").alias("rows_out"),
            # xor-fold: order-insensitive and overflow-free (a sum of
            # 64-bit hashes overflows under ANSI mode at scale)
            F.expr(
                "bit_xor("
                + "xxhash64("
                + ", ".join(f"`{c}`" for c in columns if c != part_col)
                + "))"
            ).alias("checksum"),
        )
        .collect()
    )
    if not stats_rows:
        batch_df.unpersist()
        return {"written": 0, "rows_out": 0}
    (
        batch_df.write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(data_path(base))
    )
    wall_ms = int((time.time() - t0) * 1000)
    from pyspark.sql.types import LongType, StructField, StructType

    # part_key takes the partition column's own type (string keys are as
    # common as numeric ones; a hardcoded LONG breaks them)
    manifest_schema = StructType(
        [
            StructField("part_key", batch_df.schema[part_col].dataType, True),
            StructField("rows_out", LongType(), True),
            StructField("checksum", LongType(), True),
            StructField("wall_ms", LongType(), True),
        ]
    )
    manifest = spark.createDataFrame(
        [
            (r["part_key"], r["rows_out"], r["checksum"], wall_ms)
            for r in stats_rows
        ],
        manifest_schema,
    ).withColumn("finished_ts", F.current_timestamp())
    manifest.write.mode("append").parquet(manifest_path(base))
    rows_out = sum(r["rows_out"] for r in stats_rows)
    batch_df.unpersist()
    return {"written": len(stats_rows), "rows_out": int(rows_out)}


def run_checkpointed(
    spark: SparkSession,
    df: DataFrame,
    base: str,
    part_col: str,
    batch_partitions: int | None = None,
    on_batch=None,
) -> dict:
    """Write df partitioned by part_col, resumably.

    ``batch_partitions`` sets the checkpoint granularity: partitions
    are committed (data + manifest) in key-sorted batches of that size,
    so a crash loses at most one in-flight batch and a resume re-runs
    only the partitions without manifest rows. None = one batch (the
    whole remaining work commits atomically at the end). ``on_batch``
    (tests/harnesses) is called after each batch commit with the
    running batch index.

    Returns a summary dict: {"written": n_partitions, "skipped": n,
    "rows_out": n}. Call again after a failure to continue.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = completed_partitions(spark, base)
    todo = df
    skipped = 0
    if done is not None:
        # materialize the manifest keys (metadata-scale: one per
        # partition) — a literal filter avoids the lazy-plan trap of
        # re-reading the manifest we are about to append to
        done_key_vals = [r["part_key"] for r in done.select("part_key").collect()]
        skipped = len(done_key_vals)
        # NULL keys need explicit handling: `~isin(...)` evaluates to
        # NULL (filtered out) for NULL-keyed rows, which would silently
        # drop the NULL partition on every resume (ADVICE r01)
        non_null_done = [v for v in done_key_vals if v is not None]
        null_done = len(non_null_done) < len(done_key_vals)
        keep = F.lit(True)
        if non_null_done:
            keep = ~F.col(part_col).isin(non_null_done) | F.col(part_col).isNull()
        if null_done:
            keep = keep & F.col(part_col).isNotNull()
        if done_key_vals:
            todo = df.where(keep)

    total = {"written": 0, "skipped": skipped, "rows_out": 0}
    if batch_partitions is None:
        r = _write_batch(spark, todo, base, part_col, df.columns)
        total["written"] += r["written"]
        total["rows_out"] += r["rows_out"]
        return total
    # batched commits: the todo key list is metadata-scale (one value
    # per partition); sorted for a deterministic commit order.
    # `todo` is persisted BEFORE the key collect so the upstream plan
    # evaluates exactly once: with a nondeterministic upstream
    # (rand/sampling), a row whose key differed between the key scan
    # and a later batch-filter scan could fall outside every batch
    # predicate and be silently dropped — and it saves one full
    # upstream recompute per batch besides.
    todo = todo.persist()
    try:
        keys = [r[0] for r in todo.select(part_col).distinct().collect()]
        keys.sort(key=lambda v: (v is None, v))
        for bi in range(0, len(keys), batch_partitions):
            batch_keys = keys[bi : bi + batch_partitions]
            non_null = [k for k in batch_keys if k is not None]
            cond = F.col(part_col).isin(non_null) if non_null else F.lit(False)
            if any(k is None for k in batch_keys):
                cond = cond | F.col(part_col).isNull()
            r = _write_batch(spark, todo.where(cond), base, part_col, df.columns)
            total["written"] += r["written"]
            total["rows_out"] += r["rows_out"]
            if on_batch is not None:
                on_batch(bi // batch_partitions)
    finally:
        todo.unpersist()
    return total


def lineage_report(spark: SparkSession, base: str) -> DataFrame | None:
    """The manifest as a DataFrame (partition, rows, checksum, timing)."""
    return completed_partitions(spark, base)
