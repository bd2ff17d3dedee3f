"""Checkpoint/resume + lineage tests."""

import shutil
import tempfile

from pyspark.sql import functions as F


def test_checkpoint_resume(spark):
    from pygeoops_spark.corpus.pages import synth_pages
    from pygeoops_spark.operators.grid import assign_to_grid
    from pygeoops_spark.run.checkpoint import lineage_report, run_checkpointed

    base = tempfile.mkdtemp(prefix="ckpt_")
    try:
        pages = assign_to_grid(
            synth_pages(spark, 2000), "x", "y", (0.0, 0.0, 1000.0, 1000.0), 4, 4
        ).select("url", "text", "x", "y", "tile_id")

        # first run writes everything
        s1 = run_checkpointed(spark, pages, base, "tile_id")
        assert s1["skipped"] == 0
        assert s1["written"] > 0
        assert s1["rows_out"] == 2000

        # second run: everything already checkpointed
        s2 = run_checkpointed(spark, pages, base, "tile_id")
        assert s2["written"] == 0
        assert s2["skipped"] == s1["written"]

        # lineage rows: one per partition, counts sum to total
        rep = lineage_report(spark, base)
        assert rep.count() == s1["written"]
        assert rep.agg(F.sum("rows_out")).first()[0] == 2000
        assert rep.where(F.col("checksum").isNull()).count() == 0

        # written data round-trips and text survives byte-identical
        from pygeoops_spark.run.checkpoint import data_path

        out = spark.read.parquet(data_path(base))
        assert out.count() == 2000
        joined = out.select("url", F.col("text").alias("t2")).join(
            pages.select("url", "text"), "url"
        )
        assert joined.where(F.col("text") != F.col("t2")).count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_checkpoint_partial_resume(spark):
    """Simulate a partial run: manifest has only half the partitions ->
    resume writes exactly the missing ones."""
    from pygeoops_spark.corpus.pages import synth_pages
    from pygeoops_spark.operators.grid import assign_to_grid
    from pygeoops_spark.run.checkpoint import run_checkpointed

    base = tempfile.mkdtemp(prefix="ckpt_")
    try:
        pages = assign_to_grid(
            synth_pages(spark, 1000), "x", "y", (0.0, 0.0, 1000.0, 1000.0), 2, 2
        ).select("url", "text", "tile_id")
        half = pages.where(F.col("tile_id") < 2)
        s1 = run_checkpointed(spark, half, base, "tile_id")
        assert s1["written"] >= 1
        s2 = run_checkpointed(spark, pages, base, "tile_id")
        assert s2["skipped"] == s1["written"]
        assert s2["written"] >= 1
        from pygeoops_spark.run.checkpoint import data_path

        assert spark.read.parquet(data_path(base)).count() == 1000
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_checkpoint_null_partition_key_resume(spark):
    """NULL-keyed rows must survive resume: `~isin(done)` is NULL for a
    NULL key, which used to silently drop the NULL partition on every
    resume after a first run that only wrote other partitions
    (ADVICE r01)."""
    import pandas as pd

    from pygeoops_spark.run.checkpoint import data_path, run_checkpointed

    base = tempfile.mkdtemp(prefix="ckpt_null_")
    try:
        df_a = spark.createDataFrame(
            pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 3]})
        )
        s1 = run_checkpointed(spark, df_a, base, "k")
        assert s1["rows_out"] == 3

        # resume with an extra NULL-keyed partition present
        df_b = spark.createDataFrame(
            pd.DataFrame({"k": ["a", "a", "b", None, None], "v": [1, 2, 3, 4, 5]})
        )
        s2 = run_checkpointed(spark, df_b, base, "k")
        assert s2["skipped"] == 2          # a, b already done
        assert s2["rows_out"] == 2         # the NULL rows are written
        out = spark.read.parquet(data_path(base))
        assert out.count() == 5
        assert out.where(F.col("k").isNull()).count() == 2

        # third run: NULL partition now in the manifest -> nothing to do
        s3 = run_checkpointed(spark, df_b, base, "k")
        assert s3["written"] == 0
        assert s3["skipped"] == 3
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_batched_commits_and_resume(spark):
    """batch_partitions commits (data+manifest) incrementally: stopping
    after batch 1 (simulated via the on_batch hook raising — same
    effect as a crash between commits) leaves exactly one batch in the
    manifest, and the resume writes only the rest."""
    import pandas as pd
    import tempfile

    from pygeoops_spark.run.checkpoint import (
        completed_partitions,
        data_path,
        run_checkpointed,
    )

    base = tempfile.mkdtemp(prefix="ckpt_batch_")
    try:
        df = spark.createDataFrame(
            pd.DataFrame({"k": [i % 6 for i in range(60)], "v": range(60)})
        )

        class Stop(Exception):
            pass

        def die_after_first(bi):
            if bi == 0:
                raise Stop()

        try:
            run_checkpointed(spark, df, base, "k", batch_partitions=2,
                             on_batch=die_after_first)
            raise AssertionError("expected the simulated crash")
        except Stop:
            pass
        done = completed_partitions(spark, base)
        assert done.count() == 2  # exactly one 2-partition batch committed

        s = run_checkpointed(spark, df, base, "k", batch_partitions=2)
        assert s["skipped"] == 2
        assert s["written"] == 4
        out = spark.read.parquet(data_path(base))
        assert out.count() == 60
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)


import pytest

RUNS_LOCAL = __import__("os").environ.get("RUNS_LOCAL") == "1"


@pytest.mark.skipif(not RUNS_LOCAL, reason="3 subprocess Spark runs + SIGKILL; set RUNS_LOCAL=1")
def test_resume_after_sigkill_end_to_end():
    """Hard-kill evidence (scripts/resume_kill_test.py): SIGKILL the
    pipeline mid-run, resume, and verify per-partition checksums + row
    counts equal the one-shot run. The per-round artifact lives in
    BENCH/resume_kill_r05.json."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "resume_kill_test.py"),
         "--pages", "150000"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
