"""Storage-layout scale techniques: partition pruning on cell-prefixed
layouts and bucketed co-located joins (the Iceberg-style story the
100 TB design relies on, exercised at sandbox scale with plan asserts).
"""

import shutil
import tempfile

from pyspark.sql import functions as F


def test_cell_partitioned_layout_prunes(spark):
    """Writing pages partitioned by coarse cell id means a cell filter
    prunes files at planning time (PartitionFilters, not data filters).
    """
    from pygeoops_spark.corpus.pages import synth_pages
    from pygeoops_spark.join.cells import cell_id

    base = tempfile.mkdtemp(prefix="layout_")
    try:
        pages = synth_pages(spark, 3000).withColumn(
            "cell", cell_id("x", "y", 2)
        )
        pages.write.mode("overwrite").partitionBy("cell").parquet(base)
        back = spark.read.parquet(base).where(F.col("cell") == 5)
        plan = back._jdf.queryExecution().executedPlan().toString()
        # the cell predicate lands in PartitionFilters (file pruning at
        # planning time), not PushedFilters/data filters
        assert "PartitionFilters" in plan
        import re

        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert pf and "cell" in pf.group(1) and "5" in pf.group(1), plan[:800]
        # correctness: same rows as a post-hoc filter
        expected = (
            synth_pages(spark, 3000)
            .withColumn("cell", cell_id("x", "y", 2))
            .where(F.col("cell") == 5)
            .count()
        )
        assert back.count() == expected
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_bucketed_join_avoids_shuffle(spark):
    """Bucketing both sides of a recurring equi-join key (cell id) lets
    Catalyst plan a shuffle-free sort-merge join — the pre-partitioning
    technique for repeatedly-joined 100 TB tables."""
    from pygeoops_spark.corpus.pages import synth_pages
    from pygeoops_spark.join.cells import cell_id

    warehouse = tempfile.mkdtemp(prefix="wh_")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pages = synth_pages(spark, 2000).withColumn("cell", cell_id("x", "y", 3))
        left = pages.select("url", "cell", "x", "y")
        right = pages.select(F.col("url").alias("url2"), "cell", "lang")
        for name, df in (("t_left", left), ("t_right", right)):
            (
                df.write.mode("overwrite")
                .format("parquet")
                .bucketBy(8, "cell")
                .sortBy("cell")
                .option("path", f"{warehouse}/{name}")
                .saveAsTable(name)
            )
        l = spark.table("t_left")
        r = spark.table("t_right")
        j = l.join(r, "cell")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # no exchange on either side of the join
        assert "Exchange hashpartitioning(cell" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")
        shutil.rmtree(warehouse, ignore_errors=True)
