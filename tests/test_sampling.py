"""Deterministic sampling + per-group selection (text/sampling.py):
rerun-stability, rate accuracy, ANSI-safe arithmetic, oracle parity."""

import pytest
from pyspark.sql import functions as F

from pygeoops_spark.text.sampling import (
    det_hash_bucket,
    det_sample,
    oracle_hash_sql,
    stratified_sample,
    topk_per_group,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(20_000).select(F.col("id").alias("doc_id"))


def test_rate_accuracy(spark, ids):
    for rate in (0.1, 0.5):
        got = det_sample(ids, "doc_id", rate).count()
        assert abs(got / 20_000 - rate) < 0.01


def test_rerun_stability_and_subset(spark, ids):
    a = {r.doc_id for r in det_sample(ids, "doc_id", 0.2).collect()}
    b = {r.doc_id for r in det_sample(ids, "doc_id", 0.2).collect()}
    assert a == b
    # monotone: a lower rate selects a subset of a higher rate
    c = {r.doc_id for r in det_sample(ids, "doc_id", 0.4).collect()}
    assert a <= c


def test_salt_changes_selection(spark, ids):
    a = {r.doc_id for r in det_sample(ids, "doc_id", 0.2).collect()}
    b = {r.doc_id for r in det_sample(ids, "doc_id", 0.2, salt=99).collect()}
    assert a != b and abs(len(b) - len(a)) < 600


def test_rate_bounds(spark, ids):
    with pytest.raises(ValueError):
        det_sample(ids, "doc_id", 1.5)
    assert det_sample(ids, "doc_id", 0.0).count() == 0


def test_stratified_rates(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("xx").alias("lang"),
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.1}, default_rate=1.0)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["xx"] == 5000
    assert abs(counts["en"] / 5000 - 0.1) < 0.02


def test_topk_per_group_ties_deterministic(spark):
    rows = [(i, "g", 100 - (i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score long")
    out = topk_per_group(df, "grp", "score", 5, tie_col="doc_id")
    got = sorted((r.doc_id, r.score) for r in out.collect())
    # score 100 on ids 0,3,6,... -> top-5 = ids 0,3,6,9,12
    assert got == [(0, 100), (3, 100), (6, 100), (9, 100), (12, 100)]


def test_oracle_sql_parity_duckdb(spark, ids):
    import duckdb

    expr = oracle_hash_sql("i")
    duck = duckdb.connect().execute(
        f"SELECT i, {expr} AS b FROM range(2000) t(i)"
    ).fetchall()
    got = {
        r.doc_id: r.b
        for r in ids.where(F.col("doc_id") < 2000)
        .select("doc_id", det_hash_bucket("doc_id").alias("b"))
        .collect()
    }
    assert all(got[i] == b for i, b in duck)
