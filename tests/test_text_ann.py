"""Tests for the training-data pipeline ops (dedup/similarity/quality/
ANN/multimodal) on the driver testdata."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_exact_dedup(docs):
    from pygeoops_spark.text.dedup import exact_dedup

    out = exact_dedup(docs)
    n = docs.count()
    assert out.agg(F.sum("dup_count")).first()[0] == n
    # distinct texts in this corpus -> every group is a singleton
    assert out.count() == docs.select("text").distinct().count()


def test_jaccard_pairs_sanity(docs):
    from pygeoops_spark.text.dedup import jaccard_pairs

    pairs = jaccard_pairs(docs, n=3, threshold=0.1).collect()
    assert all(0.1 <= r["jaccard"] <= 1.0 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_minhash_lsh_finds_high_jaccard_pairs(docs):
    from pygeoops_spark.text.dedup import jaccard_pairs, minhash_lsh_pairs

    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, n=3, threshold=0.6).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.6).collect()
    }
    # verification step guarantees no false positives
    assert lsh <= {
        (r["id_a"], r["id_b"]) for r in jaccard_pairs(docs, n=3, threshold=0.6).collect()
    }
    # recall at j>=0.6 with 8 bands x 4 rows: P(miss) = (1-j^4)^8 < 22%
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.5


def test_simhash_pairs(docs):
    from pygeoops_spark.text.dedup import simhash_pairs, simhash_signatures

    sig = simhash_signatures(docs)
    assert sig.count() == docs.count()
    pairs = simhash_pairs(docs, max_hamming=16)
    for r in pairs.take(5):
        assert r["hamming"] <= 16


def test_quality_and_langid(docs):
    from pygeoops_spark.text.quality import langid, quality_features

    q = quality_features(docs)
    row = q.first()
    assert 0.0 <= row["quality_score"] <= 1.0
    assert row["n_words"] > 0
    li = langid(docs)
    preds = li.groupBy("lang_pred").count().collect()
    assert {r["lang_pred"] for r in preds} <= {"en", "es", "de", "fr", "und"}


def test_fingerprint_deterministic(docs):
    from pygeoops_spark.text.quality import doc_fingerprint

    a = docs.select("doc_id", doc_fingerprint("text").alias("fp"))
    b = docs.select("doc_id", doc_fingerprint("text").alias("fp2"))
    j = a.join(b, "doc_id")
    assert j.where(F.col("fp") != F.col("fp2")).count() == 0
    assert a.where(F.col("fp") < 0).count() == 0


def test_ann_bruteforce_and_lsh_recall(emb):
    from pygeoops_spark.ann.cosine import cosine_topk_bruteforce, cosine_topk_lsh

    queries = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(queries, emb, k=5)
    assert exact.groupBy("query_id").count().where(F.col("count") != 5).count() == 0
    got = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    lsh = cosine_topk_lsh(queries, emb, k=5)
    found = {(r["query_id"], r["neighbor_id"]) for r in lsh.collect()}
    assert len(found & got) / len(got) >= 0.3  # approximate, bounded below


def test_ann_ivf_recall(emb):
    from pygeoops_spark.ann.cosine import cosine_topk_bruteforce, cosine_topk_ivf

    queries = emb.where(F.col("vec_id") < 20)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk_bruteforce(queries, emb, k=5).collect()}
    ivf = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk_ivf(queries, emb, k=5, n_cells=8, nprobe=4).collect()}
    assert len(ivf & exact) / len(exact) >= 0.3


def test_media_features(spark):
    from pygeoops_spark.text.multimodal import extract_features, frame_sample_plan, synth_media

    media = synth_media(spark, 300)
    feats = extract_features(media, dim=8)
    rows = feats.take(3)
    assert all(len(r["feature"]) == 8 for r in rows)
    assert feats.count() == 300
    plan = frame_sample_plan(media, every_ms=10000)
    assert plan.count() > 0
    assert plan.where(F.col("frame_ts_ms") % 10000 != 0).count() == 0
