"""Geographic kNN join tests: exactness vs brute force, date-line
wrap, poles, and spheroid re-ranking (VERDICT r03 task 7)."""

import math

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pygeoops_spark.join.geo_knn import (
    geo_cell_id,
    geo_ring_cells,
    geodesic_knn_join,
    great_circle_distance_sql,
)


def _brute(spark, probes, targets, probe_key, target_key, k, a=6378137.0):
    t = F.broadcast(
        targets.select(
            F.col(target_key).alias("_tkey"),
            F.col("lon").alias("_tlon"),
            F.col("lat").alias("_tlat"),
        )
    )
    cand = probes.crossJoin(t)
    dist = great_circle_distance_sql(
        F.col("lon"), F.col("lat"), F.col("_tlon"), F.col("_tlat"), a
    ).alias("dist_m")
    nn = target_key + "_nn"
    w = Window.partitionBy(probe_key).orderBy(F.col("dist_m").asc(), F.col(nn).asc())
    return (
        cand.select(*probes.columns, F.col("_tkey").alias(nn), dist)
        .withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


def _points(spark, n, seed, name):
    rng = np.random.default_rng(seed)
    rows = [
        (i, float(lon), float(lat))
        for i, (lon, lat) in enumerate(
            zip(rng.uniform(-180, 180, n), rng.uniform(-89.5, 89.5, n))
        )
    ]
    return spark.createDataFrame(rows, [name, "lon", "lat"])


def test_geo_knn_exact_matches_bruteforce(spark):
    probes = _points(spark, 200, 7, "pid")
    targets = _points(spark, 40, 11, "tid")
    out = geodesic_knn_join(
        probes, targets, "pid", "tid", k=3, level=4, radius=1,
        guarantee_exact=True,
    )
    ref = _brute(spark, probes, targets, "pid", "tid", 3)
    got = {(r["pid"], r["knn_rank"]): r["tid_nn"] for r in out.collect()}
    exp = {(r["pid"], r["knn_rank"]): r["tid_nn"] for r in ref.collect()}
    assert got == exp


def test_geo_knn_dateline_wrap(spark):
    """A probe at lon 179.8 must pick the target across the date line
    (-179.9, ~22 km away) over one on the same side (170, ~1100 km)."""
    probes = spark.createDataFrame([(0, 179.8, 10.0)], ["pid", "lon", "lat"])
    targets = spark.createDataFrame(
        [(1, -179.9, 10.0), (2, 170.0, 10.0), (3, 0.0, 0.0)],
        ["tid", "lon", "lat"],
    )
    out = geodesic_knn_join(
        probes, targets, "pid", "tid", k=2, level=4, radius=1,
        guarantee_exact=True,
    ).collect()
    ranks = {r["knn_rank"]: r["tid_nn"] for r in out}
    assert ranks[1] == 1  # across the date line
    assert ranks[2] == 2
    d1 = [r["dist_m"] for r in out if r["knn_rank"] == 1][0]
    assert d1 == pytest.approx(
        6378137.0 * math.radians(0.3) * math.cos(math.radians(10.0)), rel=1e-3
    )


def test_geo_knn_polar_probe(spark):
    """A probe near the north pole: nearest target is on the OPPOSITE
    longitude but adjacent in great-circle terms (over the pole)."""
    probes = spark.createDataFrame([(0, 10.0, 88.5)], ["pid", "lon", "lat"])
    targets = spark.createDataFrame(
        [(1, -170.0, 88.7), (2, 10.0, 80.0), (3, 60.0, 40.0)],
        ["tid", "lon", "lat"],
    )
    out = geodesic_knn_join(
        probes, targets, "pid", "tid", k=2, level=4, radius=1,
        guarantee_exact=True,
    ).collect()
    ranks = {r["knn_rank"]: r["tid_nn"] for r in out}
    # over-the-pole separation: (90-88.5) + (90-88.7) = 2.8 degrees of
    # arc vs 8.5 degrees to the same-meridian target
    assert ranks[1] == 1
    assert ranks[2] == 2


def test_geo_knn_spheroid_rerank(spark):
    """spheroid=True ranks by the true WGS84 geodesic; validated
    against the vectorized kernel directly."""
    from pygeoops_spark.geom.geodesic import geodesic_inverse

    probes = spark.createDataFrame([(0, 5.0, 45.0)], ["pid", "lon", "lat"])
    tg = [(1, 5.0, 52.2), (2, 13.0, 41.0), (3, -3.0, 40.0), (4, 100.0, -30.0)]
    targets = spark.createDataFrame(tg, ["tid", "lon", "lat"])
    out = geodesic_knn_join(
        probes, targets, "pid", "tid", k=3, level=3, radius=1,
        guarantee_exact=True, spheroid=True,
    ).collect()
    d = {
        t[0]: float(
            geodesic_inverse(np.array([5.0]), np.array([45.0]),
                             np.array([t[1]]), np.array([t[2]]))[0][0]
        )
        for t in tg
    }
    exp_order = sorted(d, key=lambda key: d[key])[:3]
    got_order = [r["tid_nn"] for r in sorted(out, key=lambda r: r["knn_rank"])]
    assert got_order == exp_order
    for r in out:
        assert r["dist_m"] == pytest.approx(d[r["tid_nn"]], rel=1e-9)


def test_geo_ring_cells_covers_own_cell_and_wraps(spark):
    df = spark.createDataFrame(
        [(179.9, 0.1), (-179.9, 0.1), (0.0, 89.9)], ["lon", "lat"]
    )
    rows = df.select(
        geo_cell_id("lon", "lat", 4).alias("own"),
        geo_ring_cells("lon", "lat", 4, 1).alias("ring"),
    ).collect()
    for r in rows:
        assert r["own"] in r["ring"]
    # date-line neighbours share ring cells
    assert set(rows[0]["ring"]) & set(rows[1]["ring"])
    # polar ring is full-wrap: 32 lon cells x 2 rows
    assert len(rows[2]["ring"]) == 64
