"""kNN join via cell-ring expansion + window top-k.

Scale design: probes generate the (2r+1)^2 cell neighborhood (pure SQL
array + explode — no UDF), equi-join against target cell ids, then a
window `row_number() <= k` partitioned by probe. The shuffle keys are
cell ids (candidate join) and probe ids (top-k) — both well distributed
when salting is applied to hotspots; AQE skew-join covers the rest.

Exactness: ring radius r is exact iff the k-th neighbor lies within
r * cell_size Chebyshev distance of the probe's cell; `knn_join`
optionally verifies via a guaranteed lower bound and re-queries
stragglers at a doubled radius (driver-side loop over a shrinking
probe set — the distributed analog of iterative ring expansion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pygeoops_spark.join.cells import cell_id, cell_size, ring_cells


def knn_join(
    probes: DataFrame,
    targets: DataFrame,
    probe_key: str,
    target_key: str,
    k: int,
    level: int | None = 3,
    radius: int = 2,
    px: str = "x",
    py: str = "y",
    tx: str = "x",
    ty: str = "y",
    broadcast_targets: bool = True,
    guarantee_exact: bool = False,
    _caches: list | None = None,
) -> DataFrame:
    """Top-k nearest targets per probe (Euclidean), deterministic
    tie-break on target key. Output: probe columns + target_key + dist + knn_rank.

    Cache lifecycle (guarantee_exact): every radius-doubling level
    persists its probes x k `ranked` frame for the exactness check; the
    TOP-level call eagerly localCheckpoints the final union and then
    unpersists every level's cache, so repeated exact kNN joins in a
    long session no longer accumulate storage (the checkpoint itself is
    GC-cleaned with the returned DataFrame).
    """
    n_targets = None
    if level is None:
        from pygeoops_spark.join.cells import auto_level_knn

        n_targets = targets.count()
        level = auto_level_knn(n_targets, k, radius)
    top_level = _caches is None
    if _caches is None:
        _caches = []

    # Brute-force escape (r07, guide §1.2 "remove unnecessary passes"):
    # when the target table is no bigger than the initial ring's own
    # capacity (k targets per cell x (2r+1)^2 cells — the occupancy
    # auto_level_knn aims the ring at), cell pruning cannot drop more
    # than a small constant factor of candidates per probe, while the
    # exactness machinery still costs a persist, a kth-distance
    # aggregate, an isEmpty() action and possibly whole re-join passes
    # at doubled radius PER LEVEL. The broadcast cross join computes
    # the identical top-k (same distance expression, same tie-break)
    # in one window pass regardless of probe count, so the trade is
    # probe-scale-independent. Only taken under guarantee_exact —
    # without it the ring join's approximate candidate set is the
    # documented semantics and must stay.
    if top_level and guarantee_exact:
        if n_targets is None:
            n_targets = targets.count()
        if n_targets <= k * (2 * radius + 1) ** 2:
            return knn_join_bruteforce(
                probes, targets, probe_key, target_key, k,
                px=px, py=py, tx=tx, ty=ty,
            )

    def _finish(df: DataFrame) -> DataFrame:
        if top_level and _caches:
            df = df.localCheckpoint(eager=True)
            for c in _caches:
                c.unpersist()
        return df
    t = targets.select(
        F.col(target_key).alias("_tkey"),
        F.col(tx).alias("_tx"),
        F.col(ty).alias("_ty"),
        cell_id(tx, ty, level).alias("_cell"),
    )
    if broadcast_targets:
        t = F.broadcast(t)

    p = probes.withColumn("_cell", F.explode(ring_cells(px, py, level, radius)))
    cand = p.join(t, "_cell").drop("_cell")
    dx, dy = F.col(px) - F.col("_tx"), F.col(py) - F.col("_ty")
    # dx*dx (not pow) so the doubles are bit-identical to the SQL oracle
    dist = F.sqrt(dx * dx + dy * dy).alias("dist")
    nn_col = target_key + "_nn"
    w = Window.partitionBy(probe_key).orderBy(F.col("dist").asc(), F.col(nn_col).asc())
    ranked = (
        cand.select(*probes.columns, F.col("_tkey").alias(nn_col), dist)
        .withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )
    if not guarantee_exact:
        return _finish(ranked)
    if radius >= (1 << level):
        # the ring already covers the whole grid: candidates were ALL
        # targets, so `ranked` is exact (probes still short of k rows
        # genuinely have fewer than k targets in existence)
        return _finish(ranked)
    # Exactness check: k-th distance must be <= the guaranteed covered
    # radius (radius * cell_size, the inradius of the ring box from the
    # probe's own cell). Probes failing it re-run with doubled radius.
    # `ranked` is persisted first: it is only probes x k rows (the
    # candidate explosion and window are already reduced), but the
    # check's isEmpty() action and the final output would otherwise
    # both recompute that expensive plan from scratch. The handle is
    # collected in _caches and unpersisted by the top-level _finish
    # once the final result is checkpointed.
    from pyspark import StorageLevel

    ranked = ranked.persist(StorageLevel.MEMORY_AND_DISK)
    _caches.append(ranked)
    safe = float(radius) * cell_size(level)
    kth = ranked.groupBy(probe_key).agg(
        F.max("dist").alias("_kth"), F.count("*").alias("_n")
    )
    bad = kth.where((F.col("_kth") > safe) | (F.col("_n") < k)).select(probe_key)
    # probes whose initial ring held ZERO candidates never appear in
    # `ranked`/`kth` at all — they are also inexact and must be
    # re-queried at the doubled radius (ADVICE r01)
    missing = probes.select(probe_key).join(
        kth.select(probe_key), probe_key, "left_anti"
    )
    bad = bad.unionByName(missing)
    if bad.isEmpty():
        return _finish(ranked)
    good = ranked.join(bad, probe_key, "left_anti")
    redo = probes.join(bad, probe_key, "left_semi")
    return _finish(good.unionByName(
        knn_join(
            redo,
            targets,
            probe_key,
            target_key,
            k,
            level=level,
            radius=radius * 2,
            px=px,
            py=py,
            tx=tx,
            ty=ty,
            broadcast_targets=broadcast_targets,
            guarantee_exact=True,
            _caches=_caches,
        )
    ))


def knn_join_bruteforce(
    probes: DataFrame,
    targets: DataFrame,
    probe_key: str,
    target_key: str,
    k: int,
    px: str = "x",
    py: str = "y",
    tx: str = "x",
    ty: str = "y",
) -> DataFrame:
    """Exact baseline: broadcast cross join + window. Only for small
    target sets / correctness oracles."""
    t = F.broadcast(
        targets.select(
            F.col(target_key).alias("_tkey"), F.col(tx).alias("_tx"), F.col(ty).alias("_ty")
        )
    )
    cand = probes.crossJoin(t)
    dx, dy = F.col(px) - F.col("_tx"), F.col(py) - F.col("_ty")
    dist = F.sqrt(dx * dx + dy * dy).alias("dist")
    nn_col = target_key + "_nn"
    w = Window.partitionBy(probe_key).orderBy(F.col("dist").asc(), F.col(nn_col).asc())
    return (
        cand.select(*probes.columns, F.col("_tkey").alias(nn_col), dist)
        .withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )
