"""Pipeline graph/sequence operators: near-dup clustering and event
sessionization.

* connected_components — min-label propagation over the dup-pair graph
  (iterative DataFrame joins, O(graph diameter) rounds, checkpointed by
  localCheckpoint to keep lineage bounded). The standard survivor-
  selection step after MinHash/Jaccard pair generation at corpus scale.
* sessionize — classic gap-based sessionization over an event stream
  (window lag + cumulative sum; one shuffle on user_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    min node id reachable. Converges in <= diameter rounds."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' labels and own
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .where(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    edges.unpersist()
    return labels


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the
    gap to the previous event exceeds gap_seconds. One shuffle
    (partition by user); session ids are 1-based per user."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        F.when(prev_ts.isNull(), 1)
        .when(
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds,
            1,
        )
        .otherwise(0)
    )
    return events.withColumn(
        "session_id", F.sum(new_session).over(w).cast("int")
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """(user_id, n_sessions, n_events) rollup."""
    s = sessionize(events, user_col, ts_col, gap_seconds)
    return s.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events")
    )
