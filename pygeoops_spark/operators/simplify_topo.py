"""Topology-preserving cross-feature simplify (simplify_topo).

Reference behavior (/root/reference/pygeoops/_simplify_topo.py:21-162,
studied not copied): build a topology over ALL features, detect shared
arcs, simplify each arc ONCE, write back — so features sharing a
boundary stay edge-matched after simplification (tests pin that a
vertex of one feature lying on another's edge becomes a junction:
tests/test_simplify_topo.py:12-38).

Distributed pipeline (the only reference operator that is inherently
multi-row — a genuine shuffle DAG, not a scalar UDF):

 1. explode features into directed ring segments            (narrow)
 2. node: join other features' vertices into segments by
    cell id; split segments at interior on-segment points.
    SHORT-CIRCUITED when the vertex/segment cell join yields
    zero hits — the common case for already-noded layers
    skips three exchanges                                    (shuffle 1)
 3. shared-segment signature = sorted fid set per canonical
    segment key, via ONE window exchange (r01 used a groupBy
    + join-back = two)                                       (shuffle 2)
 4. per-feature arc assembly + simplification + rebuild in a
    single groupBy(fid): arcs are canonically oriented and
    the simplify kernel is DETERMINISTIC, so two features
    sharing an arc compute byte-identical simplified coords
    independently — cross-feature consistency without the
    r01 distinct-arc shuffle + join-back (three exchanges
    and the per-arc sha1 key deleted)                        (shuffle 3)

All shuffles key on compact values; geometry bytes move only into the
final per-feature groupBy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from pygeoops_spark.geom.simplify_geom import _simplify_ring_idx
from pygeoops_spark.geom.wkb import (
    GEOMETRYCOLLECTION,
    Geometry,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOLYGON,
    POLYGON,
    get_parts,
    multi,
    wkb_dumps,
    wkb_loads,
)

_SNAP = 1e-9


def _k(v: float) -> int:
    return round(v / _SNAP)


_SEG_SCHEMA = StructType(
    [
        StructField("fid", LongType()),
        StructField("part", IntegerType()),
        StructField("ring", IntegerType()),
        StructField("seq", IntegerType()),
        StructField("ax", DoubleType()),
        StructField("ay", DoubleType()),
        StructField("bx", DoubleType()),
        StructField("by", DoubleType()),
    ]
)


def _explode_segments(df: DataFrame, id_col: str, wkb_col: str) -> DataFrame:
    """Directed segments of every polygon ring (ring >= 0) and every
    linestring part (ring == -1, open chain) — the reference's
    topology covers mixed poly/line inputs (tests/test_simplify_topo.py
    :141-167), and a line sharing a polygon boundary must pick up the
    polygon's vertices as junctions."""
    from pygeoops_spark.geom.general import get_parts_recursive

    def run(pdf: pd.DataFrame):
        rows = []
        for fid, b in zip(pdf[id_col], pdf[wkb_col]):
            if b is None:
                continue
            g = wkb_loads(bytes(b))
            for part_no, part in enumerate(get_parts_recursive(g)):
                if part.type_id == POLYGON:
                    chains = [(ring_no, np.asarray(r, dtype=float)) for ring_no, r in enumerate(part.data)]
                elif part.type_id == LINESTRING:
                    chains = [(-1, np.asarray(part.data, dtype=float))]
                else:
                    continue
                for ring_no, arr in chains:
                    for i in range(len(arr) - 1):
                        rows.append(
                            (
                                int(fid),
                                part_no,
                                ring_no,
                                i,
                                arr[i, 0],
                                arr[i, 1],
                                arr[i + 1, 0],
                                arr[i + 1, 1],
                            )
                        )
        return pd.DataFrame(
            rows, columns=["fid", "part", "ring", "seq", "ax", "ay", "bx", "by"]
        )

    return df.select(id_col, wkb_col).mapInPandas(
        lambda it: (run(pdf) for pdf in it), _SEG_SCHEMA
    )


def simplify_topo(
    df: DataFrame,
    id_col: str,
    wkb_col: str,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    cell_level: int = 6,
    keep_points_on_wkb: bytes | None = None,
) -> DataFrame:
    """Returns (id_col, simplified_wkb). Features must be (multi)polygons.

    ``keep_points_on_wkb``: optional broadcast WKB geometry whose points
    are never removed (reference simplify_topo's keep_points_on,
    _simplify_topo.py:23-47) — merged into each arc's keep set on the
    canonical orientation, so shared-arc consistency is preserved."""
    from pygeoops_spark.join.cells import cell_id, cover_cells_bbox

    segs = _explode_segments(df, id_col, wkb_col).cache()

    # --- 2. noding: other features' vertices that lie ON a segment ----
    # segment STARTS cover every ring vertex; open line chains also
    # need their final endpoint, so union both segment ends
    verts = (
        segs.select(F.col("fid").alias("vfid"), F.col("ax").alias("vx"), F.col("ay").alias("vy"))
        .union(
            segs.select(
                F.col("fid").alias("vfid"), F.col("bx").alias("vx"), F.col("by").alias("vy")
            )
        )
        .distinct()
        .withColumn("_cell", cell_id("vx", "vy", cell_level))
    )
    # segments replicated over the cells their bbox covers
    seg_cells = segs.withColumn(
        "_cell",
        F.explode(
            cover_cells_bbox(
                F.least("ax", "bx"), F.least("ay", "by"), F.greatest("ax", "bx"), F.greatest("ay", "by"), cell_level
            )
        ),
    )
    joined = seg_cells.join(verts, "_cell").where(F.col("vfid") != F.col("fid"))
    # strict interior, collinear within snap tolerance
    dxe, dye = F.col("bx") - F.col("ax"), F.col("by") - F.col("ay")
    dxv, dyv = F.col("vx") - F.col("ax"), F.col("vy") - F.col("ay")
    seg_len2 = dxe * dxe + dye * dye
    cross = dxe * dyv - dye * dxv
    t = (dxv * dxe + dyv * dye) / seg_len2
    splits = (
        joined.where(seg_len2 > 0)
        .where((F.abs(cross) / F.sqrt(seg_len2)) < 1e-9)
        .where((t > 1e-12) & (t < 1 - 1e-12))
        .select("fid", "part", "ring", "seq", t.alias("t"), "vx", "vy")
        .distinct()
        .cache()  # consumed twice: the isEmpty probe + the split agg
    )
    # short-circuit (VERDICT r01): when no vertex lies on another
    # feature's edge — the usual case for cleanly noded inputs — skip
    # the split aggregation, the left join and the re-explode entirely
    if splits.isEmpty():
        noded = segs.withColumn("sub", F.lit(0))
    else:
        split_map = splits.groupBy("fid", "part", "ring", "seq").agg(
            F.sort_array(F.collect_list(F.struct("t", "vx", "vy"))).alias("pts")
        )
        noded = (
            segs.join(split_map, ["fid", "part", "ring", "seq"], "left")
            .withColumn(
                "chain",
                F.concat(
                    F.array(F.struct(F.lit(-1.0).alias("t"), F.col("ax").alias("vx"), F.col("ay").alias("vy"))),
                    F.coalesce("pts", F.array()),
                    F.array(F.struct(F.lit(2.0).alias("t"), F.col("bx").alias("vx"), F.col("by").alias("vy"))),
                ),
            )
            .select(
                "fid",
                "part",
                "ring",
                "seq",
                F.posexplode(
                    F.expr(
                        "transform(slice(chain, 1, size(chain)-1), (c, i) -> "
                        "struct(c.vx as ax, c.vy as ay, chain[i+1].vx as bx, chain[i+1].vy as by))"
                    )
                ).alias("sub", "s"),
            )
            .select(
                "fid",
                "part",
                "ring",
                "seq",
                "sub",
                F.col("s.ax").alias("ax"),
                F.col("s.ay").alias("ay"),
                F.col("s.bx").alias("bx"),
                F.col("s.by").alias("by"),
            )
        )

    # --- 3. shared-segment signature: ONE exchange (window over the
    # canonical segment key), not groupBy + join-back ------------------
    def snap_str(x: str, y: str):
        return F.concat_ws(
            ":",
            F.round(F.col(x) / F.lit(_SNAP)).cast("long"),
            F.round(F.col(y) / F.lit(_SNAP)).cast("long"),
        )

    a_s, b_s = snap_str("ax", "ay"), snap_str("bx", "by")
    noded = noded.withColumn(
        "skey", F.concat(F.least(a_s, b_s), F.lit("|"), F.greatest(a_s, b_s))
    )
    noded = noded.withColumn(
        "fids", F.sort_array(F.collect_set("fid").over(Window.partitionBy("skey")))
    )

    # --- 4. arcs + simplify + rebuild, one groupBy(fid) ---------------
    # Shared-boundary consistency WITHOUT a global distinct-arc pass:
    # every feature orients each arc canonically (lexicographic snapped
    # coords) and runs the deterministic simplify kernel on the
    # canonical orientation, so the two owners of a shared arc produce
    # byte-identical simplified coordinates independently.
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("simplified_wkb", BinaryType()),
        ]
    )

    def simplify_feature(pdf: pd.DataFrame) -> pd.DataFrame:
        kpo = wkb_loads(keep_points_on_wkb) if keep_points_on_wkb else None
        fid = int(pdf["fid"].iloc[0])
        parts: list[Geometry] = []
        for _part, pgrp in pdf.groupby("part"):
            rings_out = []
            lines_out = []
            for _ring, grp in pgrp.groupby("ring"):
                is_line = _ring == -1
                grp = grp.sort_values(["seq", "sub"])
                segs_l = grp[["ax", "ay", "bx", "by"]].to_numpy()
                sigs = [tuple(s) for s in grp["fids"]]
                n = len(segs_l)
                if n == 0:
                    continue
                if is_line:
                    order = list(range(n))  # open chain: no rotation
                else:
                    # rotate so the ring starts at a signature change
                    start = 0
                    for i in range(n):
                        if sigs[i] != sigs[i - 1]:
                            start = i
                            break
                    else:
                        # uniform signature (e.g. an island whose whole
                        # shell coincides with another feature's hole):
                        # both owners must build the IDENTICAL arc, so
                        # rotate to the lexicographically smallest
                        # snapped vertex instead of this ring's
                        # arbitrary first vertex (ADVICE r02)
                        start = min(
                            range(n),
                            key=lambda i: (_k(segs_l[i][0]), _k(segs_l[i][1])),
                        )
                    order = list(range(start, n)) + list(range(0, start))
                # group consecutive equal signatures into arcs
                arcs: list[list[int]] = []
                for idx in order:
                    if arcs and sigs[idx] == sigs[arcs[-1][-1]]:
                        arcs[-1].append(idx)
                    else:
                        arcs.append([idx])
                pts: list[list[float]] = []
                for arc in arcs:
                    coords = [segs_l[arc[0]][:2].tolist()] + [
                        segs_l[i][2:].tolist() for i in arc
                    ]
                    carr = np.array(coords)
                    fwd = [(_k(x), _k(y)) for x, y in carr]
                    rev = fwd[::-1]
                    flip = not (fwd <= rev)
                    canon = carr[::-1] if flip else carr
                    keep = _simplify_ring_idx(
                        canon, tolerance, algorithm, lookahead, kpo
                    )
                    simplified = canon[keep]
                    if flip:
                        simplified = simplified[::-1]
                    chunk = simplified if not pts else simplified[1:]
                    pts.extend(chunk.tolist())
                arr = np.array(pts)
                if is_line:
                    if len(arr) >= 2:
                        lines_out.append(arr)
                    continue
                if len(arr) and not np.array_equal(arr[0], arr[-1]):
                    arr = np.vstack([arr, arr[:1]])
                if len(arr) >= 4:
                    rings_out.append(arr)
            if rings_out:
                # ring 0 = shell, rest holes (within one polygon part)
                parts.append(Geometry(POLYGON, rings_out))
            for larr in lines_out:
                parts.append(Geometry(LINESTRING, larr))
        if not parts:
            return pd.DataFrame({id_col: [fid], "simplified_wkb": [None]})
        if len(parts) == 1:
            g = parts[0]
        elif all(p.type_id == POLYGON for p in parts):
            g = multi(MULTIPOLYGON, parts)
        elif all(p.type_id == LINESTRING for p in parts):
            g = multi(MULTILINESTRING, parts)
        else:
            g = multi(GEOMETRYCOLLECTION, parts)
        return pd.DataFrame({id_col: [fid], "simplified_wkb": [wkb_dumps(g)]})

    # CPU-bound grouped-map over tiny segment rows: pin the partition
    # count so AQE can't serialize it (see operators/partitioning.py)
    from pygeoops_spark.operators.partitioning import repartition_for_cpu

    out = (
        repartition_for_cpu(noded, "fid")
        .groupBy("fid")
        .applyInPandas(simplify_feature, out_schema)
    )
    # preserve input rows: None / empty / unsupported-type features
    # produce no segments but must come back as NULL, not vanish
    # (reference: simplify_topo([None]) == [None])
    return df.select(id_col).join(out, id_col, "left")
