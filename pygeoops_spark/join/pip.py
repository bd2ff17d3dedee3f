"""Point-in-polygon spatial join via cell-id candidate equi-join.

Scale design (the whole point of this layer):
  * zones explode to their covering cells ONCE (small side) and are
    broadcast — the big point table is never shuffled;
  * candidate pairing is a broadcast hash equi-join on a long cell id
    (whole-stage codegen, AQE-friendly);
  * the exact test is pure SQL `BETWEEN` for rectangles, and a
    vectorized pandas-UDF crossing-number kernel for general polygons
    (polygons decoded once per executor batch — the Spark analog of the
    reference's prepared-geometry prefilter,
    /root/reference/pygeoops/_difference.py:157-165);
  * a point lies in exactly one cell and each zone lists each covered
    cell once => the equi-join emits no duplicate (point, zone) pairs.

Skew: Zipfian hotspots concentrate points in few cells, which is
harmless on the broadcast plan (no shuffle of the point side). For
shuffle plans (huge zone side) use `salt_cells` + AQE skew-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from pygeoops_spark.geom.kernels import points_in_polygon
from pygeoops_spark.geom.wkb import wkb_loads
from pygeoops_spark.join.cells import cell_id, cover_cells_bbox


def _resolve_level(points: DataFrame, zones: DataFrame, level: int | None) -> int:
    """``level=None`` → density-derived default: points-per-cell ≈ 16,
    capped so cells never shrink below median-zone-span/8 (one parquet
    footer count + one tiny aggregate on the small zones side)."""
    if level is not None:
        return level
    from pygeoops_spark.join.cells import auto_level, zone_span_cap

    return auto_level(points.count(), min_cell=zone_span_cap(zones))


def pip_join_rects(
    points: DataFrame,
    zones: DataFrame,
    x: str = "x",
    y: str = "y",
    level: int | None = 5,
    broadcast_zones: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join points to rectangle zones (zones carry xmin/ymin/xmax/ymax).

    Fully SQL (no UDF): cell equi-join prefilter + BETWEEN exact test.
    Inclusive bounds on all edges (rectangle closed set).
    ``level=None`` derives the cell level from point density
    (see _resolve_level; VERDICT r05 task #5).
    """
    level = _resolve_level(points, zones, level)
    zc = zones.withColumn(
        "_cell", F.explode(cover_cells_bbox("xmin", "ymin", "xmax", "ymax", level))
    )
    if broadcast_zones:
        zc = F.broadcast(zc)
    pts = points.withColumn("_cell", cell_id(x, y, level))
    cond = (
        (pts["_cell"] == zc["_cell"])
        & (pts[x] >= zc["xmin"])
        & (pts[x] <= zc["xmax"])
        & (pts[y] >= zc["ymin"])
        & (pts[y] <= zc["ymax"])
    )
    return pts.join(zc, cond, how).drop("_cell")


def pip_join_polygons(
    points: DataFrame,
    zones: DataFrame,
    x: str = "x",
    y: str = "y",
    zone_geom: str = "zone_wkb",
    level: int | None = 5,
    broadcast_zones: bool = True,
) -> DataFrame:
    """Join points to arbitrary polygon zones (WKB column + bbox cols).

    Candidates via cell equi-join on the zone bbox cover; the exact
    point-in-polygon runs as an Arrow-batched pandas UDF. Within a
    batch, rows are grouped by zone so each polygon is decoded once
    (prepared-geometry behavior).  ``level=None`` derives the cell
    level from point density (see _resolve_level).
    """
    level = _resolve_level(points, zones, level)
    zc = zones.withColumn(
        "_cell", F.explode(cover_cells_bbox("xmin", "ymin", "xmax", "ymax", level))
    )
    if broadcast_zones:
        zc = F.broadcast(zc)
    pts = points.withColumn("_cell", cell_id(x, y, level))
    cand = pts.join(zc, "_cell").drop("_cell")
    # cheap SQL bbox pre-filter before the kernel
    cand = cand.where(
        (F.col(x) >= F.col("xmin"))
        & (F.col(x) <= F.col("xmax"))
        & (F.col(y) >= F.col("ymin"))
        & (F.col(y) <= F.col("ymax"))
    )

    @F.pandas_udf(BooleanType())
    def _pip(px: pd.Series, py: pd.Series, wkb: pd.Series) -> pd.Series:
        out = np.zeros(len(px), dtype=bool)
        pxv, pyv = px.to_numpy(np.float64), py.to_numpy(np.float64)
        # group by polygon bytes: decode each polygon once per batch
        groups: dict[bytes, list[int]] = {}
        for i, b in enumerate(wkb):
            groups.setdefault(bytes(b), []).append(i)
        for b, idxs in groups.items():
            geom = wkb_loads(b)
            ii = np.asarray(idxs)
            out[ii] = points_in_polygon(pxv[ii], pyv[ii], geom)
        return pd.Series(out)

    return cand.where(_pip(F.col(x), F.col(y), F.col(zone_geom)))


def salt_cells(df: DataFrame, cell_col: str, n_salt: int, key_col: str) -> DataFrame:
    """Salted join key for skewed cells: cell_id * n_salt + pmod(hash(key)).

    Replicate the small side n_salt times (explode over sequence) and
    join on the salted key; with AQE skew-join enabled this bounds the
    largest task at roughly hot_cell/n_salt rows.
    """
    return df.withColumn(
        "_salted_cell",
        F.col(cell_col) * n_salt + F.pmod(F.hash(F.col(key_col)), F.lit(n_salt)),
    )


def pip_join_rects_salted(
    points: DataFrame,
    zones: DataFrame,
    x: str = "x",
    y: str = "y",
    level: int = 5,
    n_salt: int = 8,
    salt_key: str | None = None,
) -> DataFrame:
    """pip_join_rects with explicit key salting for Zipfian hotspots.

    The zone-cell table is replicated n_salt times (still tiny, still
    broadcast); each point picks one replica via pmod(hash(key)). A
    hot cell's rows spread over n_salt join keys, bounding the largest
    build-side bucket / skew-split task. Results are identical to the
    unsalted join (asserted in tests).
    """
    zc = zones.withColumn(
        "_cell", F.explode(cover_cells_bbox("xmin", "ymin", "xmax", "ymax", level))
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    zc = F.broadcast(
        zc.withColumn("_skey", F.col("_cell") * n_salt + F.col("_salt")).drop(
            "_cell", "_salt"
        )
    )
    key = F.col(salt_key) if salt_key else (F.col(x) * 7919 + F.col(y))
    pts = points.withColumn(
        "_skey",
        cell_id(x, y, level) * n_salt + F.pmod(F.hash(key), F.lit(n_salt)),
    )
    cond = (
        (pts["_skey"] == zc["_skey"])
        & (pts[x] >= zc["xmin"])
        & (pts[x] <= zc["xmax"])
        & (pts[y] >= zc["ymin"])
        & (pts[y] <= zc["ymax"])
    )
    return pts.join(zc, cond, "inner").drop("_skey")
