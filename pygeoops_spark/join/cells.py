"""Quadkey-style hierarchical cell index over planar coordinates.

A from-scratch H3/S2 stand-in suited to the synthetic planar corpus:
the world is a fixed square, level L divides it into 2^L x 2^L cells,
and ``cell_id = ix * 2^L + iy``. Everything is integer arithmetic on
columns — Catalyst keeps it inside whole-stage codegen, the ids join as
plain longs, and range-partitioning by id gives spatial locality
(row-major space-filling order; a Z-order interleave is available for
locality-sensitive bucketing).

At 100 TB scale this is the partitioning backbone: cell ids are the
shuffle keys for spatial joins and (prefix at a coarser level) the
Iceberg partition values, so filters on cells prune files before any
geometry work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# World bounds for the synthetic planar corpus: [0, 1024)^2 so cell
# sizes are exact binary fractions (no float drift between engines).
WORLD_MIN = 0.0
WORLD_SIZE = 1024.0


def cell_size(level: int) -> float:
    return WORLD_SIZE / (1 << level)


def auto_level(
    n_points: int,
    points_per_cell: float = 16.0,
    lo: int = 1,
    hi: int = 12,
    min_cell: float | None = None,
) -> int:
    """Density-derived default cell level (VERDICT r05 task #5).

    Picks L so the grid holds ~``points_per_cell`` points per cell
    (4^L ≈ n / ppc): candidate blowup per covered cell stays bounded
    while the broadcast cover stays coarse.  The level grows with
    log4(n), which is exactly the scaling you want at 100 TB — and it
    reproduces the hand-tuned level 5 for the driver's 15k-point /
    64-zone PIP shape.  ``min_cell`` (e.g. median zone span / 8) caps
    the refinement so tiny cells never explode a zone's cover.
    """
    import math

    raw = 0.5 * math.log2(max(1.0, n_points / points_per_cell))
    level = int(round(raw))
    if min_cell is not None and min_cell > 0:
        cap = int(math.floor(math.log2(max(1.0, WORLD_SIZE / min_cell))))
        level = min(level, cap)
    return max(lo, min(hi, level))


def auto_level_knn(
    n_targets: int, k: int, radius: int, lo: int = 0, hi: int = 12
) -> int:
    """Coarsest level whose initial (2r+1)^2 ring window holds ≥ k
    targets in expectation (4^L ≤ n_targets*(2r+1)^2/k, floored) —
    too-fine grids multiply whole-join ring-expansion passes."""
    import math

    w = (2 * radius + 1) ** 2
    raw = 0.5 * math.log2(max(1.0, n_targets * w / max(1, k)))
    return max(lo, min(hi, int(raw)))


def zone_span_cap(zones, xmin: str = "xmin", xmax: str = "xmax") -> float:
    """Median zone x-span / 8 — the ``min_cell`` cap for auto_level.
    One tiny aggregate on the (small, broadcast-side) zones frame."""
    row = zones.select(
        F.percentile_approx(F.col(xmax) - F.col(xmin), 0.5).alias("m")
    ).first()
    span = float(row["m"] or 0.0)
    return span / 8.0 if span > 0 else 0.0


def cell_coord(v: Column | str, level: int) -> Column:
    """Integer cell coordinate along one axis, clamped to the world."""
    v = F.col(v) if isinstance(v, str) else v
    n = 1 << level
    s = cell_size(level)
    ix = F.floor((v - F.lit(WORLD_MIN)) / F.lit(s)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), ix))


def cell_id(x: Column | str, y: Column | str, level: int) -> Column:
    """Row-major cell id: ix * 2^level + iy (pure SQL, codegen-able)."""
    n = 1 << level
    return cell_coord(x, level) * F.lit(n) + cell_coord(y, level)


def cover_cells_bbox(
    xmin: Column | str, ymin: Column | str, xmax: Column | str, ymax: Column | str, level: int
) -> Column:
    """Array of cell ids intersecting an axis-aligned bbox.

    Pure SQL: sequence() over the ix range cross sequence() over iy via
    nested transform+flatten. Caller explodes the result; each covered
    cell appears exactly once, so an equi-join against point cell ids
    needs no de-dup.
    """
    n = F.lit(1 << level)
    ix0, ix1 = cell_coord(xmin, level), cell_coord(xmax, level)
    iy0, iy1 = cell_coord(ymin, level), cell_coord(ymax, level)
    return F.flatten(
        F.transform(
            F.sequence(ix0, ix1),
            lambda ix: F.transform(F.sequence(iy0, iy1), lambda iy: ix * n + iy),
        )
    )


def ring_cells(x: Column | str, y: Column | str, level: int, radius: int) -> Column:
    """Array of cell ids in the (2r+1)^2 Chebyshev neighborhood of the
    point's cell, clamped to the world — the kNN candidate generator."""
    n = 1 << level
    ix, iy = cell_coord(x, level), cell_coord(y, level)
    lo = F.lit(0)
    hi = F.lit(n - 1)
    ix0, ix1 = F.greatest(lo, ix - radius), F.least(hi, ix + radius)
    iy0, iy1 = F.greatest(lo, iy - radius), F.least(hi, iy + radius)
    return F.flatten(
        F.transform(
            F.sequence(ix0, ix1),
            lambda a: F.transform(F.sequence(iy0, iy1), lambda b: a * F.lit(n) + b),
        )
    )


def parent_cell(cell: Column | str, level: int) -> Column:
    """Parent cell id one level up (row-major ids): halve both axes.
    Pure integer arithmetic — the basis of pyramid rollups where each
    level's aggregate derives from the previous (map-side combinable).
    """
    cell = F.col(cell) if isinstance(cell, str) else cell
    n = 1 << level
    ix = (cell / n).cast("long")
    iy = cell % n
    return (ix / 2).cast("long") * (n // 2) + (iy / 2).cast("long")


def zorder_id(x: Column | str, y: Column | str, level: int) -> Column:
    """Morton/Z-order interleaved id (locality-preserving ordering for
    range-partitioned writes). Bit interleave via SQL shift/mask loop
    unrolled to `level` steps."""
    ix, iy = cell_coord(x, level), cell_coord(y, level)
    z = F.lit(0).cast("long")
    for b in range(level):
        # disjoint bit positions => addition == bitwise or
        z = (
            z
            + F.shiftleft(F.shiftright(ix, b) % 2, 2 * b + 1)
            + F.shiftleft(F.shiftright(iy, b) % 2, 2 * b)
        )
    return z
