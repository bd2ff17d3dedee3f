"""BBox / range join: pairs of rectangles whose extents overlap.

Candidates via cell-cover equi-join at a coarse level (each side lists
covered cells; pairs sharing a cell are candidates), then the exact
interval-overlap predicate. Because a pair can share several cells,
candidates are de-duplicated by assigning each pair to the *smallest*
shared cell: the pair is kept only where the joined cell equals the
top-left-most cell of the overlap region of the two bboxes — a standard
trick that keeps the join purely distributed with no distinct shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pygeoops_spark.join.cells import cell_coord, cover_cells_bbox


def bbox_join(
    left: DataFrame,
    right: DataFrame,
    level: int = 3,
    suffix: str = "_r",
    broadcast_right: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Overlap join of two rectangle tables (xmin/ymin/xmax/ymax each).

    Right columns are suffixed. Touching edges count as overlap
    (inclusive comparisons), matching interval-overlap SQL semantics.
    """
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, c + suffix)
    lc = left.withColumn("_cell", F.explode(cover_cells_bbox("xmin", "ymin", "xmax", "ymax", level)))
    rc = r.withColumn(
        "_cell",
        F.explode(
            cover_cells_bbox(f"xmin{suffix}", f"ymin{suffix}", f"xmax{suffix}", f"ymax{suffix}", level)
        ),
    )
    if broadcast_right:
        rc = F.broadcast(rc)
    n = 1 << level
    joined = lc.join(rc, "_cell", how)
    overlap = (
        (F.col("xmin") <= F.col(f"xmax{suffix}"))
        & (F.col(f"xmin{suffix}") <= F.col("xmax"))
        & (F.col("ymin") <= F.col(f"ymax{suffix}"))
        & (F.col(f"ymin{suffix}") <= F.col("ymax"))
    )
    # de-dup: keep the pair only in the min shared cell = cell of the
    # overlap region's (min x, min y) corner
    ox = F.greatest(F.col("xmin"), F.col(f"xmin{suffix}"))
    oy = F.greatest(F.col("ymin"), F.col(f"ymin{suffix}"))
    min_shared = cell_coord(ox, level) * n + cell_coord(oy, level)
    return joined.where(overlap & (F.col("_cell") == min_shared)).drop("_cell")
