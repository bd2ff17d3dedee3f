"""Distributed difference / subdivide operators.

Scale design (reference semantics from _difference.py re-expressed on
Spark primitives):
  * the subtrahend set is broadcast once per executor (sc.broadcast of
    WKB bytes) — the analog of the reference's prepared-geometry reuse;
  * per-row scalar pandas UDFs run the numpy kernels over Arrow batches;
  * the tiled variant explodes a geometry into subdivision tiles
    (rows), repartitions on tile id (this IS the reference's
    ThreadPoolExecutor, but elastic), differences per tile, and unions
    back with groupBy().applyInPandas — two shuffles total, both on
    compact ids.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, DoubleType, IntegerType, StructField, StructType

from pygeoops_spark.geom.difference import difference_all
from pygeoops_spark.geom.general import subdivide as subdivide_kernel
from pygeoops_spark.geom.overlay import polygon_union
from pygeoops_spark.geom.wkb import wkb_dumps, wkb_loads


def difference_all_col(
    wkb_col: Column | str,
    subtrahend_wkbs: list[bytes],
    keep_geom_type: bool | int = False,
) -> Column:
    """Subtract a broadcast set of polygons from each row's geometry."""
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    subs_bytes = list(subtrahend_wkbs)

    @F.pandas_udf(BinaryType())
    def _ud(wkbs: pd.Series) -> pd.Series:
        subs = [wkb_loads(b) for b in subs_bytes]  # decode once per batch
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            r = difference_all(
                wkb_loads(bytes(b)), subs, keep_geom_type=keep_geom_type, check_intersects=True
            )
            out.append(wkb_dumps(r) if r is not None else None)
        return pd.Series(out)

    return _ud(wkb_col)


def subdivide_col(wkb_col: Column | str, num_coords_max: int = 1000) -> Column:
    """Array of subdivision tiles (WKB) per row — explode downstream to
    fan out; this is how a huge geometry becomes partition-parallel."""
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col

    @F.pandas_udf(ArrayType(BinaryType()))
    def _ud(wkbs: pd.Series) -> pd.Series:
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            parts = subdivide_kernel(wkb_loads(bytes(b)), num_coords_max)
            out.append([wkb_dumps(p) for p in parts])
        return pd.Series(out)

    return _ud(wkb_col)


def area_col(wkb_col: Column | str) -> Column:
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col

    @F.pandas_udf(DoubleType())
    def _ud(wkbs: pd.Series) -> pd.Series:
        from pygeoops_spark.geom.kernels import polygon_area

        return pd.Series(
            [0.0 if b is None else polygon_area(wkb_loads(bytes(b))) for b in wkbs]
        )

    return _ud(wkb_col)


def num_rings_col(wkb_col: Column | str) -> Column:
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col

    @F.pandas_udf(IntegerType())
    def _ud(wkbs: pd.Series) -> pd.Series:
        from pygeoops_spark.geom.wkb import POLYGON, get_parts

        out = []
        for b in wkbs:
            if b is None:
                out.append(0)
                continue
            g = wkb_loads(bytes(b))
            out.append(sum(len(p.data) for p in get_parts(g) if p.type_id == POLYGON))
        return pd.Series(out)

    return _ud(wkb_col)


def difference_all_tiled_distributed(
    df: DataFrame,
    id_col: str,
    wkb_col: str,
    subtrahend_wkbs: list[bytes],
    keep_geom_type: bool | int = False,
    subdivide_coords: int = 1000,
) -> DataFrame:
    """Distributed difference_all_tiled over a table of geometries.

    subdivide-explode (fan out) -> repartition(tile) -> per-tile
    difference kernel -> groupBy(id).applyInPandas(union). Output:
    (id_col, result_wkb).
    """
    tiles = (
        df.select(id_col, F.explode(subdivide_col(wkb_col, subdivide_coords)).alias("_tile"))
        .repartition(F.col(id_col), F.col("_tile"))
    )
    diffed = tiles.select(
        id_col,
        difference_all_col("_tile", subtrahend_wkbs, keep_geom_type).alias("_diff"),
    ).where(F.col("_diff").isNotNull())

    schema = StructType(
        [
            StructField(id_col, diffed.schema[id_col].dataType),
            StructField("result_wkb", BinaryType()),
        ]
    )

    def union_group(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [wkb_loads(bytes(b)) for b in pdf["_diff"] if b is not None]
        if not geoms:
            return pd.DataFrame(columns=[id_col, "result_wkb"])
        u = polygon_union(geoms) if len(geoms) > 1 else geoms[0]
        return pd.DataFrame(
            {id_col: [pdf[id_col].iloc[0]], "result_wkb": [wkb_dumps(u) if u else None]}
        )

    return diffed.groupBy(id_col).applyInPandas(union_group, schema)
