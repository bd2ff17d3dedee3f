"""Collection/type-algebra operators.

`collect` is the reference's only aggregation operator
(/root/reference/pygeoops/_general.py:16-91): list of geometries ->
narrowest multitype. Distributed as groupBy().applyInPandas with
map-side-combinable pre-aggregation left to Spark (the WKB payloads
are small relative to the group fan-in; for huge groups use the
two-phase variant: per-partition collect then re-collect).

The scalar ops (collection_extract / get_primitivetype_id /
get_parts_recursive explode / remove_inner_rings / extend_line) are
Arrow-batched pandas UDFs over WKB.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, IntegerType, StructField, StructType

from pygeoops_spark.geom.extend_line import (
    extend_line_by_distance as _extend_dist_kernel,
    extend_line_to_geometry as _extend_geom_kernel,
)
from pygeoops_spark.geom.general import (
    collect as _collect_kernel,
    collection_extract as _extract_kernel,
    get_parts_recursive as _parts_kernel,
    remove_inner_rings as _rings_kernel,
)
from pygeoops_spark.geom.kernels import get_primitivetype_id as _pid_kernel
from pygeoops_spark.geom.wkb import wkb_dumps, wkb_loads


def collect_agg(
    df: DataFrame, group_cols: Sequence[str], wkb_col: str = "wkb"
) -> DataFrame:
    """groupBy(group_cols) -> one collected geometry per group.

    Output: group cols + collected_wkb + n_parts + geom_type_id.
    """
    gdf = df.select(*group_cols, wkb_col)
    fields = [StructField(c, gdf.schema[c].dataType) for c in group_cols]
    schema = StructType(
        fields
        + [
            StructField("collected_wkb", BinaryType()),
            StructField("n_parts", IntegerType()),
            StructField("geom_type_id", IntegerType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [wkb_loads(bytes(b)) for b in pdf[wkb_col] if b is not None]
        g = _collect_kernel(geoms)
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        if g is None:
            row.update({"collected_wkb": [None], "n_parts": [0], "geom_type_id": [0]})
        else:
            n = len(g.data) if g.type_id >= 4 else 1
            row.update(
                {
                    "collected_wkb": [wkb_dumps(g)],
                    "n_parts": [n],
                    "geom_type_id": [g.type_id],
                }
            )
        return pd.DataFrame(row)

    # CPU-bound grouped-map over tiny WKB: pin the partition count so
    # AQE can't serialize it (see operators/partitioning.py)
    from pygeoops_spark.operators.partitioning import repartition_for_cpu

    return (
        repartition_for_cpu(gdf, *group_cols)
        .groupBy(*group_cols)
        .applyInPandas(run, schema)
    )


def _scalar_wkb_udf(fn):
    @F.pandas_udf(BinaryType())
    def _ud(wkbs: pd.Series) -> pd.Series:
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            g = fn(wkb_loads(bytes(b)))
            out.append(wkb_dumps(g) if g is not None else None)
        return pd.Series(out)

    return _ud


def collection_extract_col(
    wkb_col: Column | str, primitivetype_id: "int | Column | str"
) -> Column:
    """Keep only parts of the requested primitive type.

    primitivetype_id may be a scalar int (one type for all rows) or a
    Column/column name of per-row type codes — the Spark mapping of the
    reference's zipped arraylike form (geometry array + primitivetype
    array 1:1, /root/reference/pygeoops/_general.py:137-164)."""
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    if isinstance(primitivetype_id, int):
        return _scalar_wkb_udf(lambda g: _extract_kernel(g, primitivetype_id))(wkb_col)

    tcol = (
        F.col(primitivetype_id) if isinstance(primitivetype_id, str) else primitivetype_id
    )

    @F.pandas_udf(BinaryType())
    def _ud(wkbs: pd.Series, types: pd.Series) -> pd.Series:
        out = []
        for b, t in zip(wkbs, types):
            if b is None:
                out.append(None)
                continue
            if t is None or pd.isna(t):
                raise ValueError("Invalid value for primitivetype: None")
            g = _extract_kernel(wkb_loads(bytes(b)), int(t))
            out.append(wkb_dumps(g) if g is not None else None)
        return pd.Series(out, dtype=object)

    return _ud(wkb_col, tcol)


def primitivetype_id_col(wkb_col: Column | str) -> Column:
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col

    @F.pandas_udf(IntegerType())
    def _ud(wkbs: pd.Series) -> pd.Series:
        return pd.Series(
            [0 if b is None else _pid_kernel(wkb_loads(bytes(b))) for b in wkbs]
        )

    return _ud(wkb_col)


def parts_recursive_col(wkb_col: Column | str) -> Column:
    """Array of simple-geometry WKBs (explode downstream = the
    reference's deprecated `explode`)."""
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col

    @F.pandas_udf(ArrayType(BinaryType()))
    def _ud(wkbs: pd.Series) -> pd.Series:
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            out.append([wkb_dumps(p) for p in _parts_kernel(wkb_loads(bytes(b)))])
        return pd.Series(out)

    return _ud(wkb_col)


def remove_inner_rings_col(wkb_col: Column | str, min_area_to_keep: float) -> Column:
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    return _scalar_wkb_udf(lambda g: _rings_kernel(g, min_area_to_keep))(wkb_col)


def make_valid_col(
    wkb_col: Column | str,
    keep_collapsed: bool = True,
    only_if_invalid: bool = False,
) -> Column:
    """Validity repair over a WKB column (reference make_valid,
    _general.py:419-479, applied per row): nonzero-winding arrangement
    repair for polygons, GEOS-MakeValid linework rules for lines and
    collections (geom/validity.py)."""
    from pygeoops_spark.geom.validity import make_valid as _mv_kernel

    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    return _scalar_wkb_udf(
        lambda g: _mv_kernel(
            g, keep_collapsed=keep_collapsed, only_if_invalid=only_if_invalid
        )
    )(wkb_col)


def extend_line_by_distance_col(
    wkb_col: Column | str, start_distance: float, end_distance: float
) -> Column:
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    return _scalar_wkb_udf(
        lambda g: _extend_dist_kernel(g, start_distance, end_distance)
    )(wkb_col)


def extend_line_to_geometry_col(
    wkb_col: Column | str, extend_to_wkb: bytes
) -> Column:
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col
    target_bytes = extend_to_wkb

    @F.pandas_udf(BinaryType())
    def _ud(wkbs: pd.Series) -> pd.Series:
        target = wkb_loads(target_bytes)  # decode once per batch
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            out.append(wkb_dumps(_extend_geom_kernel(wkb_loads(bytes(b)), target)))
        return pd.Series(out)

    return _ud(wkb_col)
