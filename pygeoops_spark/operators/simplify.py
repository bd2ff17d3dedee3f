"""simplify as a Spark operator (lang / lang+ / rdp / vw).

Scalar Arrow-batched pandas UDF over WKB. Ring-wise semantics follow
the reference dispatch (/root/reference/pygeoops/_simplify.py:142-219):
points pass through, lines/polygon rings simplify per ring, degenerate
rings (<3 distinct pts after simplify) keep the original ring when
preserve_topology else drop; multiparts recurse. `keep_points_on` and
the topology-preserving cross-feature variant land in a later wave.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, IntegerType

from pygeoops_spark.geom.simplify import simplify_coords_idx
from pygeoops_spark.geom.wkb import (
    Geometry,
    LINESTRING,
    POINT,
    POLYGON,
    wkb_dumps,
    wkb_loads,
)


def _simplify_geom(
    geom: Geometry, tolerance: float, algorithm: str, lookahead: int, preserve_topology: bool
) -> Geometry | None:
    t = geom.type_id
    if t == POINT or (t == 4):  # (multi)point pass-through
        return geom
    if t == LINESTRING:
        arr = np.asarray(geom.data)
        keep = simplify_coords_idx(arr[:, :2], tolerance, algorithm, lookahead)
        out = arr[keep]
        if len(out) < 2:
            return geom if preserve_topology else None
        return Geometry(LINESTRING, out, geom.dims)
    if t == POLYGON:
        rings = []
        for i, ring in enumerate(geom.data):
            arr = np.asarray(ring)
            keep = simplify_coords_idx(arr[:, :2], tolerance, algorithm, lookahead)
            out = arr[keep]
            if len(out) < 4:  # degenerate ring (needs 3 distinct + close)
                if preserve_topology:
                    out = arr
                elif i == 0:
                    return None
                else:
                    continue
            if not np.array_equal(out[0], out[-1]):
                out = np.vstack([out, out[:1]])
            rings.append(out)
        if not rings:
            return None
        return Geometry(POLYGON, rings, geom.dims)
    # multiparts / collections: recurse, drop vanished parts
    parts = []
    for p in geom.data:
        sp = _simplify_geom(p, tolerance, algorithm, lookahead, preserve_topology)
        if sp is not None and not sp.is_empty:
            parts.append(sp)
    if not parts:
        return None
    return Geometry(t, parts, geom.dims)


def simplify_col(
    wkb_col: Column | str,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    preserve_topology: bool = True,
) -> Column:
    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col

    @F.pandas_udf(BinaryType())
    def _ud(wkbs: pd.Series) -> pd.Series:
        out = []
        for b in wkbs:
            if b is None:
                out.append(None)
                continue
            g = _simplify_geom(
                wkb_loads(bytes(b)), tolerance, algorithm, lookahead, preserve_topology
            )
            out.append(wkb_dumps(g) if g is not None else None)
        return pd.Series(out)

    return _ud(wkb_col)


def num_coords_col(wkb_col: Column | str) -> Column:
    """Coordinate count of each WKB geometry (diagnostics / subdivide
    parameterization)."""
    from pygeoops_spark.geom.wkb import get_coordinates

    wkb_col = F.col(wkb_col) if isinstance(wkb_col, str) else wkb_col

    @F.pandas_udf(IntegerType())
    def _ud(wkbs: pd.Series) -> pd.Series:
        return pd.Series(
            [0 if b is None else len(get_coordinates(wkb_loads(bytes(b)))) for b in wkbs]
        )

    return _ud(wkb_col)
