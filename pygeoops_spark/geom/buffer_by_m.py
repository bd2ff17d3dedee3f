"""buffer_by_m kernel: per-vertex variable-width buffer.

Behavioral parity: /root/reference/pygeoops/_buffer_by_m.py:120-175 —
buffer each vertex point by its M (preferred) or Z value; zero distance
keeps the bare point (taper), negative/NaN drops it (disjoint parts);
consecutive buffer pairs are joined by convex hulls; polygon parts also
contribute their own area; everything unions at the end; empty result
=> empty Polygon. Rebuilt on our circle-generation + monotone-chain
hull + n-ary polygon union kernels.
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_spark.geom.general import get_parts_recursive
from pygeoops_spark.geom.kernels import convex_hull_coords
from pygeoops_spark.geom.overlay import polygon_union
from pygeoops_spark.geom.wkb import (
    Geometry,
    POLYGON,
    empty,
    get_coordinates,
)


_UNIT_CIRCLES: dict[int, np.ndarray] = {}


def circle_coords(cx: float, cy: float, r: float, quad_segs: int = 8) -> np.ndarray:
    """Closed CCW circle approximation with 4*quad_segs vertices."""
    unit = _UNIT_CIRCLES.get(quad_segs)
    if unit is None:
        n = 4 * quad_segs
        ang = np.linspace(0.0, 2.0 * math.pi, n, endpoint=False)
        ring = np.column_stack([np.cos(ang), np.sin(ang)])
        unit = np.vstack([ring, ring[:1]])
        _UNIT_CIRCLES[quad_segs] = unit
    out = unit * r
    out[:, 0] += cx
    out[:, 1] += cy
    return out


def _coords_with_distance(part: Geometry) -> np.ndarray | None:
    """(n,3) x,y,distance — M preferred over Z; None if neither."""
    coords = get_coordinates(part)
    if part.dims == "xym":
        return coords[:, [0, 1, 2]]
    if part.dims == "xyzm":
        return coords[:, [0, 1, 3]]
    if part.dims == "xyz":
        return coords[:, [0, 1, 2]]
    return None


def buffer_by_m(geometry: Geometry | None, quad_segs: int = 8) -> Geometry | None:
    if geometry is None:
        return None
    if geometry.dims == "xy":
        raise ValueError(
            "input geometry must have M or Z values for buffer distances."
        )
    partial: list[Geometry] = []
    for part in get_parts_recursive(geometry):
        cwd = _coords_with_distance(part)
        if cwd is None or len(cwd) == 0:
            continue
        pts = cwd[:, :2]
        dists = cwd[:, 2]
        # per-vertex buffer coordinate sets: circle / bare point / empty
        buf_coords: list[np.ndarray] = []
        for (x, y), d in zip(pts, dists):
            if d > 0:
                buf_coords.append(circle_coords(x, y, d, quad_segs)[:-1])
            elif d == 0:
                buf_coords.append(np.array([[x, y]]))
            else:  # negative or NaN
                buf_coords.append(np.empty((0, 2)))
        if len(buf_coords) == 1:
            if len(buf_coords[0]) > 2:
                partial.append(Geometry(POLYGON, [np.vstack([buf_coords[0], buf_coords[0][:1]])]))
            continue
        for c1, c2 in zip(buf_coords[:-1], buf_coords[1:]):
            combined = np.vstack([c1, c2])
            if len(combined) < 3:
                continue
            hull = convex_hull_coords(combined)
            if len(hull) >= 4:
                partial.append(Geometry(POLYGON, [hull]))
        if part.type_id == POLYGON:
            partial.append(Geometry(POLYGON, [np.asarray(r)[:, :2] for r in part.data]))
    if not partial:
        return empty(POLYGON)
    result = polygon_union(partial)
    if result is None or result.is_empty:
        return empty(POLYGON)
    return result
