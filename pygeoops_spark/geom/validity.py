"""Scoped validity repair (make_valid) for polygons.

Covers the cases the reference test-suite exercises
(tests/test_simplify.py:181-251): shells that self-touch at a vertex or
self-cross after simplification are noded against themselves and
re-stitched into separate simple loops (figure-eight split); holes are
re-assigned to the shell that contains them. Rings that COLLAPSE to a
lower dimension (zero area: a line or a point) follow the reference's
keep_collapsed semantics (/root/reference/pygeoops/_general.py:419-479
delegating to GEOS MakeValid): keep_collapsed=True emits the collapsed
LineString/Point (mixed results become a GeometryCollection),
keep_collapsed=False drops them. Arbitrary GEOS invalidity beyond
these classes (e.g. nested shells) remains out of scope and is
documented as such.
"""

from __future__ import annotations

import numpy as np

from pygeoops_spark.geom.kernels import points_in_polygon, ring_signed_area
from pygeoops_spark.geom.overlay import _node_edges, _rings_to_polygons, _stitch
from pygeoops_spark.geom.wkb import (
    Geometry,
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    get_parts,
    multi,
)


def _collapsed_geometry(coords: np.ndarray) -> Geometry | None:
    """Zero-area ring -> its lower-dimension remnant: the deduped
    traversal path as a LineString, or a Point when fully degenerate
    (mirrors GEOS MakeValid's collapse output for flat rings)."""
    arr = np.asarray(coords, dtype=float)[:, :2]
    if len(arr) >= 2 and np.array_equal(arr[0], arr[-1]):
        arr = arr[:-1]
    if len(arr) >= 2:
        keep = np.ones(len(arr), dtype=bool)
        keep[1:] = np.any(arr[1:] != arr[:-1], axis=1)
        arr = arr[keep]
    if len(arr) == 0:
        return None
    uniq = np.unique(arr, axis=0)
    if len(uniq) == 1:
        return Geometry(POINT, arr[0].tolist())
    return Geometry(LINESTRING, arr)


def _ring_loops(ring: np.ndarray) -> list[np.ndarray]:
    """Split a (possibly self-touching/crossing) closed ring into simple
    loops via the vertex-revisit stack walk: node the ring against
    itself (insert crossing points), then walk in ring order popping a
    loop whenever a vertex repeats. Returns [ring] when already simple.
    """
    arr = np.asarray(ring, dtype=float)[:, :2]
    edges = [
        (arr[i], arr[i + 1])
        for i in range(len(arr) - 1)
        if arr[i, 0] != arr[i + 1, 0] or arr[i, 1] != arr[i + 1, 1]
    ]
    noded = _node_edges(edges, [edges])  # keeps ring order; cuts sorted
    if not noded:
        return []
    verts = [noded[0][0]] + [b for _a, b in noded]

    def key(p):
        return (round(p[0] / 1e-9), round(p[1] / 1e-9))

    loops: list[np.ndarray] = []
    path: list[np.ndarray] = []
    index: dict[tuple, int] = {}
    for v in verts:
        k = key(v)
        if k in index:
            i = index[k]
            loop = path[i:] + [v]
            if len(loop) >= 4:
                lp = np.array(loop)
                if abs(ring_signed_area(lp)) > 1e-12:
                    loops.append(lp)
            for p in path[i + 1 :]:
                index.pop(key(p), None)
            path = path[: i + 1]
        else:
            index[k] = len(path)
            path.append(v)
    if len(path) >= 3:
        lp = np.vstack([np.array(path), [path[0]]])
        if abs(ring_signed_area(lp)) > 1e-12:
            loops.append(lp)
    return loops


def polygon_is_simple(poly: Geometry) -> bool:
    """Does the shell form a single simple loop?"""
    if not poly.data:
        return True
    return len(_ring_loops(np.asarray(poly.data[0]))) <= 1


def make_valid(
    geom: Geometry | None,
    keep_collapsed: bool = True,
    only_if_invalid: bool = False,
) -> Geometry | None:
    """Repair self-touching/crossing polygon shells; pass through other
    types. Multi-loop shells become MultiPolygon parts ordered by
    descending area (deterministic; matches the reference tests' use of
    geoms[0] as the dominant part). Collapsed rings follow
    keep_collapsed (see module docstring). only_if_invalid mirrors the
    reference's fast path (_general.py:446-458): check validity first
    and return the input untouched when already simple — cheaper when
    most geometries are valid."""
    if geom is None:
        return None
    t = geom.type_id
    if only_if_invalid and t in (POLYGON, MULTIPOLYGON):
        parts = [geom] if t == POLYGON else list(geom.data)

        def _shell_ok(p: Geometry) -> bool:
            # exactly ONE simple loop: a zero-area (collapsed) shell
            # yields 0 loops and is INVALID — it must fall through to
            # the repair path so keep_collapsed semantics apply
            if not p.data:
                return True
            return len(_ring_loops(np.asarray(p.data[0]))) == 1

        if all(_shell_ok(p) for p in parts):
            return geom
    if t == POLYGON:
        return _make_valid_polygon(geom, keep_collapsed)
    if t == MULTIPOLYGON:
        parts = []
        for p in geom.data:
            r = _make_valid_polygon(p, keep_collapsed)
            if r is not None:
                parts.extend(get_parts(r))
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        if all(p.type_id == POLYGON for p in parts):
            return multi(MULTIPOLYGON, parts)
        return multi(GEOMETRYCOLLECTION, parts)
    return geom


def _make_valid_polygon(poly: Geometry, keep_collapsed: bool = True) -> Geometry | None:
    if not poly.data:
        return poly
    loops = _ring_loops(np.asarray(poly.data[0]))
    if not loops:
        # the whole shell is zero-area: a collapse to line/point
        return _collapsed_geometry(np.asarray(poly.data[0])) if keep_collapsed else None
    if len(loops) == 1:
        # keep the original shell coords (repair is a no-op)
        shells = [np.asarray(poly.data[0], dtype=float)]
    else:
        shells = sorted(loops, key=lambda lp: -abs(ring_signed_area(lp)))
    polys = [[s] for s in shells]
    for hole in poly.data[1:]:
        h = np.asarray(hole, dtype=float)
        cx, cy = h[:-1, 0].mean(), h[:-1, 1].mean()
        for i, s in enumerate(shells):
            if points_in_polygon(
                np.array([cx]), np.array([cy]), Geometry(POLYGON, [s])
            )[0]:
                polys[i].append(h)
                break
    if len(polys) == 1:
        return Geometry(POLYGON, polys[0], poly.dims)
    return multi(MULTIPOLYGON, [Geometry(POLYGON, p, poly.dims) for p in polys])
