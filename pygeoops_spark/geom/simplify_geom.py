"""Geometry-level simplify dispatch (ring-wise, with keep_points_on).

Behavioral parity: /root/reference/pygeoops/_simplify.py:29-219 —
points pass through; lines/rings simplify via the index kernels;
`keep_points_on` re-adds dropped coordinates that lie on the given
geometry, merged in original order (:321-369); degenerate rings keep
the original ring when preserve_topology else collapse (shell => None);
multiparts recurse and re-collect. `preserve_common_boundaries=True`
dispatches to the cross-feature topo variant (operators/simplify_topo).
"""

from __future__ import annotations

import numpy as np

from pygeoops_spark.geom.kernels import point_segment_distance
from pygeoops_spark.geom.simplify import simplify_coords_idx
from pygeoops_spark.geom.wkb import (
    Geometry,
    LINESTRING,
    POINT,
    POLYGON,
    get_parts,
)

_ON_TOL = 1e-9


def _points_on_geometry(pts: np.ndarray, keep_on: Geometry) -> np.ndarray:
    """Boolean mask: which points lie on keep_on (any part, boundary or
    vertex), within a tight tolerance."""
    mask = np.zeros(len(pts), dtype=bool)
    for part in get_parts(keep_on):
        if part.type_id == POINT:
            if part.data is None:
                continue
            mask |= (np.abs(pts[:, 0] - part.data[0]) <= _ON_TOL) & (
                np.abs(pts[:, 1] - part.data[1]) <= _ON_TOL
            )
            continue
        chains = (
            [np.asarray(part.data)]
            if part.type_id == LINESTRING
            else [np.asarray(r) for r in part.data]
        )
        for c in chains:
            for i in range(len(c) - 1):
                d = point_segment_distance(
                    pts[:, 0], pts[:, 1], c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1]
                )
                mask |= d <= _ON_TOL
    return mask


def _simplify_ring_idx(
    arr: np.ndarray,
    tolerance: float,
    algorithm: str,
    lookahead: int,
    keep_points_on: Geometry | None,
) -> np.ndarray:
    keep = simplify_coords_idx(arr[:, :2], tolerance, algorithm, lookahead)
    if keep_points_on is None:
        return keep
    dropped = np.setdiff1d(np.arange(len(arr)), keep)
    if len(dropped) == 0:
        return keep
    on = _points_on_geometry(arr[dropped][:, :2], keep_points_on)
    merged = np.union1d(keep, dropped[on])
    return merged


def simplify_geometry(
    geom: Geometry | None,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    preserve_topology: bool = True,
    keep_points_on: Geometry | None = None,
) -> Geometry | None:
    if geom is None:
        return None
    t = geom.type_id
    if t == POINT or t == 4:  # (multi)point pass-through
        return geom
    if t == LINESTRING:
        arr = np.asarray(geom.data)
        keep = _simplify_ring_idx(arr, tolerance, algorithm, lookahead, keep_points_on)
        out = arr[keep]
        if len(out) < 2:
            return geom if preserve_topology else None
        return Geometry(LINESTRING, out, geom.dims)
    if t == POLYGON:
        rings = []
        for i, ring in enumerate(geom.data):
            arr = np.asarray(ring)
            keep = _simplify_ring_idx(
                arr, tolerance, algorithm, lookahead, keep_points_on
            )
            out = arr[keep]
            if len(out) < 4:  # degenerate (3 distinct + closure needed)
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
        # simplification can make a shell self-touch/cross -> repair,
        # then keep only polygon parts: the reference runs
        # collection_extract(shapely.make_valid(result), POLYGON) on
        # every polygon result (_simplify.py:275-283), so collapses to
        # lines/points are filtered here even though make_valid itself
        # now emits them under keep_collapsed=True
        from pygeoops_spark.geom.general import collection_extract
        from pygeoops_spark.geom.validity import make_valid

        result = collection_extract(
            make_valid(Geometry(POLYGON, rings, geom.dims)), 3
        )
        if result is None and preserve_topology:
            return geom
        return result
    parts = []
    for p in get_parts(geom):
        sp = simplify_geometry(
            p, tolerance, algorithm, lookahead, preserve_topology, keep_points_on
        )
        if sp is not None and not sp.is_empty:
            parts.append(sp)
    if not parts:
        return None
    if len(parts) == 1:
        return parts[0]
    from pygeoops_spark.geom.general import collect

    return collect(parts)


def simplify(
    geom: Geometry | None,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    preserve_topology: bool = True,
    preserve_common_boundaries: bool = False,
    keep_points_on: Geometry | None = None,
) -> Geometry | None:
    """Top-level dispatch with the reference's error contracts."""
    if preserve_common_boundaries and not preserve_topology:
        raise ValueError(
            "The combination of preserve_common_boundaries=True and "
            "preserve_topology=False is not supported."
        )
    if algorithm not in ("lang", "lang+", "rdp", "vw"):
        raise ValueError(f"Unsupported algorithm specified: {algorithm}")
    if preserve_common_boundaries:
        raise NotImplementedError(
            "single-geometry API cannot preserve common boundaries; use "
            "operators.simplify.simplify(df, ..., "
            "preserve_common_boundaries=True) over a DataFrame of features"
        )
    return simplify_geometry(
        geom, tolerance, algorithm, lookahead, preserve_topology, keep_points_on
    )


# -- reference-parity names (reference: _simplify.py:223/287/321) ----------
def _resolve_algorithm(algorithm: str, simplify_lookahead_points: bool) -> str:
    """The reference routes lang/lang+ through one code path gated by
    simplify_lookahead_points; our kernels name the variant 'lang+'."""
    if algorithm == "lang" and simplify_lookahead_points:
        return "lang+"
    return algorithm


def simplify_coords(
    coords,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    simplify_lookahead_points: bool = False,
    keep_points_on: Geometry | None = None,
) -> np.ndarray:
    """Kept COORDS (not indices) with the keep_points_on merge
    (reference: _simplify.py:321)."""
    arr = np.asarray(coords, dtype=np.float64)
    keep = _simplify_ring_idx(
        arr,
        tolerance,
        _resolve_algorithm(algorithm, simplify_lookahead_points),
        lookahead,
        keep_points_on,
    )
    return arr[keep]


def simplify_linestring(
    linestring: Geometry | None,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    simplify_lookahead_points: bool = False,
    preserve_topology: bool = True,
    keep_points_on: Geometry | None = None,
) -> Geometry | None:
    """Reference-parity name (reference: _simplify.py:287); degenerate
    rules (fewer than 2 kept points) follow simplify_geometry."""
    return simplify_geometry(
        linestring,
        tolerance,
        _resolve_algorithm(algorithm, simplify_lookahead_points),
        lookahead,
        preserve_topology,
        keep_points_on,
    )


def simplify_polygon(
    polygon: Geometry | None,
    tolerance: float,
    algorithm: str = "rdp",
    lookahead: int = 8,
    simplify_lookahead_points: bool = False,
    preserve_topology: bool = True,
    keep_points_on: Geometry | None = None,
) -> Geometry | None:
    """Reference-parity name (reference: _simplify.py:223): ring-wise
    simplify + make_valid + polygon-only extract."""
    return simplify_geometry(
        polygon,
        tolerance,
        _resolve_algorithm(algorithm, simplify_lookahead_points),
        lookahead,
        preserve_topology,
        keep_points_on,
    )
