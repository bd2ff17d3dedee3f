"""View-angles kernel: start/end angle (degrees, 0-360) under which a
geometry is visible from a viewpoint.

Behavioral spec: /root/reference/pygeoops/_view_angles.py:88-205 —
angles of all coordinates via arctan2 mapped to [0,360); if the
geometry crosses the 0-degree ray the wrap-around is resolved with
probe rays just south/north of 0, at 180, and finally a brute-force
gap search between sorted angles. Re-implemented on our own
segment-intersection kernels (no GEOS).
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_spark.geom.kernels import geom_intersects_segment
from pygeoops_spark.geom.wkb import Geometry, get_coordinates

_RAY = 5_000_000.0
_TOL = 1e-10


def view_angles(viewpoint_xy: tuple[float, float], visible: Geometry | None) -> tuple[float, float]:
    if visible is None or visible.is_empty:
        return (math.nan, math.nan)
    if visible.type_id >= 4:
        raise ValueError("visible_geom can't be a multipart geometry")
    vx, vy = viewpoint_xy
    coords = get_coordinates(visible)[:, :2] - np.array([vx, vy])
    shifted = Geometry(visible.type_id, _shift_data(visible, vx, vy), "xy")

    angles = np.rad2deg(np.arctan2(coords[:, 1], coords[:, 0]))
    angles = np.where(angles < 0, angles + 360.0, angles)

    origin = (0.0, 0.0)
    if (angles == 0).any():
        crosses_0 = True
    else:
        crosses_0 = geom_intersects_segment(shifted, origin, (_RAY, 0.0))
    if not crosses_0:
        return (float(angles.min()), float(angles.max()))

    if not geom_intersects_segment(shifted, (0.0, -_TOL), (_RAY, -_TOL)):
        return (float(angles.min()), float(angles.max()))
    angles = np.append(angles, 360.0)

    if not geom_intersects_segment(shifted, (0.0, _TOL), (_RAY, _TOL)):
        nz = angles[angles != 0]
        if len(nz) > 0:
            return (float(nz.min()), float(nz.max()))
    else:
        angles = np.append(angles, 0.0)

    if not geom_intersects_segment(shifted, origin, (-_RAY, 0.0)):
        north_max = angles[angles <= 180].max()
        south_min = angles[angles >= 180].min()
        return (float(south_min), float(north_max))
    angles = np.append(angles, 180.0)

    # brute-force: find a gap between consecutive distinct angles where a
    # mid-angle probe ray misses the geometry
    prev = None
    for ang in np.sort(angles):
        if prev is None or ang == prev:
            prev = ang
            continue
        mid = (ang + prev) / 2.0
        # NOTE: reference uses cos/sin of the *degree* value (radians
        # mismatch) — reproduced for parity since goldens encode it.
        px = _RAY * math.cos(mid)
        py = _RAY * math.sin(mid)
        if not geom_intersects_segment(shifted, origin, (px, py)):
            return (float(prev), float(ang))
        prev = ang
    return (0.0, 360.0)


def _shift_data(geom: Geometry, vx: float, vy: float):
    off = np.array([vx, vy])
    if geom.type_id == 1:
        return None if geom.data is None else geom.data[:2] - off
    if geom.type_id == 2:
        return np.asarray(geom.data)[:, :2] - off
    if geom.type_id == 3:
        return [np.asarray(r)[:, :2] - off for r in geom.data]
    raise ValueError("multipart geometry not supported")
