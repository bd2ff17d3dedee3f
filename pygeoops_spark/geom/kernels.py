"""Vectorized numeric geometry kernels (numpy only).

These are the primitives the reference delegates to GEOS for; rebuilt
here from scratch (reference behavior cited per function for parity
checks, no code taken from it).
"""

from __future__ import annotations

import math

import numpy as np

from pygeoops_spark.geom.wkb import (
    Geometry,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    get_parts,
)


# -- ring / line measures -------------------------------------------------
def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of a closed ring (CCW positive).

    Coordinates are shifted by the first vertex before the shoelace:
    (a) it removes the catastrophic cancellation of raw x*y products at
    projected-CRS magnitudes (|x| ~ 1e5-1e6), and (b) it makes the
    formula exact for rings whose closing vertex is within tolerance of
    but not bit-equal to the first (overlay stitching can leave a
    sub-snap gap): with the first vertex at the origin the implicit
    closing-edge term vanishes identically, whereas the unshifted
    unclosed sum carries an offset*gap error (0.25 area units for a
    1e-6 gap at |x| = 5e5)."""
    x = ring[:, 0] - ring[0, 0]
    y = ring[:, 1] - ring[0, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def polygon_area(geom: Geometry) -> float:
    """Unsigned area: |shell| minus |holes| summed over parts.

    Matches the reference's use of shapely `.area` (e.g. its
    `_centerline.py` average-width formula)."""
    total = 0.0
    for part in get_parts(geom):
        if part.type_id != POLYGON or not part.data:
            continue
        total += abs(ring_signed_area(part.data[0]))
        for hole in part.data[1:]:
            total -= abs(ring_signed_area(hole))
    return total


# WGS84 authalic radius (the sphere with the ellipsoid's surface area)
WGS84_AUTHALIC_RADIUS_M = 6371007.1809


def ring_area_geodesic(
    ring: np.ndarray, radius: float = WGS84_AUTHALIC_RADIUS_M
) -> float:
    """Unsigned great-circle spherical polygon area of a lon/lat ring
    (degrees), in radius^2 units (m^2 with the default radius).

    EXACT for great-circle-edge polygons via Gauss-Bonnet: on the unit
    sphere, Area = 2*pi - sum(exterior turn angles), with the turn at
    each vertex computed from the adjacent edge-plane normals
    (atan2 of their cross/dot projected on the vertex vector — no
    small-angle approximations, unlike the lat/lon trapezoid formulas).

    Parity target: the reference's geographic-CRS branch
    (/root/reference/pygeoops/_general.py:530-537, pyproj
    Geod.geometry_area_perimeter = Karney ellipsoidal area). On the
    authalic sphere regional areas agree with the ellipsoid to ~0.1%
    at mid latitudes — adequate for remove_inner_rings' threshold
    semantics; documented spherical approximation, not Karney.

    Polygons spanning more than a hemisphere are returned as the
    complement (the smaller cap) — same convention as most GIS area
    helpers for rings.
    """
    arr = np.asarray(ring, dtype=float)[:, :2]
    if len(arr) >= 2 and np.array_equal(arr[0], arr[-1]):
        arr = arr[:-1]
    # drop consecutive duplicates (degenerate edge normals)
    if len(arr) >= 2:
        keep = np.ones(len(arr), dtype=bool)
        keep[1:] = np.any(arr[1:] != arr[:-1], axis=1)
        arr = arr[keep]
    if len(arr) < 3:
        return 0.0
    lon = np.radians(arr[:, 0])
    lat = np.radians(arr[:, 1])
    cl = np.cos(lat)
    v = np.column_stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)])
    nxt = np.roll(v, -1, axis=0)
    n = np.cross(v, nxt)  # plane normal of edge i: v_i -> v_{i+1}
    nn = np.linalg.norm(n, axis=1)
    if (nn == 0).any():  # antipodal edge: undefined great circle
        return 0.0
    n /= nn[:, None]
    n_prev = np.roll(n, 1, axis=0)  # edge arriving at vertex i
    sin_t = np.einsum("ij,ij->i", np.cross(n_prev, n), v)
    cos_t = np.einsum("ij,ij->i", n_prev, n)
    excess = 2.0 * math.pi - float(np.arctan2(sin_t, cos_t).sum())
    excess = abs(excess)
    if excess > 2.0 * math.pi:
        excess = 4.0 * math.pi - excess
    return excess * radius * radius


def polygon_area_geodesic(
    geom: Geometry, radius: float = WGS84_AUTHALIC_RADIUS_M
) -> float:
    """Unsigned geodesic area: |shell| minus |holes| summed over parts
    (lon/lat degrees input), in radius^2 units."""
    total = 0.0
    for part in get_parts(geom):
        if part.type_id != POLYGON or not part.data:
            continue
        total += ring_area_geodesic(np.asarray(part.data[0]), radius)
        for hole in part.data[1:]:
            total -= ring_area_geodesic(np.asarray(hole), radius)
    return total


def line_length(coords: np.ndarray) -> float:
    if len(coords) < 2:
        return 0.0
    d = np.diff(coords[:, :2], axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def geom_length(geom: Geometry) -> float:
    """Perimeter for polygons, length for lines (shapely `.length`)."""
    total = 0.0
    for part in get_parts(geom):
        if part.type_id == POLYGON:
            for ring in part.data:
                total += line_length(np.asarray(ring))
        elif part.type_id == LINESTRING:
            total += line_length(np.asarray(part.data))
    return total


# -- point-in-polygon -----------------------------------------------------
def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized crossing-number test of many points vs one closed ring.

    Boundary points may report either side; join recipes that need
    boundary-inclusive semantics add an explicit on-edge test.
    """
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    m, n = len(px), len(x1)
    # 2D broadcast path: one (points x edges) crossing matrix beats the
    # per-edge Python loop by ~10x for the overlay-classify shapes
    # (tens of midpoints x tens of edges); capped so a big PIP batch
    # against a huge ring can't allocate an m*n monster
    if 64 <= m * n <= 2_000_000:
        cond = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
        dy = y2 - y1
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) / dy[
                None, :
            ] + x1[None, :]
        # cond is False wherever dy == 0, masking the inf/nan xs there
        cross = cond & (px[:, None] < xs)
        return (cross.sum(axis=1) & 1).astype(bool)
    inside = np.zeros(m, dtype=bool)
    # For each edge: does a ray cast in +x from the point cross it?
    for j in range(n):
        cond = (y1[j] > py) != (y2[j] > py)
        if not cond.any():
            continue
        xs = (x2[j] - x1[j]) * (py - y1[j]) / (y2[j] - y1[j]) + x1[j]
        inside ^= cond & (px < xs)
    return inside


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: Geometry) -> np.ndarray:
    """Points strictly inside polygon (shell minus holes), any part."""
    res = np.zeros(len(px), dtype=bool)
    for part in get_parts(poly):
        if part.type_id != POLYGON or not part.data:
            continue
        m = points_in_ring(px, py, np.asarray(part.data[0]))
        for hole in part.data[1:]:
            m &= ~points_in_ring(px, py, np.asarray(hole))
        res |= m
    return res


def point_in_polygon_prepared(rings: list[tuple[np.ndarray, bool]]):
    """Build a reusable closure over decoded rings: [(ring, is_hole)].

    The spatial-join layer decodes each polygon once per executor and
    reuses it for every candidate batch (the Spark analog of the
    reference's prepared-geometry optimization in its difference
    prefilter, /root/reference/pygeoops/_difference.py:157-165).
    """

    def test(px: np.ndarray, py: np.ndarray) -> np.ndarray:
        res = np.zeros(len(px), dtype=bool)
        cur = None
        for ring, is_hole in rings:
            m = points_in_ring(px, py, ring)
            if not is_hole:
                if cur is not None:
                    res |= cur
                cur = m
            else:
                if cur is not None:
                    cur &= ~m
        if cur is not None:
            res |= cur
        return res

    return test


# -- segment math ---------------------------------------------------------
def point_segment_distance(
    px: np.ndarray, py: np.ndarray, ax, ay, bx, by
) -> np.ndarray:
    """Distance from points to segment AB (true segment, not line).
    All of px/py/ax/ay/bx/by may be scalars or broadcastable arrays."""
    dx, dy = bx - ax, by - ay
    seg_len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip(
            np.where(seg_len2 == 0, 0.0, ((px - ax) * dx + (py - ay) * dy) / np.where(seg_len2 == 0, 1.0, seg_len2)),
            0.0,
            1.0,
        )
    return np.hypot(px - (ax + t * dx), py - (ay + t * dy))


def point_line_distance(
    px: np.ndarray, py: np.ndarray, ax, ay, bx, by
) -> np.ndarray:
    """Orthogonal distance to the infinite line AB; +inf when A==B.

    Same contract as the reference's Lang helper
    (/root/reference/pygeoops/_simplify_lang.py:188-220): degenerate
    window => infinite distance so the point is always kept.
    """
    dx, dy = bx - ax, by - ay
    denom = np.hypot(dx, dy)
    if denom == 0:
        return np.full(np.shape(px) or (1,), np.inf)[()] if np.ndim(px) else np.inf
    return np.abs(dx * (ay - py) - (ax - px) * dy) / denom


def segments_intersect(p1, p2, q1, q2) -> bool:
    """Do segments [p1,p2] and [q1,q2] intersect (inclusive)?"""

    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if v > 0:
            return 1
        if v < 0:
            return -1
        return 0

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    o1, o2 = orient(p1, p2, q1), orient(p1, p2, q2)
    o3, o4 = orient(q1, q2, p1), orient(q1, q2, p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(p1, p2, q1):
        return True
    if o2 == 0 and on_seg(p1, p2, q2):
        return True
    if o3 == 0 and on_seg(q1, q2, p1):
        return True
    if o4 == 0 and on_seg(q1, q2, p2):
        return True
    return False


def segment_intersects_coords(seg_a, seg_b, coords: np.ndarray) -> bool:
    """Does segment [seg_a, seg_b] intersect any edge of a coordinate
    chain? Vectorized orientation pre-filter, exact check on hits."""
    if len(coords) < 2:
        return False
    a = np.asarray(seg_a, dtype=np.float64)
    b = np.asarray(seg_b, dtype=np.float64)
    p = coords[:-1, :2]
    q = coords[1:, :2]
    d = b - a
    cross_p = d[0] * (p[:, 1] - a[1]) - d[1] * (p[:, 0] - a[0])
    cross_q = d[0] * (q[:, 1] - a[1]) - d[1] * (q[:, 0] - a[0])
    e = q - p
    cross_a = e[:, 0] * (a[1] - p[:, 1]) - e[:, 1] * (a[0] - p[:, 0])
    cross_b = e[:, 0] * (b[1] - p[:, 1]) - e[:, 1] * (b[0] - p[:, 0])
    candidate = (np.sign(cross_p) != np.sign(cross_q)) & (
        np.sign(cross_a) != np.sign(cross_b)
    )
    collinear = (cross_p == 0) | (cross_q == 0) | (cross_a == 0) | (cross_b == 0)
    for idx in np.nonzero(candidate | collinear)[0]:
        if segments_intersect(tuple(a), tuple(b), tuple(p[idx]), tuple(q[idx])):
            return True
    return False


def segments_cross_chain_batch(edges: np.ndarray, chain: np.ndarray) -> np.ndarray:
    """(E,) bool: does each edge (edges[(E,2,2)]) intersect any segment
    of the coordinate chain? Fully vectorized (E x S broadcast),
    inclusive of touching/collinear contact."""
    E = len(edges)
    if E == 0 or len(chain) < 2:
        return np.zeros(E, dtype=bool)
    p1 = edges[:, 0, :][:, None, :]  # (E,1,2)
    p2 = edges[:, 1, :][:, None, :]
    q1 = chain[:-1][None, :, :]  # (1,S,2)
    q2 = chain[1:][None, :, :]

    def cross(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]
        ) * (b[..., 0] - o[..., 0])

    d1 = cross(q1, q2, p1)
    d2 = cross(q1, q2, p2)
    d3 = cross(p1, p2, q1)
    d4 = cross(p1, p2, q2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))

    def on_seg(a, b, c, dsign):
        return (
            (dsign == 0)
            & (np.minimum(a[..., 0], b[..., 0]) <= c[..., 0])
            & (c[..., 0] <= np.maximum(a[..., 0], b[..., 0]))
            & (np.minimum(a[..., 1], b[..., 1]) <= c[..., 1])
            & (c[..., 1] <= np.maximum(a[..., 1], b[..., 1]))
        )

    touch = (
        on_seg(q1, q2, p1, d1)
        | on_seg(q1, q2, p2, d2)
        | on_seg(p1, p2, q1, d3)
        | on_seg(p1, p2, q2, d4)
    )
    return (proper | touch).any(axis=1)


def geom_intersects_segment(geom: Geometry, seg_a, seg_b) -> bool:
    """Does geometry intersect segment? For polygons: boundary crossing
    or either endpoint inside (sufficient because the segment is a
    connected set)."""
    for part in get_parts(geom):
        if part.type_id == POINT:
            if part.data is None:
                continue
            d = point_segment_distance(
                np.array([part.data[0]]),
                np.array([part.data[1]]),
                seg_a[0],
                seg_a[1],
                seg_b[0],
                seg_b[1],
            )
            if d[0] == 0:
                return True
        elif part.type_id == LINESTRING:
            if segment_intersects_coords(seg_a, seg_b, np.asarray(part.data)):
                return True
        elif part.type_id == POLYGON:
            for ring in part.data:
                if segment_intersects_coords(seg_a, seg_b, np.asarray(ring)):
                    return True
            ax = np.array([seg_a[0], seg_b[0]])
            ay = np.array([seg_a[1], seg_b[1]])
            if points_in_polygon(ax, ay, part).any():
                return True
    return False


# -- hulls ---------------------------------------------------------------
def convex_hull_coords(coords: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns closed CCW hull ring."""
    pts = np.unique(coords[:, :2], axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort is given by np.unique. The chain walks plain
    # Python floats (tolist once): numpy scalar indexing inside the
    # loop was the profiled cost, and np.cross pays moveaxis overhead
    # per call.
    plist = pts.tolist()

    def half(points):
        out: list[list[float]] = []
        for px, py in points:
            while len(out) >= 2:
                bx_, by_ = out[-1]
                ox, oy = out[-2]
                if (bx_ - ox) * (py - oy) - (by_ - oy) * (px - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append([px, py])
        return out

    lower = half(plist)
    upper = half(plist[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return np.vstack([hull, hull[:1]])


# -- primitive type algebra ----------------------------------------------
def get_primitivetype_id(geom: Geometry) -> int:
    """0 collection, 1 point, 2 line, 3 polygon — the reference's rule
    'dimensions + 1' (/root/reference/pygeoops/_general.py:384-412)."""
    t = geom.type_id
    if t in (POINT, 4):
        return 1
    if t in (LINESTRING, MULTILINESTRING):
        return 2
    if t in (POLYGON, MULTIPOLYGON):
        return 3
    return 0
