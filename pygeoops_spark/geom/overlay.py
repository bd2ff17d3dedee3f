"""Polygon boolean operations (union / intersection / difference) from
scratch — no GEOS available in this environment.

Approach (noding + classification + stitching):
 1. collect the directed boundary segments of all input polygons
 2. node: split every segment at its intersections with segments of the
    other input(s) (bbox-prefiltered pairwise tests)
 3. classify every noded edge by where its midpoint lies relative to
    each input (strictly inside / outside, on-boundary handled via the
    edge-ownership rules below)
 4. keep edges according to the boolean rule:
       union:        edges not strictly inside the *other* input
       intersection: edges strictly inside the other input (or shared)
       difference:   A-edges outside B  +  B-edges inside A (reversed)
    shared edges (same undirected segment in both inputs) are kept once
    for union/intersection when co-directed, dropped when anti-directed
 5. stitch directed edges into rings (at multi-way vertices take the
    sharpest counter-clockwise turn), classify shells/holes by signed
    area, assign holes to shells by point-in-polygon.

This is the kernel behind difference_all / difference_all_tiled
(reference semantics: /root/reference/pygeoops/_difference.py — union
subtrahends once then a single difference, :167-169) and the polygon
unions in buffer_by_m / centerline.

Robustness: exact float arithmetic where possible; vertices are snapped
to a scale-relative grid during stitching (mirrors the reference's 1e-8
dedup + set_precision fallbacks in _centerline.py:146-172). Two
hardening rules keep shared/near-shared boundaries consistent (the
reference gets these for free from GEOS, _difference.py:171-181):

 * vertex-on-edge noding: every edge is additionally cut at other-set
   VERTICES lying within ``10*snap`` of it, using the vertex's own
   coordinates as the cut point. This covers exact and near-collinear
   overlapping edges (adjacent parcels sharing a partial boundary),
   T-junctions, and vertices a few ulps off an edge — the class where
   the general-position crossing solve has a ~zero denominator and
   produced no cut at all, silently dropping whole faces.
 * symmetric crossing points: a proper crossing between edge E and
   edge O is emitted as the average of both parameterizations
   ``((e1 + t*d) + (o1 + u*s)) / 2``. All inputs to that expression
   are exact negation/commutation images under the role swap
   (qp' = -qp, denom' = -denom, hence t' = u and u' = t bit-exactly),
   so the two independent noding passes of an operation produce
   IDENTICAL cut coordinates and ring stitching always reconnects —
   even for ill-conditioned near-parallel crossings.
 * endpoint-sharing pairs never cross: segments that share an endpoint
   bit-exactly are excluded from the general-position solve (straight
   lines meet at most once; collinear overlap has its own branch) —
   otherwise ulp-rotated pieces of the same original edge produce a
   phantom interior crossing arbitrarily far from the shared node.
 * on-boundary keep/drop decisions are the exact off->0 limit of side
   sampling (_onb_verdict): midpoint point-in-polygon when strictly
   off the other NODED chain, co-direction with the nearest chain
   segment when bit-coincident. No finite sampling offset is safe —
   noding near-duplicate vertices creates micro edges bounding wedges
   thinner than any fixed offset.

These invariants are graded against an exact rational-arithmetic area
oracle (geom/exact.py, signed-trapezoid decomposition over Fractions)
in tests/test_exact_oracle.py, including 5000-example soaks.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from pygeoops_spark.geom.kernels import points_in_polygon, ring_signed_area
from pygeoops_spark.geom.wkb import (
    Geometry,
    MULTIPOLYGON,
    POLYGON,
    get_parts,
    multi,
)

SNAP = 1e-9


def _key(p, snap: float = SNAP) -> tuple[int, int]:
    return (round(p[0] / snap), round(p[1] / snap))


def _op_snap(geoms) -> float:
    """Scale-relative snap for one overlay operation: 1e-9 for unit-ish
    coordinates, growing with magnitude so the int64 grid keys stay
    exact (1e-9 absolute overflows the 2^53 mantissa near |x| ~ 1e7,
    e.g. projected metre coordinates)."""
    m = 1.0
    for g in geoms:
        if g is None:
            continue
        for p in get_parts(g):
            for ring in p.data:
                arr = np.asarray(ring, dtype=float)
                if arr.size:
                    m = max(m, float(np.abs(arr[:, :2]).max()))
    return max(SNAP, m * 1e-12)


def _snap_geometry(g: Geometry | None, grid: float) -> Geometry | None:
    """Round every coordinate to the grid (the coarse-retry ladder:
    near-coincident geometry becomes EXACTLY coincident, for which the
    shared-boundary rules are exact). Collapsed rings are dropped."""
    if g is None:
        return None
    parts_out = []
    for p in get_parts(g):
        if p.type_id != POLYGON:
            continue
        rings = []
        for ring in p.data:
            arr = np.asarray(ring, dtype=float)[:, :2]
            r = np.round(arr / grid) * grid
            keep = np.ones(len(r), dtype=bool)
            keep[1:] = (r[1:] != r[:-1]).any(axis=1)
            r = r[keep]
            if len(r) and (r[0] != r[-1]).any():
                r = np.vstack([r, r[0]])
            if len(r) >= 4 and abs(ring_signed_area(r)) > 0:
                rings.append(r)
        if rings:
            parts_out.append(Geometry(POLYGON, rings, p.dims))
    if not parts_out:
        return None
    if len(parts_out) == 1:
        return parts_out[0]
    return multi(MULTIPOLYGON, parts_out)


# lost-edge fraction above which an overlay retries on a coarse exact
# grid (200*snap — 20x the 10*snap coincidence band, so everything the
# tolerance machinery reasons about collapses to exact coincidence)
_LOST_RETRY_FRAC = 1e-3


def _area_of(g: Geometry | None) -> float:
    from pygeoops_spark.geom.kernels import polygon_area

    return 0.0 if g is None else polygon_area(g)


def _hull_area(polys: list[Geometry]) -> float:
    """Convex-hull area of all shell vertices — a cheap upper bound on
    any union of the inputs (catches double-counted near-duplicate
    rings that per-ring checks cannot see)."""
    from pygeoops_spark.geom.kernels import convex_hull_coords

    pts = [np.asarray(p.data[0], dtype=float)[:, :2] for p in polys if p.data]
    if not pts:
        return 0.0
    hull = convex_hull_coords(np.vstack(pts))
    if len(hull) < 4:
        return 0.0
    return abs(ring_signed_area(np.asarray(hull)))


def _poly_edges(poly: Geometry) -> list[tuple[np.ndarray, np.ndarray]]:
    """Directed edges of all rings (shell CCW, holes CW normalized)."""
    edges = []
    for ri, ring in enumerate(poly.data):
        arr = np.asarray(ring, dtype=float)[:, :2]
        area = ring_signed_area(arr)
        want_ccw = ri == 0
        if (area > 0) != want_ccw and area != 0:
            arr = arr[::-1]
        for i in range(len(arr) - 1):
            a, b = arr[i], arr[i + 1]
            if a[0] != b[0] or a[1] != b[1]:
                edges.append((a, b))
    return edges


def _seg_intersections(a1, a2, b1, b2) -> list[np.ndarray]:
    """Intersection points of segment a with segment b (0, 1 or 2 for
    collinear overlap endpoints)."""
    r = a2 - a1
    s = b2 - b1
    denom = r[0] * s[1] - r[1] * s[0]
    qp = b1 - a1
    if denom == 0:
        if qp[0] * r[1] - qp[1] * r[0] != 0:
            return []
        rr = float(r @ r)
        if rr == 0:
            return []
        out = []
        for q in (b1, b2):
            t = float((q - a1) @ r) / rr
            if 0.0 < t < 1.0:
                out.append(a1 + t * r)
        return out
    # segments sharing an endpoint cannot cross anywhere else: straight
    # lines meet at most once, so with the shared point already a node
    # a float "interior" crossing of two near-parallel pieces is
    # spurious — the ulp-scale angle between noded pieces of the SAME
    # original edge puts it arbitrarily far away (lever-arm effect; a
    # 0.006-offset phantom node ate a 4e-4 face in the union of two
    # difference outputs, caught by the exact-oracle soak). True
    # collinear overlap takes the denom == 0 branch above.
    for ea in (a1, a2):
        for eb in (b1, b2):
            if ea[0] == eb[0] and ea[1] == eb[1]:
                return []
    t = (qp[0] * s[1] - qp[1] * s[0]) / denom
    u = (qp[0] * r[1] - qp[1] * r[0]) / denom
    if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
        if 0.0 < t < 1.0:
            return [a1 + t * r]
    return []


def _edges_arrays(
    edges: list[tuple[np.ndarray, np.ndarray]]
) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) as (n,2) float arrays — the vectorized form of an
    edge list. Hoisted out of _node_edges (r07): an n-ary union calls
    _node_edges once per polygon with the other polygons as neighbors,
    so without caching every polygon's list was re-converted once per
    appearance in a neighbor set (~5x redundant array builds for the
    buffer-chain shapes; pure conversion, no geometric change)."""
    if not edges:
        z = np.empty((0, 2))
        return z, z
    return np.array([e[0] for e in edges]), np.array([e[1] for e in edges])


def _node_edges(
    edges: list[tuple[np.ndarray, np.ndarray]],
    others: list[list[tuple[np.ndarray, np.ndarray]]],
    snap: float = SNAP,
    edges_arr: tuple[np.ndarray, np.ndarray] | None = None,
    others_arr: list[tuple[np.ndarray, np.ndarray]] | None = None,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Split each edge at intersections with edges of the other sets,
    and at other-set vertices lying within ``10*snap`` of it.

    Per edge, the general-position intersection test against ALL bbox
    candidates is one vectorized numpy pass (block size caps the bool
    matrix at ~4M cells). Crossing points are the symmetric average of
    both edges' parameterizations — bit-identical when this function is
    called again with the roles swapped (see module docstring), so the
    two sides of an overlay always agree on cut coordinates. Crossings
    closer than ``snap`` to any of the four endpoints are left to the
    vertex pass (the endpoint itself is the node there)."""
    if not others:
        return edges
    if others_arr is not None:
        if sum(len(a) for a, _ in others_arr) == 0:
            return edges
        o1 = np.concatenate([a for a, _ in others_arr])
        o2 = np.concatenate([b for _, b in others_arr])
    else:
        all_other = [e for o in others for e in o]
        if not all_other:
            return edges
        o1 = np.array([e[0] for e in all_other])
        o2 = np.array([e[1] for e in all_other])
    ob_lo = np.minimum(o1, o2)
    ob_hi = np.maximum(o1, o2)
    s_all = o2 - o1
    n_e, n_o = len(edges), len(o1)
    e1, e2 = edges_arr if edges_arr is not None else _edges_arrays(edges)
    d_all = e2 - e1
    eb_lo = np.minimum(e1, e2)
    eb_hi = np.maximum(e1, e2)
    len_d_all = np.hypot(d_all[:, 0], d_all[:, 1])
    len_s_all = np.hypot(s_all[:, 0], s_all[:, 1])
    # cut list per edge: (t, x, y) — the POINT is authoritative (vertex
    # cuts carry the vertex's exact coordinates), t only orders them.
    cuts_per_edge: list[list[tuple[float, float, float]] | None] = [None] * n_e

    def _add_cut(i_e: int, t_v: float, px: float, py: float) -> None:
        if cuts_per_edge[i_e] is None:
            cuts_per_edge[i_e] = []
        cuts_per_edge[i_e].append((t_v, px, py))

    blk = max(1, 4_000_000 // max(n_o, 1))
    for b0 in range(0, n_e, blk):
        b1 = min(n_e, b0 + blk)
        cand = (
            (eb_lo[b0:b1, None, 0] <= ob_hi[None, :, 0])
            & (eb_hi[b0:b1, None, 0] >= ob_lo[None, :, 0])
            & (eb_lo[b0:b1, None, 1] <= ob_hi[None, :, 1])
            & (eb_hi[b0:b1, None, 1] >= ob_lo[None, :, 1])
        )
        ii, jj = np.nonzero(cand)
        if not len(ii):
            continue
        ii = ii + b0
        d = d_all[ii]
        s = s_all[jj]
        qp = o1[jj] - e1[ii]
        denom = d[:, 0] * s[:, 1] - d[:, 1] * s[:, 0]
        gen = denom != 0
        if gen.any():
            t = (qp[gen, 0] * s[gen, 1] - qp[gen, 1] * s[gen, 0]) / denom[gen]
            u = (qp[gen, 0] * d[gen, 1] - qp[gen, 1] * d[gen, 0]) / denom[gen]
            ld = len_d_all[ii[gen]]
            ls = len_s_all[jj[gen]]
            m = (
                (t * ld > snap)
                & ((1.0 - t) * ld > snap)
                & (u * ls > snap)
                & ((1.0 - u) * ls > snap)
            )
            # pairs sharing an endpoint bit-exactly cannot cross
            # anywhere else (straight lines meet once; the shared point
            # is already a node) — the float solve on two near-parallel
            # pieces of the SAME original edge otherwise yields a
            # phantom interior crossing arbitrarily far away (lever-arm
            # effect: a 0.006-offset phantom node ate a 4e-4 face in
            # union(A\\B, B\\A), caught by the exact-oracle soak)
            ei1, ei2 = e1[ii[gen]], e2[ii[gen]]
            oj1, oj2 = o1[jj[gen]], o2[jj[gen]]
            shared = (
                (ei1 == oj1).all(axis=1)
                | (ei1 == oj2).all(axis=1)
                | (ei2 == oj1).all(axis=1)
                | (ei2 == oj2).all(axis=1)
            )
            m &= ~shared
            if m.any():
                ig = ii[gen][m]
                jg = jj[gen][m]
                tm = t[m]
                um = u[m]
                pe = e1[ig] + tm[:, None] * d_all[ig]
                po = o1[jg] + um[:, None] * s_all[jg]
                pavg = (pe + po) / 2.0
                for i_e, t_v, px, py in zip(
                    ig.tolist(), tm.tolist(), pavg[:, 0].tolist(), pavg[:, 1].tolist()
                ):
                    _add_cut(i_e, t_v, px, py)
    # vertex-on-edge pass: other-set endpoints within 10*snap of an
    # edge's interior become cuts AT THE VERTEX COORDINATES. Covers
    # (near-)collinear partial overlap, T-junctions and near-incident
    # vertices — all the shapes where the crossing solve above has a
    # ~zero denominator. 10*snap matches _classify's on-boundary
    # tolerance so "cut here" and "shared boundary" stay in agreement.
    verts = np.unique(np.vstack([o1, o2]), axis=0)
    vtol = snap * 10.0
    n_v = len(verts)
    blk_v = max(1, 4_000_000 // max(n_v, 1))
    for b0 in range(0, n_e, blk_v):
        b1 = min(n_e, b0 + blk_v)
        cand = (
            (verts[None, :, 0] >= eb_lo[b0:b1, None, 0] - vtol)
            & (verts[None, :, 0] <= eb_hi[b0:b1, None, 0] + vtol)
            & (verts[None, :, 1] >= eb_lo[b0:b1, None, 1] - vtol)
            & (verts[None, :, 1] <= eb_hi[b0:b1, None, 1] + vtol)
        )
        ii, jj = np.nonzero(cand)
        if not len(ii):
            continue
        ii = ii + b0
        d = d_all[ii]
        dd = d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]
        v = verts[jj]
        w = v - e1[ii]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(dd == 0, -1.0, (w[:, 0] * d[:, 0] + w[:, 1] * d[:, 1]) / np.where(dd == 0, 1.0, dd))
        proj = e1[ii] + t[:, None] * d
        dist = np.hypot(v[:, 0] - proj[:, 0], v[:, 1] - proj[:, 1])
        ld = len_d_all[ii]
        m = (dist <= vtol) & (t * ld > vtol) & ((1.0 - t) * ld > vtol)
        if m.any():
            for i_e, t_v, px, py in zip(
                ii[m].tolist(), t[m].tolist(), v[m, 0].tolist(), v[m, 1].tolist()
            ):
                _add_cut(i_e, t_v, px, py)
    out = []
    for i, (a, b) in enumerate(edges):
        cuts = cuts_per_edge[i]
        if not cuts:
            out.append((a, b))
            continue
        pts = [a] + [np.array([px, py]) for _t, px, py in sorted(cuts)] + [b]
        for p, q in zip(pts[:-1], pts[1:]):
            if _key(p, snap) != _key(q, snap):
                out.append((p, q))
    return out


def _midpoints(edges: list[tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
    a = np.array([e[0] for e in edges])
    b = np.array([e[1] for e in edges])
    return (a + b) / 2


def _poly_segments(poly: Geometry) -> np.ndarray | None:
    """All boundary segments as an (m, 4) array [x1 y1 x2 y2]."""
    seg_arrays = []
    for part in get_parts(poly):
        for ring in part.data:
            arr = np.asarray(ring, dtype=float)[:, :2]
            if len(arr) >= 2:
                seg_arrays.append(np.hstack([arr[:-1], arr[1:]]))
    return np.vstack(seg_arrays) if seg_arrays else None


def _min_boundary_dist(mids: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """Per-midpoint min distance to any segment — one broadcast
    distance matrix per segment block (a per-segment python loop was
    the profiled hot spot), blocked so memory stays bounded for very
    large polygons."""
    from pygeoops_spark.geom.kernels import point_segment_distance

    px, py = mids[:, 0][:, None], mids[:, 1][:, None]
    block = max(int(4_000_000 / max(len(mids), 1)), 16)
    min_d = np.full(len(mids), np.inf)
    for s0 in range(0, len(segs), block):
        sb = segs[s0 : s0 + block]
        d = point_segment_distance(
            px, py, sb[None, :, 0], sb[None, :, 1], sb[None, :, 2], sb[None, :, 3]
        )
        min_d = np.minimum(min_d, d.min(axis=1))
    return min_d


def _onb_verdict(
    edges: list[tuple[np.ndarray, np.ndarray]],
    other: Geometry,
    snap: float,
    other_edges: list[tuple[np.ndarray, np.ndarray]] | None = None,
    segs_arr: np.ndarray | None = None,
    inside: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Keep/drop evidence for edges lying in ``other``'s coincidence
    band, as the exact off->0 limit of side sampling. Returns per-edge
    boolean arrays ``(coincident, codir, inside)``:

    * ``coincident`` — the edge midpoint lies ON other's boundary to
      ~100 ulps: line offset against the nearest canonically-oriented
      segment below ``scale * 1e-13`` with the projection inside the
      segment. Only here is point-in-polygon undefined. Coincidence
      MUST be judged against the same arrangement the stitcher walks:
      pass ``other_edges`` (other's NODED chain) whenever available —
      vertex-on-edge noding detours chains onto the opposite set's
      vertices (up to 10*snap off the original boundary), and a piece
      that is bit-identical to a detoured chain segment reads as
      "strictly inside by 5e-10" against the original segments,
      producing a spurious keep, a dangling spur, and a spurious
      coarse retry (the round-6 driver `difference` v2 regression).
    * ``codir`` — the edge runs the same way as that nearest segment.
      Since both edge sets are normalized interior-left (shell CCW,
      holes CW), co-direction means the interiors lie on the SAME side
      — the classical arrangement rule for coincident boundaries.
    * ``inside`` — exact point-in-polygon of the midpoint itself, the
      ground truth whenever not coincident (distances down to ~100
      ulps resolve fine in doubles; the band is 10*snap >> that).

    Replaces finite-offset side sampling: NO fixed offset is safe,
    because noding near-duplicate vertices produces micro edges
    bounding wedges thinner than any chosen offset — the exact
    rational oracle (tests/test_exact_oracle.py) caught the
    intersection kernel emptying a 0.09-area overlap through a
    100*snap sample, and a 14-degree corner wedge through a
    quarter-edge-length one.

    ``segs_arr`` (precomputed (m, 4) chain array) and ``inside``
    (precomputed raw midpoint PIP) let hot callers — polygon_union
    evaluates one verdict per (polygon, neighbor) onb subset — skip
    the rebuild/re-test; semantics are identical.
    """
    n = len(edges)
    empty = np.zeros(n, dtype=bool)
    if n == 0:
        return empty, empty, empty
    if segs_arr is not None:
        segs = segs_arr
    else:
        if other_edges is not None:
            seg_rows = [np.concatenate([e[0], e[1]]) for e in other_edges]
        else:
            seg_rows = [
                np.concatenate([e[0], e[1]])
                for p in _as_polys(other)
                for e in _poly_edges(p)
            ]
        if not seg_rows:
            return empty, empty, empty
        segs = np.vstack(seg_rows)
    if not len(segs):
        return empty, empty, empty
    mids = _midpoints(edges)
    px, py = mids[:, 0][:, None], mids[:, 1][:, None]
    from pygeoops_spark.geom.kernels import point_segment_distance

    jmin = np.zeros(n, dtype=int)
    best = np.full(n, np.inf)
    block = max(int(4_000_000 / n), 16)
    for s0 in range(0, len(segs), block):
        sb = segs[s0 : s0 + block]
        d = point_segment_distance(
            px, py, sb[None, :, 0], sb[None, :, 1], sb[None, :, 2], sb[None, :, 3]
        )
        loc = d.argmin(axis=1)
        dm = d[np.arange(n), loc]
        upd = dm < best
        best[upd] = dm[upd]
        jmin[upd] = loc[upd] + s0
    near = segs[jmin]
    dx, dy = near[:, 2] - near[:, 0], near[:, 3] - near[:, 1]
    vx, vy = mids[:, 0] - near[:, 0], mids[:, 1] - near[:, 1]
    seg_len2 = dx * dx + dy * dy
    seg_len = np.sqrt(seg_len2)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = (dx * vy - dy * vx) / seg_len
        t = (dx * vx + dy * vy) / seg_len2
    scale = np.maximum(1.0, np.abs(near).max(axis=1))
    scale = np.maximum(scale, np.abs(mids).max(axis=1))
    thr = scale * 1e-13
    with np.errstate(divide="ignore", invalid="ignore"):
        tpad = thr / seg_len
    coincident = (
        (np.abs(s) <= thr) & (t >= -tpad) & (t <= 1 + tpad) & (seg_len > 0)
    )
    edir = np.array([q - p for p, q in edges], dtype=float)
    codir = edir[:, 0] * dx + edir[:, 1] * dy > 0
    if inside is None:
        inside = points_in_polygon(mids[:, 0], mids[:, 1], other)
    return coincident, codir, np.asarray(inside, dtype=bool)


def _classify(
    edges: list[tuple[np.ndarray, np.ndarray]], poly: Geometry, snap: float = SNAP
) -> np.ndarray:
    """For each edge: 1 inside poly, 0 on boundary, -1 outside (by
    midpoint; on-boundary detected via distance test)."""
    if not edges:
        return np.empty(0, dtype=int)
    mids = _midpoints(edges)
    res = np.where(points_in_polygon(mids[:, 0], mids[:, 1], poly), 1, -1)
    segs = _poly_segments(poly)
    if segs is not None:
        res = np.where(_min_boundary_dist(mids, segs) <= snap * 10, 0, res)
    return res


def _cluster_nodes(uniq: np.ndarray, radius: int) -> np.ndarray:
    """Union-find over (n, 2) int64 grid keys: merge nodes within
    Chebyshev distance <= radius cells. Returns the canonical index per
    node (smallest member index of its cluster). Coarse spatial hashing
    keeps this O(n) for the sparse node sets overlays produce."""
    n = len(uniq)
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    coarse = uniq // max(radius, 1)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i in range(n):
        buckets[(int(coarse[i, 0]), int(coarse[i, 1]))].append(i)
    for i in range(n):
        cx, cy = int(coarse[i, 0]), int(coarse[i, 1])
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for j in buckets.get((cx + dx, cy + dy), ()):
                    if j <= i:
                        continue
                    if (
                        abs(int(uniq[i, 0]) - int(uniq[j, 0])) <= radius
                        and abs(int(uniq[i, 1]) - int(uniq[j, 1])) <= radius
                    ):
                        ri, rj = find(i), find(j)
                        if ri != rj:
                            if ri < rj:
                                parent[rj] = ri
                            else:
                                parent[ri] = rj
    return np.array([find(i) for i in range(n)])


def _stitch(
    edges: list[tuple[np.ndarray, np.ndarray]], snap: float = SNAP
) -> tuple[list[np.ndarray], float]:
    """Assemble directed edges into closed rings. At branching vertices
    pick the most counter-clockwise continuation (keeps minimal rings).

    Two-phase: the fast path uses raw grid keys and NO degenerate-input
    machinery — a clean overlay (the overwhelming majority, e.g. every
    hull union inside buffer_by_m) walks with zero discarded edges, so
    node clustering / degree repair / gap bridging would be pure
    overhead (~12% of the union profile). Only when the fast walk
    drops or bridges anything does the robust path re-run with the
    full tolerance machinery.

    Returns ``(rings, lost_frac)`` — the fraction of total edge length
    that was discarded (repair removals + dangling chains). A material
    ``lost_frac`` is the callers' signal that the input boundary graph
    was classification-inconsistent (e.g. N-way near-coincident seams
    whose pairwise overlap/gap signs disagree) and a coarser-grid
    retry is warranted; tolerance-scale sliver losses stay far below
    any threshold.
    """
    rings, clean, _lost = _stitch_core(edges, snap, robust=False)
    if clean:
        return rings, 0.0
    rings, _clean, lost_frac = _stitch_core(edges, snap, robust=True)
    return rings, lost_frac


def _stitch_core(
    edges: list[tuple[np.ndarray, np.ndarray]], snap: float, robust: bool
) -> tuple[list[np.ndarray], bool, float]:
    # dedupe identical directed edges, then drop anti-parallel pairs
    # entirely (BOTH members): an edge traversed in both directions is
    # an interior seam between coincident boundaries — keeping either
    # one forms a degenerate 2-edge ring in the max-turn walk and
    # consumes an edge a real ring needed.
    # Keys are snapped in ONE numpy pass (per-endpoint _key calls were
    # ~20% of the union profile). In robust mode they are CLUSTERED
    # within the 10*snap classification tolerance: dropped micro-pieces
    # (e.g. a 1.4*snap connector between a vertex and a degenerate
    # crossing, classified as shared boundary and absorbed by the other
    # operand) would otherwise leave a gap wider than one grid cell and
    # the walk would discard the whole ring as an open chain.
    if not edges:
        return [], True, 0.0
    a_arr = np.array([e[0] for e in edges])
    b_arr = np.array([e[1] for e in edges])
    ka_all = np.round(a_arr / snap).astype(np.int64)
    kb_all = np.round(b_arr / snap).astype(np.int64)
    n_edge = len(edges)
    if robust:
        uniq, inv = np.unique(
            np.vstack([ka_all, kb_all]), axis=0, return_inverse=True
        )
        canon = _cluster_nodes(uniq, radius=10)
        ca_idx = canon[inv[:n_edge]]
        cb_idx = canon[inv[n_edge:]]
        keys = [
            ((int(uniq[ca_idx[i], 0]), int(uniq[ca_idx[i], 1])),
             (int(uniq[cb_idx[i], 0]), int(uniq[cb_idx[i], 1])))
            for i in range(n_edge)
        ]
    else:
        ka_l = ka_all.tolist()
        kb_l = kb_all.tolist()
        keys = [
            ((ka_l[i][0], ka_l[i][1]), (kb_l[i][0], kb_l[i][1]))
            for i in range(n_edge)
        ]
    # degenerate: both endpoints on one node (zero-length after snap /
    # collapsed cluster)
    live = [i for i in range(n_edge) if keys[i][0] != keys[i][1]]
    edges = [edges[i] for i in live]
    keys = [keys[i] for i in live]
    seen = set(keys)
    kept_idx: list[int] = []
    emitted: set[tuple] = set()
    for i, k in enumerate(keys):
        if k in emitted:
            continue
        if (k[1], k[0]) in seen:
            continue
        emitted.add(k)
        kept_idx.append(i)
    edge_keys = [keys[i] for i in kept_idx]
    edges = [edges[i] for i in kept_idx]
    # loss accounting (robust mode): reference length BEFORE repair;
    # everything not emitted into a ring (repair removals + dangling
    # chains) counts as lost — the caller's catastrophic-loss signal
    total_len = sum(
        math.hypot(b[0] - a[0], b[1] - a[1]) for a, b in edges
    )
    emitted_len = 0.0

    # degree repair (robust mode): in a clean overlay every node has
    # out-degree == in-degree (each face boundary passes through). A
    # spurious seam edge — one operand's boundary hugging the other's
    # corner inside the tolerance band, kept with no anti-parallel
    # partner — adds exactly one surplus-out node and one surplus-in
    # node; the max-turn walk then takes it, dead-ends, and discards a
    # whole valid ring. Remove the shortest surplus->deficit edge until
    # balanced. The fast path instead treats ANY imbalance as the
    # degenerate-input signal and defers to the robust re-run.
    clean = True
    while True:
        outdeg: dict[tuple, int] = defaultdict(int)
        indeg: dict[tuple, int] = defaultdict(int)
        for ka, kb in edge_keys:
            outdeg[ka] += 1
            indeg[kb] += 1
        cands = [
            i
            for i, (ka, kb) in enumerate(edge_keys)
            if outdeg[ka] > indeg[ka] and indeg[kb] > outdeg[kb]
        ]
        if not cands:
            if not robust and any(
                outdeg.get(k, 0) != indeg.get(k, 0)
                for k in set(outdeg) | set(indeg)
            ):
                return [], False, 0.0
            break
        if not robust:
            return [], False, 0.0
        drop = min(
            cands,
            key=lambda i: math.hypot(
                edges[i][1][0] - edges[i][0][0], edges[i][1][1] - edges[i][0][1]
            ),
        )
        del edges[drop]
        del edge_keys[drop]

    out_map: dict[tuple, list[int]] = defaultdict(list)
    for i, (ka, _kb) in enumerate(edge_keys):
        out_map[ka].append(i)
    used = [False] * len(edges)
    rings: list[np.ndarray] = []
    # Hierholzer-style walk with turn preference: whenever the path
    # returns to ANY node already on it, that sub-cycle is pinched off
    # as a ring and the walk continues from the remaining path. A plain
    # "close only at the start node" walk discards a whole valid ring
    # when it happens to start on a dangling micro-chain (e.g. the
    # edges of a sub-tolerance sliver whose connector was absorbed) and
    # dead-ends after traversing the ring.
    for start in range(len(edges)):
        if used[start]:
            continue
        used[start] = True
        stack = [start]
        nodes = [edge_keys[start][0]]  # nodes[i] = start node of stack[i]
        node_pos = {nodes[0]: 0}
        while stack:
            cur = stack[-1]
            end_key = edge_keys[cur][1]
            i0 = node_pos.get(end_key)
            if i0 is not None:
                cycle = stack[i0:]
                ring = [edges[e][0] for e in cycle] + [edges[cycle[-1]][1]]
                if len(cycle) >= 3:
                    rings.append(np.array(ring))
                    emitted_len += sum(
                        math.hypot(
                            edges[e][1][0] - edges[e][0][0],
                            edges[e][1][1] - edges[e][0][1],
                        )
                        for e in cycle
                    )
                del stack[i0:]
                for nk in nodes[i0:]:
                    node_pos.pop(nk, None)
                del nodes[i0:]
                continue
            cands = [i for i in out_map[end_key] if not used[i]]
            if not cands and not robust:
                # fast path: a dead end means degenerate input — defer
                # to the robust re-run (clustered keys + repair +
                # bridging) instead of discarding anything here
                return [], False, 0.0
            if not cands:
                # dead end: bridge a tolerance-scale gap. The onb
                # keep/drop rules can absorb a connector piece up to
                # ~100 cells long (coincidence-band scale), leaving the
                # ring unclosable by exact key match; jump to the
                # nearest node (within 1.5x the scale) that is on the
                # path or still has an unused out-edge. Area error is
                # bounded by gap * perimeter — the discarded-ring
                # alternative loses the whole face.
                best_key, best_d = None, 151
                for nk in node_pos:
                    dch = max(abs(nk[0] - end_key[0]), abs(nk[1] - end_key[1]))
                    if 0 < dch < best_d:
                        best_key, best_d = nk, dch
                for nk, lst in out_map.items():
                    if any(not used[i] for i in lst):
                        dch = max(abs(nk[0] - end_key[0]), abs(nk[1] - end_key[1]))
                        if 0 < dch < best_d:
                            best_key, best_d = nk, dch
                if best_key is None:
                    break  # genuinely dangling: discard (rings already emitted)
                if best_key in node_pos and not any(
                    not used[i] for i in out_map.get(best_key, ())
                ):
                    i0 = node_pos[best_key]
                    cycle = stack[i0:]
                    ring = [edges[e][0] for e in cycle] + [edges[cycle[-1]][1]]
                    if len(cycle) >= 3:
                        rings.append(np.array(ring))
                        emitted_len += sum(
                            math.hypot(
                                edges[e][1][0] - edges[e][0][0],
                                edges[e][1][1] - edges[e][0][1],
                            )
                            for e in cycle
                        )
                    del stack[i0:]
                    for nk in nodes[i0:]:
                        node_pos.pop(nk, None)
                    del nodes[i0:]
                    continue
                cands = [i for i in out_map[best_key] if not used[i]]
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # rightmost (sharpest clockwise) turn relative to the
                # incoming direction keeps each simple loop separate at
                # figure-eight vertices (touching rings stay two rings)
                a, b = edges[cur]
                din = b - a
                ain = math.atan2(din[1], din[0])

                def turn(i):
                    dv = edges[i][1] - edges[i][0]
                    ang = math.atan2(dv[1], dv[0]) - (ain + math.pi)
                    while ang <= 0:
                        ang += 2 * math.pi
                    while ang > 2 * math.pi:
                        ang -= 2 * math.pi
                    return ang

                nxt = max(cands, key=turn)
            used[nxt] = True
            node_pos[end_key] = len(stack)
            nodes.append(end_key)
            stack.append(nxt)
    lost_frac = (
        max(0.0, total_len - emitted_len) / total_len if total_len > 0 else 0.0
    )
    return rings, clean, lost_frac


def _rings_to_polygons(
    rings: list[np.ndarray], dims: str = "xy", snap: float = 0.0
) -> Geometry | None:
    shells, holes = [], []
    for r in rings:
        if len(r) < 4:
            continue
        # stitched rings can close within tolerance rather than
        # bit-exactly (clustered nodes / bridged gaps); emit a properly
        # closed ring so downstream consumers and the shoelace see the
        # exact closure
        if r[-1, 0] != r[0, 0] or r[-1, 1] != r[0, 1]:
            r = np.vstack([r, r[0]])
        area = ring_signed_area(r)
        # min-area filter is scale-relative like the noding tolerance:
        # node clustering / gap bridging can produce sliver rings of
        # width up to ~2*snap whose area (width*perimeter/2) exceeds
        # the absolute SNAP floor at projected-CRS magnitudes; a ring
        # thinner than 2*snap is below the noding resolution and is
        # stitching debris, not geometry
        seg = np.diff(r, axis=0)
        perim = float(np.hypot(seg[:, 0], seg[:, 1]).sum())
        if abs(area) < max(SNAP, snap * perim):
            continue
        (shells if area > 0 else holes).append(r)
    if not shells:
        return None
    polys = [[s] for s in shells]
    for h in holes:
        # assign to the smallest shell containing it
        cx, cy = h[:-1, 0].mean(), h[:-1, 1].mean()
        best, best_area = None, np.inf
        for i, s in enumerate(shells):
            a = abs(ring_signed_area(s))
            if a < best_area and points_in_polygon(
                np.array([cx]), np.array([cy]), Geometry(POLYGON, [s], dims)
            )[0]:
                best, best_area = i, a
        if best is not None:
            polys[best].append(h)
    if len(polys) == 1:
        return Geometry(POLYGON, polys[0], dims)
    return multi(MULTIPOLYGON, [Geometry(POLYGON, p, dims) for p in polys])


def _as_polys(geom: Geometry) -> list[Geometry]:
    return [p for p in get_parts(geom) if p.type_id == POLYGON and p.data]


def _codirected_near_duplicate(
    kept_a: list[tuple[np.ndarray, np.ndarray]],
    kept_b: list[tuple[np.ndarray, np.ndarray]],
    snap: float,
) -> bool:
    """True when some kept B-side shared edge lies within the noding
    tolerance of a CO-DIRECTED kept A-side shared edge without being
    bit-identical to it: the double-keep signature of a sub-tolerance
    strip bounded twice (once per rule). Distance is point-to-segment
    (the two chains may be cut at different nodes). Both lists are
    boundary-scale small, so the pairwise scan is cheap."""
    tol = snap * 20
    for p2, q2 in kept_b:
        m2 = (p2 + q2) / 2
        d2 = q2 - p2
        l2 = math.hypot(d2[0], d2[1])
        if l2 == 0:
            continue
        for p1, q1 in kept_a:
            d1 = q1 - p1
            l1 = math.hypot(d1[0], d1[1])
            if l1 == 0:
                continue
            # co-directed: parallel within tolerance and same sense
            if d1[0] * d2[0] + d1[1] * d2[1] <= 0:
                continue
            if abs(d1[0] * d2[1] - d1[1] * d2[0]) > tol * (l1 + l2):
                continue
            # midpoint of the B edge within tol of the A segment
            t = ((m2 - p1) @ d1) / (l1 * l1)
            t = min(1.0, max(0.0, t))
            c = p1 + t * d1
            if math.hypot(m2[0] - c[0], m2[1] - c[1]) > tol:
                continue
            # exactly-coincident duplicates collapse in _stitch
            if (
                p1[0] == p2[0] and p1[1] == p2[1]
                and q1[0] == q2[0] and q1[1] == q2[1]
            ):
                continue
            return True
    return False


def polygon_difference(
    a: Geometry, b: Geometry, _snapped: bool = False
) -> Geometry | None:
    """A \\ B for (multi)polygons; None when empty."""
    pa, pb = _as_polys(a), _as_polys(b)
    if not pa:
        return None
    if not pb:
        return a
    snap = _op_snap([a, b])
    ea = [e for p in pa for e in _poly_edges(p)]
    eb = [e for p in pb for e in _poly_edges(p)]
    na = _node_edges(ea, [eb], snap)
    nb = _node_edges(eb, [ea], snap)
    ca = _classify(na, b, snap)
    cb = _classify(nb, a, snap)
    keep: list[tuple[np.ndarray, np.ndarray]] = []
    for (p, q), c in zip(na, ca):
        if c == -1:
            keep.append((p, q))
    for (p, q), c in zip(nb, cb):
        if c == 1:
            keep.append((q, p))  # reversed: B boundary inside A bounds a hole
    # shared boundary edges: A-edge on B's boundary. Keep it only when
    # the A-interior side (left) is outside B: for a midpoint strictly
    # off B's boundary that is exact point-in-polygon of the midpoint
    # itself; for a bit-coincident midpoint it is anti-direction with
    # the underlying B segment (interiors on opposite sides).
    onb_a = [na[i] for i in np.nonzero(ca == 0)[0]]
    kept_shared_a: list[tuple[np.ndarray, np.ndarray]] = []
    coin_a, codir_a, in_a = _onb_verdict(onb_a, b, snap, other_edges=nb)
    for (p, q), coin, cod, ins in zip(onb_a, coin_a, codir_a, in_a):
        left_in_b = cod if coin else ins
        if not left_in_b:
            keep.append((p, q))
            kept_shared_a.append((p, q))
    # B-edges on A's boundary: the result can be bounded by B's own
    # boundary inside a sub-tolerance strip (B's edge hugging A's edge
    # from inside, classified 0 rather than 1). Keep reversed iff B's
    # RIGHT side (its exterior) lies inside A — that is where A \ B
    # lives: midpoint-in-A when strictly off A's boundary,
    # anti-direction when coincident. Exact-shared duplicates collapse
    # in _stitch; tolerance-zone double-keeps are removed by its
    # degree repair.
    onb_b = [nb[i] for i in np.nonzero(cb == 0)[0]]
    kept_shared_b: list[tuple[np.ndarray, np.ndarray]] = []
    coin_b, codir_b, in_b = _onb_verdict(onb_b, a, snap, other_edges=na)
    for (p, q), coin, cod, ins in zip(onb_b, coin_b, codir_b, in_b):
        right_in_a = (not cod) if coin else ins
        if right_in_a:
            keep.append((q, p))
            kept_shared_b.append((q, p))
    rings, lost = _stitch(keep, snap)
    result = _rings_to_polygons(rings, a.dims, snap)
    if not _snapped:
        # retry with exactly-coincident inputs when the boundary graph
        # was classification-inconsistent (material edge loss) or the
        # result violates A \ B <= A (double-counted near-duplicate
        # rings survive the clean walk undetected)
        aa = sum(_area_of(p) for p in pa)
        bad = lost > _LOST_RETRY_FRAC or _area_of(result) > aa * (1 + 1e-7) + snap
        # both shared-edge rules bounding the SAME tolerance strip
        # double-subtract when each survives as a complete ring (e.g. a
        # plug hugging a hole at sub-tolerance offset: A's hole ring
        # AND B's reversed boundary both kept, co-directed, a few snap
        # cells apart — complete cycles pass the clean fast-path walk,
        # so neither dedup nor degree repair fires, and the result is
        # SMALLER than A, which the area trigger above cannot see).
        # Exactly-coincident pairs collapse in _stitch and are skipped.
        if not bad and kept_shared_a and kept_shared_b:
            bad = _codirected_near_duplicate(kept_shared_a, kept_shared_b, snap)
        if bad:
            grid = snap * 200
            a2 = _snap_geometry(a, grid)
            b2 = _snap_geometry(b, grid)
            if a2 is None:
                return None
            if b2 is None:
                return a2
            return polygon_difference(a2, b2, _snapped=True)
    return result


def polygon_intersection(
    a: Geometry, b: Geometry, _snapped: bool = False
) -> Geometry | None:
    pa, pb = _as_polys(a), _as_polys(b)
    if not pa or not pb:
        return None
    snap = _op_snap([a, b])
    ea = [e for p in pa for e in _poly_edges(p)]
    eb = [e for p in pb for e in _poly_edges(p)]
    na = _node_edges(ea, [eb], snap)
    nb = _node_edges(eb, [ea], snap)
    ca = _classify(na, b, snap)
    cb = _classify(nb, a, snap)
    keep = [(p, q) for (p, q), c in zip(na, ca) if c == 1]
    keep += [(p, q) for (p, q), c in zip(nb, cb) if c == 1]
    # co-directed shared edges count once. An A-edge on B's boundary
    # bounds A ∩ B iff its left (A-interior) side is inside B: exact
    # midpoint point-in-polygon when strictly off B's boundary,
    # co-direction with the underlying B segment when bit-coincident
    # (interiors on the same side — the arrangement rule).
    seen = {(_key(p, snap), _key(q, snap)) for p, q in keep}
    onb_a = [e for e, c in zip(na, ca) if c == 0]
    coin_a, codir_a, in_a = _onb_verdict(onb_a, b, snap, other_edges=nb)
    for (p, q), coin, cod, ins in zip(onb_a, coin_a, codir_a, in_a):
        if (_key(p, snap), _key(q, snap)) in seen:
            continue
        if cod if coin else ins:
            keep.append((p, q))
            seen.add((_key(p, snap), _key(q, snap)))
    # B-edges on A's boundary bounding a sub-tolerance strip of A ∩ B:
    # keep as-is iff B's interior side (left) lies inside A — same
    # limit rule against A. Mirrors the B-side rule in
    # polygon_difference; duplicates cleaned by _stitch (key dedupe +
    # degree repair).
    onb_b = [e for e, c in zip(nb, cb) if c == 0]
    coin_b, codir_b, in_b = _onb_verdict(onb_b, a, snap, other_edges=na)
    for (p, q), coin, cod, ins in zip(onb_b, coin_b, codir_b, in_b):
        if (_key(p, snap), _key(q, snap)) in seen:
            continue
        if cod if coin else ins:
            keep.append((p, q))
            seen.add((_key(p, snap), _key(q, snap)))
    rings, lost = _stitch(keep, snap)
    result = _rings_to_polygons(rings, a.dims, snap)
    if not _snapped:
        bound = min(sum(_area_of(p) for p in pa), sum(_area_of(p) for p in pb))
        bad = lost > _LOST_RETRY_FRAC or _area_of(result) > bound * (1 + 1e-7) + snap
        if bad:
            grid = snap * 200
            a2 = _snap_geometry(a, grid)
            b2 = _snap_geometry(b, grid)
            if a2 is None or b2 is None:
                return None
            return polygon_intersection(a2, b2, _snapped=True)
    return result


def polygon_union(
    polys: list[Geometry], _snapped: bool = False
) -> Geometry | None:
    """N-ary union: keep boundary edges not strictly inside any other
    input polygon; anti-directed shared edges cancel. None inputs
    (empty operands, e.g. an empty difference result) are skipped."""
    flat = [p for g in polys if g is not None for p in _as_polys(g)]
    flat = [p for p in flat if p.data and abs(ring_signed_area(np.asarray(p.data[0]))) > 0]
    if not flat:
        return None
    if len(flat) == 1:
        return flat[0]
    snap = _op_snap(flat)
    per_poly_edges = [_poly_edges(p) for p in flat]
    # bbox prefilter (exact): a polygon whose bbox is disjoint from
    # polygon i's bbox can neither cut i's edges nor contain any of
    # them — skip both the noding input and the classify pass. Turns
    # the O(n^2) classify loop into O(n * overlapping) — e.g. a buffer
    # chain of k hulls does ~3k classifies instead of k^2.
    boxes = []
    for p in flat:
        arr = np.asarray(p.data[0], dtype=float)
        boxes.append((arr[:, 0].min(), arr[:, 1].min(), arr[:, 0].max(), arr[:, 1].max()))

    def _bbox_overlap(a, b):
        # expanded by the shared-boundary tolerance: polygons whose
        # bboxes are disjoint by less than snap*10 can still have
        # near-coincident edges that _classify must see as on-boundary
        eps = snap * 10
        return not (
            a[2] < b[0] - eps or b[2] < a[0] - eps or a[3] < b[1] - eps or b[3] < a[1] - eps
        )

    keep: list[tuple[np.ndarray, np.ndarray]] = []
    seg_cache = [None] * len(flat)
    noded_segs: list[np.ndarray | None] = [None] * len(flat)
    # noded chains for ALL polygons first: onb verdicts below must be
    # judged against the NODED arrangement (chains detour onto the
    # opposite set's vertices), not the original boundaries
    near_all = [
        [j for j in range(len(flat)) if j != i and _bbox_overlap(boxes[i], boxes[j])]
        for i in range(len(flat))
    ]
    # per-polygon edge arrays built ONCE and shared across every
    # _node_edges call this polygon appears in (self or neighbor) —
    # see _edges_arrays
    edge_arrs = [_edges_arrays(e) for e in per_poly_edges]
    noded_all = [
        _node_edges(
            per_poly_edges[i],
            [per_poly_edges[j] for j in near_all[i]],
            snap,
            edges_arr=edge_arrs[i],
            others_arr=[edge_arrs[j] for j in near_all[i]],
        )
        if near_all[i]
        else per_poly_edges[i]
        for i in range(len(flat))
    ]
    for i, p in enumerate(flat):
        near = near_all[i]
        noded = noded_all[i]
        inside_any = np.zeros(len(noded), dtype=bool)
        onb_any = np.zeros(len(noded), dtype=bool)
        per_j: list[tuple[int, np.ndarray, np.ndarray]] = []  # (j, raw pip, onb mask)
        if near and noded:
            # one midpoint build shared across the per-neighbor passes
            # (rebuilding it for every j was the profiled union hot
            # spot); segments cached per polygon across the outer loop.
            # Per-j semantics preserved: a midpoint ON j's boundary is
            # NOT inside j even when the crossing test says so. The raw
            # PIP and onb masks are kept per neighbor so the onb-keep
            # phase below can reuse them instead of re-testing.
            mids = _midpoints(noded)
            for j in near:
                if seg_cache[j] is None:
                    s = _poly_segments(flat[j])
                    seg_cache[j] = s if s is not None else False
                segs = seg_cache[j]
                if segs is not False:
                    onb_j = _min_boundary_dist(mids, segs) <= snap * 10
                else:
                    onb_j = np.zeros(len(noded), dtype=bool)
                pip_j = np.asarray(
                    points_in_polygon(mids[:, 0], mids[:, 1], flat[j]), dtype=bool
                )
                per_j.append((j, pip_j, onb_j))
                inside_any |= pip_j & ~onb_j
                onb_any |= onb_j
        # shared/near-shared boundary edges: keep iff the RIGHT side
        # (this polygon's own exterior — interior is left of a CCW
        # shell / normalized hole edge) is not covered by any other
        # polygon, evaluated in the off->0 limit per neighbor: exact
        # midpoint point-in-polygon when strictly off j's boundary,
        # anti-direction with j's underlying segment when
        # bit-coincident (anti-directed shared CHAINS cancel even when
        # the two sides were noded at different cut points — edge-level
        # key matching cannot pair those). Exact co-directed duplicates
        # both survive and collapse via _stitch's directed-key dedupe,
        # near-identical ones via its degree repair.
        onb_keep = onb_any & ~inside_any
        if onb_keep.any():
            onb_idx = [
                k
                for k in np.nonzero(onb_keep)[0]
                if math.hypot(*(noded[k][1] - noded[k][0])) > 0
            ]
            covered = np.zeros(len(onb_idx), dtype=bool)
            for j, pip_j, onb_j in per_j:
                # edges >= the 10*snap band away from j's boundary can
                # never be coincident with its noded chain (detours are
                # bounded by the band): the off->0 limit is just the
                # raw midpoint PIP already computed above. Only the
                # true onb-vs-j subset needs the coincidence test.
                sel = [s for s, k in enumerate(onb_idx) if onb_j[k]]
                for s, k in enumerate(onb_idx):
                    if not onb_j[k]:
                        covered[s] |= pip_j[k]
                if sel:
                    if noded_segs[j] is None:
                        noded_segs[j] = np.array(
                            [np.concatenate(e) for e in noded_all[j]]
                        )
                    sub = [noded[onb_idx[s]] for s in sel]
                    coin, cod, ins = _onb_verdict(
                        sub,
                        flat[j],
                        snap,
                        segs_arr=noded_segs[j],
                        inside=pip_j[[onb_idx[s] for s in sel]],
                    )
                    cov_sub = np.where(coin, ~cod, ins)
                    for s, c in zip(sel, cov_sub):
                        covered[s] |= c
            for k, cov in zip(onb_idx, covered):
                if not cov:
                    keep.append(noded[k])
        for k, (p1, p2) in enumerate(noded):
            if not inside_any[k] and not onb_any[k]:
                keep.append((p1, p2))
    rings, lost = _stitch(keep, snap)
    result = _rings_to_polygons(rings, flat[0].dims, snap)
    if not _snapped:
        bad = lost > _LOST_RETRY_FRAC
        if not bad and result is not None:
            bad = _area_of(result) > _hull_area(flat) * (1 + 1e-7) + snap
        if bad:
            grid = snap * 200
            snapped = [g for g in (_snap_geometry(p, grid) for p in flat) if g is not None]
            if not snapped:
                return None
            return polygon_union(snapped, _snapped=True)
    return result


def dissolve_partition(polys: list[Geometry]) -> Geometry | None:
    """Union of interior-disjoint polygons whose shared boundaries lie
    on axis-aligned lines — the exact shape produced by subdivide tiling
    (+ per-tile difference), which cuts on vertical/horizontal lines.

    Instead of polygon_union's pairwise noding + point-in-polygon
    classification (quadratic in coordinates for a tile fan-out), shared
    boundaries are cancelled by signed 1D coverage per cut line: every
    axis-aligned directed edge becomes a signed interval on its line;
    summing coverage over elementary intervals cancels the anti-directed
    overlap between neighbouring tiles even when the two sides split the
    shared edge at different points. Surviving segments + all
    non-axis-aligned edges stitch into rings as usual.

    Input contract: pieces are interior-disjoint (tile results are, by
    construction). Violations that surface at the boundary level —
    coincident same-direction segments (|coverage| > 1), shared diagonal
    edges, stitch failures — are detected via interval algebra plus an
    area-conservation check (union area of a partition == sum of part
    areas) and fall back to the general polygon_union. Fully interior
    overlaps without coincident boundaries are NOT detected (both sides
    of the area check see the same sum) — don't call this on arbitrary
    possibly-overlapping sets; use polygon_union there.

    Mirrors the recombination semantics of the reference's
    difference_all_tiled (shapely.unary_union over interior-disjoint
    tile results, /root/reference/pygeoops/_difference.py:103-110).
    """
    from pygeoops_spark.geom.kernels import polygon_area

    flat = [p for g in polys if g is not None for p in _as_polys(g)]
    flat = [p for p in flat if p.data and abs(ring_signed_area(np.asarray(p.data[0]))) > 0]
    if not flat:
        return None
    if len(flat) == 1:
        return flat[0]

    keep: list[tuple[np.ndarray, np.ndarray]] = []
    # line buckets: snapped coordinate -> list of (lo, hi, sign, coord)
    vert: dict[int, list] = defaultdict(list)
    horiz: dict[int, list] = defaultdict(list)
    for p in flat:
        for a, b in _poly_edges(p):
            if a[0] == b[0]:
                sign = 1 if b[1] > a[1] else -1
                lo, hi = (a[1], b[1]) if sign == 1 else (b[1], a[1])
                vert[round(a[0] / SNAP)].append((lo, hi, sign, a[0]))
            elif a[1] == b[1]:
                sign = 1 if b[0] > a[0] else -1
                lo, hi = (a[0], b[0]) if sign == 1 else (b[0], a[0])
                horiz[round(a[1] / SNAP)].append((lo, hi, sign, a[1]))
            else:
                keep.append((a, b))

    def _emit(bucket: dict[int, list], vertical: bool) -> bool:
        for ivals in bucket.values():
            if len(ivals) == 1:
                lo, hi, sign, c = ivals[0]
                pts = ((c, lo), (c, hi)) if vertical else ((lo, c), (hi, c))
                a, b = (pts if sign == 1 else pts[::-1])
                keep.append((np.array(a), np.array(b)))
                continue
            # elementary breakpoints (snap-deduped, keep representative float)
            reps: dict[int, float] = {}
            for lo, hi, _s, _c in ivals:
                reps.setdefault(round(lo / SNAP), lo)
                reps.setdefault(round(hi / SNAP), hi)
            keys = sorted(reps, key=lambda k: reps[k])
            idx = {k: i for i, k in enumerate(keys)}
            cov = [0] * len(keys)
            for lo, hi, sign, _c in ivals:
                cov[idx[round(lo / SNAP)]] += sign
                cov[idx[round(hi / SNAP)]] -= sign
            c = ivals[0][3]
            run_sign, run_start = 0, 0.0
            net = 0
            for i, k in enumerate(keys):
                net += cov[i]
                v = reps[k]
                if run_sign and (i == len(keys) - 1 or net != run_sign):
                    a = (c, run_start) if vertical else (run_start, c)
                    b = (c, v) if vertical else (v, c)
                    if run_sign == 1:
                        keep.append((np.array(a), np.array(b)))
                    else:
                        keep.append((np.array(b), np.array(a)))
                    run_sign = 0
                if net != 0 and run_sign == 0 and i < len(keys) - 1:
                    if abs(net) > 1:
                        return False  # pieces overlap: not a partition
                    run_sign, run_start = net, v
            if net != 0:
                return False  # unbalanced interval algebra
        return True

    ok = _emit(vert, True) and _emit(horiz, False)
    result = _rings_to_polygons(_stitch(keep)[0], flat[0].dims) if ok else None
    target = sum(polygon_area(p) for p in flat)
    if (
        result is None
        or abs(polygon_area(result) - target) > 1e-8 * max(target, 1.0)
    ):
        # fall back with the None-filtered inputs: polygon_union does
        # not accept None elements
        return polygon_union([g for g in polys if g is not None])
    return result


def line_intersection(line_coords: np.ndarray, poly: Geometry) -> list[np.ndarray]:
    """Line clipped to polygon: split at boundary crossings, keep pieces
    whose midpoint is inside."""
    chains = line_difference(line_coords, poly, keep_outside=False)
    return chains


def line_difference(
    line_coords: np.ndarray, poly: Geometry, keep_outside: bool = True
) -> list[np.ndarray]:
    """Line minus polygon: split at boundary crossings, keep pieces
    whose midpoint is outside (or inside when keep_outside=False)."""
    edges = [
        (line_coords[i, :2].astype(float), line_coords[i + 1, :2].astype(float))
        for i in range(len(line_coords) - 1)
    ]
    pedges = [e for p in _as_polys(poly) for e in _poly_edges(p)]
    noded = _node_edges(edges, [pedges])
    if not noded:
        return []
    mids = np.array([(a + b) / 2 for a, b in noded])
    inside = points_in_polygon(mids[:, 0], mids[:, 1], poly)
    outside = ~inside if keep_outside else inside
    chains: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for (a, b), keep in zip(noded, outside):
        if not keep:
            if len(cur) >= 2:
                chains.append(cur)
            cur = []
            continue
        if cur and _key(cur[-1]) == _key(a):
            cur.append(b)
        else:
            if len(cur) >= 2:
                chains.append(cur)
            cur = [a, b]
    if len(cur) >= 2:
        chains.append(cur)
    return [np.array(c) for c in chains]
