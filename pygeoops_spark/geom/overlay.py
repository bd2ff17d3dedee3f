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
to a 1e-9 grid during stitching (mirrors the reference's 1e-8 dedup +
set_precision fallbacks in _centerline.py:146-172).
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


def _key(p) -> tuple[int, int]:
    return (round(p[0] / SNAP), round(p[1] / SNAP))


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
    t = (qp[0] * s[1] - qp[1] * s[0]) / denom
    u = (qp[0] * r[1] - qp[1] * r[0]) / denom
    if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
        if 0.0 < t < 1.0:
            return [a1 + t * r]
    return []


def _node_edges(
    edges: list[tuple[np.ndarray, np.ndarray]],
    others: list[list[tuple[np.ndarray, np.ndarray]]],
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Split each edge at intersections with edges of the other sets.

    Per edge, the general-position intersection test against ALL bbox
    candidates is one vectorized numpy pass; only collinear candidates
    (denom == 0 with zero cross — rare) drop to the scalar helper."""
    if not others:
        return edges
    all_other = [e for o in others for e in o]
    if not all_other:
        return edges
    o1 = np.array([e[0] for e in all_other])
    o2 = np.array([e[1] for e in all_other])
    ob_lo = np.minimum(o1, o2)
    ob_hi = np.maximum(o1, o2)
    s_all = o2 - o1
    n_e, n_o = len(edges), len(all_other)
    e1 = np.array([e[0] for e in edges])
    e2 = np.array([e[1] for e in edges])
    d_all = e2 - e1
    eb_lo = np.minimum(e1, e2)
    eb_hi = np.maximum(e1, e2)
    # one blocked (edges x others) pass: bbox candidate matrix, then a
    # single vectorized intersection solve over the surviving pairs —
    # replaces the per-edge Python loop (the profiled hot spot of every
    # union/difference). Block size caps the bool matrix at ~4M cells.
    cuts_per_edge: list[list[float] | None] = [None] * n_e
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
            m = (t > 1e-12) & (t < 1 - 1e-12) & (u >= 0.0) & (u <= 1.0)
            for i_e, t_v in zip(ii[gen][m].tolist(), t[m].tolist()):
                if cuts_per_edge[i_e] is None:
                    cuts_per_edge[i_e] = []
                cuts_per_edge[i_e].append(t_v)
        if not gen.all():
            # collinear candidates (denom == 0 with zero cross — rare):
            # scalar overlap-endpoint helper
            coll = ~gen & (qp[:, 0] * d[:, 1] - qp[:, 1] * d[:, 0] == 0)
            for i_e, j_o in zip(ii[coll].tolist(), jj[coll].tolist()):
                a, b = edges[i_e]
                dv = d_all[i_e]
                dd = float(dv @ dv)
                if dd == 0:
                    continue
                for ip in _seg_intersections(a, b, o1[j_o], o2[j_o]):
                    t1 = float((ip - a) @ dv) / dd
                    if 1e-12 < t1 < 1 - 1e-12:
                        if cuts_per_edge[i_e] is None:
                            cuts_per_edge[i_e] = []
                        cuts_per_edge[i_e].append(t1)
    out = []
    for i, (a, b) in enumerate(edges):
        cuts = cuts_per_edge[i]
        if not cuts:
            out.append((a, b))
            continue
        d = d_all[i]
        ts = sorted(set([0.0] + cuts + [1.0]))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            p, q = a + t0 * d, a + t1 * d
            if _key(p) != _key(q):
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


def _classify(edges: list[tuple[np.ndarray, np.ndarray]], poly: Geometry) -> np.ndarray:
    """For each edge: 1 inside poly, 0 on boundary, -1 outside (by
    midpoint; on-boundary detected via distance test)."""
    if not edges:
        return np.empty(0, dtype=int)
    mids = _midpoints(edges)
    res = np.where(points_in_polygon(mids[:, 0], mids[:, 1], poly), 1, -1)
    segs = _poly_segments(poly)
    if segs is not None:
        res = np.where(_min_boundary_dist(mids, segs) <= SNAP * 10, 0, res)
    return res


def _stitch(edges: list[tuple[np.ndarray, np.ndarray]]) -> list[np.ndarray]:
    """Assemble directed edges into closed rings. At branching vertices
    pick the most counter-clockwise continuation (keeps minimal rings)."""
    # dedupe identical directed edges, then drop anti-parallel pairs
    # entirely (BOTH members): an edge traversed in both directions is
    # an interior seam between coincident boundaries — keeping either
    # one forms a degenerate 2-edge ring in the max-turn walk and
    # consumes an edge a real ring needed.
    # Keys are snapped in ONE numpy pass (per-endpoint _key calls were
    # ~20% of the union profile).
    if not edges:
        return []
    a_arr = np.array([e[0] for e in edges])
    b_arr = np.array([e[1] for e in edges])
    ka_all = np.round(a_arr / SNAP).astype(np.int64)
    kb_all = np.round(b_arr / SNAP).astype(np.int64)
    keys = [
        ((ka_all[i, 0], ka_all[i, 1]), (kb_all[i, 0], kb_all[i, 1]))
        for i in range(len(edges))
    ]
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

    out_map: dict[tuple, list[int]] = defaultdict(list)
    for i, (ka, _kb) in enumerate(edge_keys):
        out_map[ka].append(i)
    used = [False] * len(edges)
    rings: list[np.ndarray] = []
    for start in range(len(edges)):
        if used[start]:
            continue
        path = [edges[start][0]]
        start_key = edge_keys[start][0]
        cur = start
        used[start] = True
        guard = 0
        while guard < len(edges) + 4:
            guard += 1
            a, b = edges[cur]
            path.append(b)
            kb = edge_keys[cur][1]
            if kb == start_key:
                rings.append(np.array(path))
                break
            cands = [i for i in out_map[kb] if not used[i]]
            if not cands:
                break  # open chain: discard
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # rightmost (sharpest clockwise) turn relative to the
                # incoming direction keeps each simple loop separate at
                # figure-eight vertices (touching rings stay two rings)
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
            cur = nxt
    return rings


def _rings_to_polygons(rings: list[np.ndarray], dims: str = "xy") -> Geometry | None:
    shells, holes = [], []
    for r in rings:
        if len(r) < 4:
            continue
        area = ring_signed_area(r)
        if abs(area) < SNAP:
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


def polygon_difference(a: Geometry, b: Geometry) -> Geometry | None:
    """A \\ B for (multi)polygons; None when empty."""
    pa, pb = _as_polys(a), _as_polys(b)
    if not pa:
        return None
    if not pb:
        return a
    ea = [e for p in pa for e in _poly_edges(p)]
    eb = [e for p in pb for e in _poly_edges(p)]
    na = _node_edges(ea, [eb])
    nb = _node_edges(eb, [ea])
    ca = _classify(na, b)
    cb = _classify(nb, a)
    keep: list[tuple[np.ndarray, np.ndarray]] = []
    for (p, q), c in zip(na, ca):
        if c == -1:
            keep.append((p, q))
    for (p, q), c in zip(nb, cb):
        if c == 1:
            keep.append((q, p))  # reversed: B boundary inside A bounds a hole
    # shared boundary edges: A-edge on B's boundary. Keep it only when
    # the A-interior side is outside B — approximated by sampling a
    # point just left of the edge (A interior) and testing against B.
    shared_idx = np.nonzero(ca == 0)[0]
    for i in shared_idx:
        p, q = na[i]
        d = q - p
        nlen = math.hypot(d[0], d[1])
        if nlen == 0:
            continue
        # left normal of a CCW shell edge points into A's interior
        off = np.array([-d[1], d[0]]) / nlen * (SNAP * 100)
        mid = (p + q) / 2 + off
        if not points_in_polygon(np.array([mid[0]]), np.array([mid[1]]), b)[0]:
            keep.append((p, q))
    rings = _stitch(keep)
    return _rings_to_polygons(rings, a.dims)


def polygon_intersection(a: Geometry, b: Geometry) -> Geometry | None:
    pa, pb = _as_polys(a), _as_polys(b)
    if not pa or not pb:
        return None
    ea = [e for p in pa for e in _poly_edges(p)]
    eb = [e for p in pb for e in _poly_edges(p)]
    na = _node_edges(ea, [eb])
    nb = _node_edges(eb, [ea])
    ca = _classify(na, b)
    cb = _classify(nb, a)
    keep = [(p, q) for (p, q), c in zip(na, ca) if c == 1]
    keep += [(p, q) for (p, q), c in zip(nb, cb) if c == 1]
    # co-directed shared edges count once
    seen = {(_key(p), _key(q)) for p, q in keep}
    for (p, q), c in zip(na, ca):
        if c == 0 and (_key(p), _key(q)) not in seen:
            d = q - p
            nlen = math.hypot(d[0], d[1])
            if nlen == 0:
                continue
            off = np.array([-d[1], d[0]]) / nlen * (SNAP * 100)
            mid = (p + q) / 2 + off
            if points_in_polygon(np.array([mid[0]]), np.array([mid[1]]), b)[0]:
                keep.append((p, q))
                seen.add((_key(p), _key(q)))
    rings = _stitch(keep)
    return _rings_to_polygons(rings, a.dims)


def polygon_union(polys: list[Geometry]) -> Geometry | None:
    """N-ary union: keep boundary edges not strictly inside any other
    input polygon; anti-directed shared edges cancel."""
    flat = [p for g in polys for p in _as_polys(g)]
    flat = [p for p in flat if p.data and abs(ring_signed_area(np.asarray(p.data[0]))) > 0]
    if not flat:
        return None
    if len(flat) == 1:
        return flat[0]
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
        # bboxes are disjoint by less than SNAP*10 can still have
        # near-coincident edges that _classify must see as on-boundary
        eps = SNAP * 10
        return not (
            a[2] < b[0] - eps or b[2] < a[0] - eps or a[3] < b[1] - eps or b[3] < a[1] - eps
        )

    keep: list[tuple[np.ndarray, np.ndarray]] = []
    directed_count: dict[tuple, int] = defaultdict(int)
    candidates: list[tuple[np.ndarray, np.ndarray]] = []
    seg_cache = [None] * len(flat)
    for i, p in enumerate(flat):
        near = [j for j in range(len(flat)) if j != i and _bbox_overlap(boxes[i], boxes[j])]
        noded = _node_edges(per_poly_edges[i], [per_poly_edges[j] for j in near])
        inside_any = np.zeros(len(noded), dtype=bool)
        onb_any = np.zeros(len(noded), dtype=bool)
        if near and noded:
            # one midpoint build shared across the per-neighbor passes
            # (rebuilding it for every j was the profiled union hot
            # spot); segments cached per polygon across the outer loop.
            # Per-j semantics preserved: a midpoint ON j's boundary is
            # NOT inside j even when the crossing test says so.
            mids = _midpoints(noded)
            for j in near:
                if seg_cache[j] is None:
                    s = _poly_segments(flat[j])
                    seg_cache[j] = s if s is not None else False
                segs = seg_cache[j]
                if segs is not False:
                    onb_j = _min_boundary_dist(mids, segs) <= SNAP * 10
                else:
                    onb_j = np.zeros(len(noded), dtype=bool)
                in_j = points_in_polygon(mids[:, 0], mids[:, 1], flat[j]) & ~onb_j
                inside_any |= in_j
                onb_any |= onb_j
        for k, (p1, p2) in enumerate(noded):
            if inside_any[k]:
                continue
            if onb_any[k]:
                candidates.append((p1, p2))
                directed_count[(_key(p1), _key(p2))] += 1
            else:
                keep.append((p1, p2))
    # shared-boundary edges: anti-directed pairs cancel (interior on
    # both sides); co-directed duplicates collapse to one
    emitted = set()
    for p1, p2 in candidates:
        k = (_key(p1), _key(p2))
        rk = (k[1], k[0])
        if directed_count.get(rk, 0) > 0:
            continue  # cancelled by the reverse edge
        if k in emitted:
            continue
        emitted.add(k)
        keep.append((p1, p2))
    rings = _stitch(keep)
    return _rings_to_polygons(rings, flat[0].dims)


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
    result = _rings_to_polygons(_stitch(keep), flat[0].dims) if ok else None
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
