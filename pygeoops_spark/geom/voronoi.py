"""Delaunay triangulation (Bowyer-Watson) and Voronoi edge extraction.

No scipy/GEOS here, so this is the engine's own computational-geometry
core for the centerline operator. Voronoi edges are the Delaunay dual:
one finite edge per pair of adjacent triangles, connecting their
circumcenters (unbounded rays are dropped — the centerline pipeline
filters to edges contained in the polygon, which rays never are).
"""

from __future__ import annotations

import math

import numpy as np


def _circumcenter(ax, ay, bx, by, cx, cy) -> tuple[float, float, float]:
    """(x, y, r2) of the circumcircle of triangle abc."""
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return (math.inf, math.inf, math.inf)
    a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return (ux, uy, r2)


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson incremental triangulation. Returns index triples.

    Points are pre-deduplicated by the caller. Runs fine for the
    few-thousand-site inputs the centerline kernel produces per
    geometry (one Arrow-batch row).
    """
    pts = np.asarray(points, dtype=float)
    n = len(pts)
    if n < 3:
        return []
    # translate to a local frame when the offset dwarfs the extent:
    # circumcenter math (and the sweep-retirement threshold below)
    # loses precision quadratically with coordinate magnitude, which
    # corrupted triangulations of projected coords (e.g. web-mercator,
    # ~1e7). The output is index triples, so translation is free.
    # Conditional (not unconditional) so already-centered inputs keep
    # bit-identical float behavior.
    raw_span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1e-12)
    if max(abs(pts[:, 0]).max(), abs(pts[:, 1]).max()) > 16.0 * raw_span:
        pts = pts - pts.mean(axis=0)
    # super-triangle comfortably containing everything
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 1000.0
    # absolute cushion for the retire threshold: covers the fp error of
    # the circumcenter x at this coordinate scale (the relative r term
    # alone under-covered it for large-magnitude frames)
    coord_mag = max(abs(pts[:, 0]).max(), abs(pts[:, 1]).max(), 1.0)
    sup = np.array(
        [
            [cx - 20 * span, cy - span],
            [cx + 20 * span, cy - span],
            [cx, cy + 20 * span],
        ]
    )
    allp = np.vstack([pts, sup])
    S0, S1, S2 = n, n + 1, n + 2

    # growable columnar triangle store: the per-insertion bad-triangle
    # search runs the determinant incircle predicate VECTORIZED over the
    # ACTIVE triangles, so Python only touches the small cavity per
    # insert. With x-sorted insertion a triangle whose circumcircle lies
    # entirely left of the sweep (ux + r < px) can never be invalidated
    # again, so it retires from the scan set — same output (a retired
    # triangle's incircle determinant is necessarily <= 0 for all later
    # points), the scan shrinks from O(all triangles) to O(frontier).
    cap = max(4 * n + 16, 64)
    tri_idx = np.zeros((cap, 3), dtype=np.int64)
    tvx = np.zeros((cap, 3))
    tvy = np.zeros((cap, 3))
    tsign = np.zeros(cap)  # orientation sign
    alive = np.zeros(cap, dtype=bool)
    cxr = np.zeros(cap)  # ux + r: retire threshold (inf when degenerate)
    count = 0

    def add_tri(i, j, k):
        nonlocal count, cap, tri_idx, tvx, tvy, tsign, alive, cxr
        if count == cap:
            cap *= 2
            tri_idx = np.resize(tri_idx, (cap, 3))
            tvx = np.resize(tvx, (cap, 3))
            tvy = np.resize(tvy, (cap, 3))
            tsign = np.resize(tsign, cap)
            alive = np.resize(alive, cap)
            cxr = np.resize(cxr, cap)
        tri_idx[count] = (i, j, k)
        tvx[count] = (allp[i, 0], allp[j, 0], allp[k, 0])
        tvy[count] = (allp[i, 1], allp[j, 1], allp[k, 1])
        orient = (allp[j, 0] - allp[i, 0]) * (allp[k, 1] - allp[i, 1]) - (
            allp[k, 0] - allp[i, 0]
        ) * (allp[j, 1] - allp[i, 1])
        tsign[count] = -1.0 if orient < 0 else 1.0
        alive[count] = True
        if track_cxr:
            ux, _uy, r2 = _circumcenter(
                allp[i, 0], allp[i, 1], allp[j, 0], allp[j, 1], allp[k, 0], allp[k, 1]
            )
            # conservative margin: sqrt rounding must never retire a
            # circle that still (barely) contains a later point
            cxr[count] = (
                math.inf
                if math.isinf(ux)
                else ux + math.sqrt(r2) * (1.0 + 1e-9) + coord_mag * 1e-9
            )
        count += 1
        return count - 1

    def fill_cxr_vectorized():
        # backfill retire thresholds for triangles created in small mode
        x1, y1 = tvx[:count, 0], tvy[:count, 0]
        x2, y2 = tvx[:count, 1], tvy[:count, 1]
        x3, y3 = tvx[:count, 2], tvy[:count, 2]
        d = 2.0 * (x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2))
        a2, b2, c2 = x1 * x1 + y1 * y1, x2 * x2 + y2 * y2, x3 * x3 + y3 * y3
        with np.errstate(divide="ignore", invalid="ignore"):
            ux = (a2 * (y2 - y3) + b2 * (y3 - y1) + c2 * (y1 - y2)) / d
            uy = (a2 * (x3 - x2) + b2 * (x1 - x3) + c2 * (x2 - x1)) / d
            r = np.sqrt((x1 - ux) ** 2 + (y1 - uy) ** 2)
        vals = ux + r * (1.0 + 1e-9) + coord_mag * 1e-9
        vals[~np.isfinite(vals)] = math.inf
        cxr[:count] = vals

    track_cxr = False
    active = None  # None = small mode: scan the whole store by slice
    add_tri(S0, S1, S2)

    # insertion order: sorted by x enables the sweep retirement above
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    for p in order:
        px, py = allp[p, 0], allp[p, 1]
        if active is None and count >= 1536:
            # switch to sweep-retirement mode: backfill thresholds once
            fill_cxr_vectorized()
            track_cxr = True
            active = np.arange(count, dtype=np.int64)
        if active is None:
            # small/mid stores: a contiguous slice beats gather indexing and
            # needs no retire bookkeeping
            scan = slice(0, count)
            ax = tvx[scan, 0] - px
            ay = tvy[scan, 0] - py
            bx = tvx[scan, 1] - px
            by = tvy[scan, 1] - py
            cx_ = tvx[scan, 2] - px
            cy_ = tvy[scan, 2] - py
            det = (
                (ax * ax + ay * ay) * (bx * cy_ - cx_ * by)
                - (bx * bx + by * by) * (ax * cy_ - cx_ * ay)
                + (cx_ * cx_ + cy_ * cy_) * (ax * by - bx * ay)
            )
            bad = np.nonzero(alive[scan] & (det * tsign[scan] > 0))[0]
        else:
            active = active[alive[active] & (cxr[active] >= px)]
            ax = tvx[active, 0] - px
            ay = tvy[active, 0] - py
            bx = tvx[active, 1] - px
            by = tvy[active, 1] - py
            cx_ = tvx[active, 2] - px
            cy_ = tvy[active, 2] - py
            det = (
                (ax * ax + ay * ay) * (bx * cy_ - cx_ * by)
                - (bx * bx + by * by) * (ax * cy_ - cx_ * ay)
                + (cx_ * cx_ + cy_ * cy_) * (ax * by - bx * ay)
            )
            bad = active[det * tsign[active] > 0]
        if len(bad) == 0:
            continue
        # boundary of the cavity: edges appearing exactly once
        edge_count: dict[tuple[int, int], int] = {}
        for tid in bad:
            i, j, k = (int(v) for v in tri_idx[tid])
            for e in ((i, j), (j, k), (k, i)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        alive[bad] = False
        new_ids = [
            add_tri(i, j, p) for (i, j), cnt in edge_count.items() if cnt == 1
        ]
        if active is not None:
            active = np.concatenate(
                [active, np.asarray(new_ids, dtype=np.int64)]
            )
    live = np.nonzero(alive[:count])[0]
    return [
        (int(i), int(j), int(k))
        for i, j, k in tri_idx[live]
        if i < n and j < n and k < n
    ]


def voronoi_edges(
    points: np.ndarray, include_rays: bool = True
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Voronoi edges: circumcenter pairs of adjacent Delaunay triangles,
    plus (when include_rays) the unbounded edges of hull-adjacent cells
    clipped at a generous envelope — like the GEOS diagram clipped to
    its expanded envelope. Zero-length edges (cocircular sites) are
    dropped."""
    pts = np.asarray(points, dtype=float)
    # translate to local coordinates: circumcenter math is catastrophic
    # at large offsets (e.g. projected coords ~1e5 with 1e-10 extents)
    offset = pts.mean(axis=0)
    pts = pts - offset
    tris = delaunay(pts)
    if not tris:
        return []
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0)
    ray_len = 4.0 * span
    centers = []
    for i, j, k in tris:
        ccx, ccy, _ = _circumcenter(
            pts[i, 0], pts[i, 1], pts[j, 0], pts[j, 1], pts[k, 0], pts[k, 1]
        )
        centers.append((ccx, ccy))
    edge_map: dict[tuple[int, int], list[int]] = {}
    for t, (i, j, k) in enumerate(tris):
        for e in ((i, j), (j, k), (k, i)):
            key = (min(e), max(e))
            edge_map.setdefault(key, []).append(t)
    out = []
    for (i, j), ts in edge_map.items():
        if len(ts) == 2:
            c0, c1 = centers[ts[0]], centers[ts[1]]
            if abs(c0[0] - c1[0]) > 1e-12 or abs(c0[1] - c1[1]) > 1e-12:
                out.append((np.array(c0) + offset, np.array(c1) + offset))
        elif len(ts) == 1 and include_rays:
            # hull edge: ray from the circumcenter, perpendicular to the
            # site edge, pointing away from the triangle's third vertex
            t = ts[0]
            cc = np.array(centers[t])
            ti, tj, tk = tris[t]
            k_opp = ({ti, tj, tk} - {i, j}).pop()
            mid = (pts[i] + pts[j]) / 2.0
            e = pts[j] - pts[i]
            n = np.array([-e[1], e[0]])  # perpendicular to the site edge
            if n @ (mid - pts[k_opp]) < 0:
                n = -n
            norm = math.hypot(n[0], n[1])
            if norm == 0:
                continue
            far = cc + (n / norm) * ray_len
            if abs(cc[0] - far[0]) > 1e-12 or abs(cc[1] - far[1]) > 1e-12:
                out.append((cc + offset, far + offset))
    return out
