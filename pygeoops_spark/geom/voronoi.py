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
    # super-triangle comfortably containing everything
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 1000.0
    sup = np.array(
        [
            [cx - 20 * span, cy - span],
            [cx + 20 * span, cy - span],
            [cx, cy + 20 * span],
        ]
    )
    allp = np.vstack([pts, sup])
    S0, S1, S2 = n, n + 1, n + 2
    # triangle store: dict id -> (i,j,k, ccx, ccy, r2)
    tris: dict[int, tuple] = {}
    next_id = 0

    def add_tri(i, j, k):
        nonlocal next_id
        ccx, ccy, r2 = _circumcenter(
            allp[i, 0], allp[i, 1], allp[j, 0], allp[j, 1], allp[k, 0], allp[k, 1]
        )
        tris[next_id] = (i, j, k, ccx, ccy, r2)
        next_id += 1

    add_tri(S0, S1, S2)

    def in_circumcircle(i, j, k, px, py) -> bool:
        """Determinant incircle predicate (better conditioned than the
        radius comparison for sliver triangles)."""
        ax, ay = allp[i, 0] - px, allp[i, 1] - py
        bx, by = allp[j, 0] - px, allp[j, 1] - py
        cx, cy = allp[k, 0] - px, allp[k, 1] - py
        det = (
            (ax * ax + ay * ay) * (bx * cy - cx * by)
            - (bx * bx + by * by) * (ax * cy - cx * ay)
            + (cx * cx + cy * cy) * (ax * by - bx * ay)
        )
        orient = (allp[j, 0] - allp[i, 0]) * (allp[k, 1] - allp[i, 1]) - (
            allp[k, 0] - allp[i, 0]
        ) * (allp[j, 1] - allp[i, 1])
        if orient < 0:
            det = -det
        return det > 0

    # insertion order: sorted by x improves locality and robustness
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    for p in order:
        px, py = allp[p, 0], allp[p, 1]
        bad = []
        for tid, (i, j, k, ccx, ccy, r2) in tris.items():
            if in_circumcircle(i, j, k, px, py):
                bad.append(tid)
        # boundary of the cavity: edges appearing exactly once
        edge_count: dict[tuple[int, int], int] = {}
        for tid in bad:
            i, j, k = tris[tid][:3]
            for e in ((i, j), (j, k), (k, i)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        for tid in bad:
            del tris[tid]
        for (i, j), cnt in edge_count.items():
            if cnt == 1:
                add_tri(i, j, p)
    return [
        (i, j, k)
        for (i, j, k, *_rest) in tris.values()
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
            a = np.array(centers[ts[0]]) + offset
            b = np.array(centers[ts[1]]) + offset
            if not np.allclose(a, b, atol=1e-12):
                out.append((a, b))
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
            if not np.allclose(cc, far, atol=1e-12):
                out.append((cc + offset, far + offset))
    return out
