"""Delaunay/Voronoi kernel invariants — in particular for site counts
past the sweep-retirement threshold (1536 stored triangles), where the
scan-set pruning must not change the triangulation."""

import numpy as np

from pygeoops_spark.geom.voronoi import delaunay, voronoi_edges


def _assert_delaunay_property(pts, tris, sample=300, rng=None):
    """No site strictly inside any (sampled) triangle's circumcircle."""
    rng = rng or np.random.default_rng(0)
    take = rng.choice(len(tris), size=min(sample, len(tris)), replace=False)
    for t in take:
        i, j, k = tris[t]
        ax, ay = pts[i]
        bx, by = pts[j]
        cx, cy = pts[k]
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        assert d != 0
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        dist2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        inside = dist2 < r2 * (1 - 1e-9)
        inside[[i, j, k]] = False
        assert not inside.any(), f"site strictly inside circumcircle of tri {t}"


def test_delaunay_property_small_and_large():
    rng = np.random.default_rng(41)
    for n in (60, 800, 4000):  # below / straddling / above the threshold
        pts = np.unique(rng.uniform(0, 100, size=(n, 2)), axis=0)
        tris = delaunay(pts)
        # Euler: a triangulation of n sites has 2n - 2 - hull triangles
        assert len(tris) > n
        _assert_delaunay_property(pts, tris, rng=rng)


def test_delaunay_collinear_and_tiny():
    assert delaunay(np.array([[0.0, 0.0], [1.0, 0.0]])) == []
    # fully collinear: no valid triangles among real sites
    col = np.column_stack([np.linspace(0, 9, 10), np.zeros(10)])
    assert delaunay(col) == []


def test_voronoi_edges_dual_counts():
    rng = np.random.default_rng(7)
    pts = np.unique(rng.uniform(0, 10, size=(500, 2)), axis=0)
    edges = voronoi_edges(pts, include_rays=False)
    # one finite Voronoi edge per interior Delaunay edge (minus
    # degenerate cocircular duplicates): must be within a few percent
    tris = delaunay(pts - pts.mean(axis=0))
    from collections import Counter

    c = Counter()
    for i, j, k in tris:
        for e in ((i, j), (j, k), (k, i)):
            c[(min(e), max(e))] += 1
    interior = sum(1 for v in c.values() if v == 2)
    assert abs(len(edges) - interior) <= interior * 0.02


def test_delaunay_projected_coordinates():
    """Web-mercator-magnitude coordinates (offset ~1e7): the sweep
    retirement's circumcenter threshold loses precision quadratically
    with coordinate magnitude, so delaunay re-centers internally —
    the triangulation must stay a valid exact partition of the hull."""
    rng = np.random.default_rng(9)
    base = np.unique(rng.uniform(0, 1, (3000, 2)), axis=0)
    for off in (1e6, 1e7):
        pts = base + off
        tris = delaunay(pts)
        n = len(pts)
        assert len(tris) <= 2 * n - 2
        c = pts - pts.mean(axis=0)
        tsum = 0.0
        for i, j, k in tris:
            (ax, ay), (bx, by), (cx, cy) = c[i], c[j], c[k]
            tsum += abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay)) / 2
        from pygeoops_spark.geom.kernels import (
            convex_hull_coords,
            ring_signed_area,
        )

        ha = abs(ring_signed_area(convex_hull_coords(c)))
        assert abs(tsum - ha) <= ha * 1e-9  # exact cover: no overlap, no gap
