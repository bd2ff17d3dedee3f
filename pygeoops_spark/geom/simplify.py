"""Line-simplification kernels: Lang, Lang+ , RDP, Visvalingam-Whyatt.

Index-based cores (return the indices of coordinates to keep) mirroring
the observable semantics of the reference:

* Lang / Lang+ — behavioral spec at
  /root/reference/pygeoops/_simplify_lang.py:69-185 (sliding window,
  `lookahead` window size, -1 => whole line; the "+" variant also masks
  window-end points). Re-implemented from the spec, tolerance is a
  *distance*.
* RDP — classic Ramer-Douglas-Peucker (the reference delegates to
  shapely.simplify / simplification.cutil,
  /root/reference/pygeoops/_simplify.py:14-19,107-111); tolerance is a
  distance, JTS-style segment distance.
* VW — Visvalingam-Whyatt, tolerance is an *area*
  (/root/reference/pygeoops/_simplify.py:46-50).
"""

from __future__ import annotations

import heapq
import math

import numpy as np


def _pl_dist(px: float, py: float, ax: float, ay: float, bx: float, by: float) -> float:
    """Orthogonal distance to infinite line AB; inf for degenerate AB
    (same contract as the reference helper — keeps the point)."""
    dx, dy = bx - ax, by - ay
    denom = math.hypot(dx, dy)
    if denom == 0.0:
        return math.inf
    return abs(dx * (ay - py) - (ax - px) * dy) / denom


def lang_idx(
    coords: np.ndarray,
    tolerance: float,
    lookahead: int = 8,
    simplify_lookahead_points: bool = False,
) -> np.ndarray:
    """Lang simplification; returns sorted kept indices.

    ``simplify_lookahead_points=True`` is the "lang+" variant: when a
    window had in-tolerance points, the window start is pinned so the
    previous window-end point itself becomes removable in a later pass.
    """
    n = len(coords)
    if n <= 2:
        return np.arange(n)
    win = (n - 1) if lookahead == -1 else min(lookahead, n - 1)
    keep = np.ones(n, dtype=bool)
    start, end = 0, win
    while True:
        sx, sy = coords[start, 0], coords[start, 1]
        ex, ey = coords[end, 0], coords[end, 1]
        bad = False
        for i in range(start + 1, end):
            if _pl_dist(coords[i, 0], coords[i, 1], sx, sy, ex, ey) > tolerance:
                bad = True
                break
        if bad:
            end -= 1
            continue
        if not simplify_lookahead_points:
            keep[start + 1 : end] = False
            start = end
        elif not keep[start + 1 : end].any():
            # nothing newly removable in this window -> advance
            start = end
        else:
            keep[start + 1 : end] = False
            # start stays pinned: window-end point is reconsidered
        if start >= n - 1 or end >= n - 1:
            break
        end += win
        if end >= n:
            end = n - 1
    return np.nonzero(keep)[0]


def rdp_idx(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Ramer-Douglas-Peucker (iterative). Segment distance like JTS."""
    n = len(coords)
    if n <= 2:
        return np.arange(n)
    x, y = coords[:, 0], coords[:, 1]
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = x[a], y[a], x[b], y[b]
        px, py = x[a + 1 : b], y[a + 1 : b]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d = np.hypot(px - ax, py - ay)
        else:
            t = np.clip(((px - ax) * dx + (py - ay) * dy) / seg2, 0.0, 1.0)
            d = np.hypot(px - (ax + t * dx), py - (ay + t * dy))
        imax = int(np.argmax(d))
        if d[imax] > tolerance:
            m = a + 1 + imax
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return np.nonzero(keep)[0]


def _tri_area(ax, ay, bx, by, cx, cy) -> float:
    return abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)) * 0.5


def vw_idx(coords: np.ndarray, area_tolerance: float) -> np.ndarray:
    """Visvalingam-Whyatt: drop points whose effective triangle area is
    below ``area_tolerance`` (tolerance is an area, not a distance)."""
    n = len(coords)
    if n <= 2:
        return np.arange(n)
    x, y = coords[:, 0], coords[:, 1]
    prev = np.arange(n) - 1
    nxt = np.arange(n) + 1
    alive = np.ones(n, dtype=bool)
    heap: list[tuple[float, int, int]] = []
    version = np.zeros(n, dtype=np.int64)

    def area_of(i: int) -> float:
        return _tri_area(x[prev[i]], y[prev[i]], x[i], y[i], x[nxt[i]], y[nxt[i]])

    for i in range(1, n - 1):
        heapq.heappush(heap, (area_of(i), i, 0))
    while heap:
        a, i, ver = heapq.heappop(heap)
        if not alive[i] or ver != version[i]:
            continue
        if a > area_tolerance:  # removal happens at a <= tolerance
            break
        alive[i] = False
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                version[j] += 1
                heapq.heappush(heap, (area_of(j), j, int(version[j])))
    return np.nonzero(alive)[0]


ALGORITHMS = {
    "lang": lambda c, tol, lookahead=8: lang_idx(c, tol, lookahead, False),
    "lang+": lambda c, tol, lookahead=8: lang_idx(c, tol, lookahead, True),
    "rdp": lambda c, tol, lookahead=8: rdp_idx(c, tol),
    "vw": lambda c, tol, lookahead=8: vw_idx(c, tol),
}


def simplify_coords_idx(
    coords: np.ndarray, tolerance: float, algorithm: str = "rdp", lookahead: int = 8
) -> np.ndarray:
    try:
        fn = ALGORITHMS[algorithm]
    except KeyError:
        raise ValueError(f"Unsupported algorithm specified: {algorithm}") from None
    return fn(np.asarray(coords, dtype=np.float64), tolerance, lookahead=lookahead)


def simplify_coords_lang_idx(
    coords,
    tolerance: float,
    lookahead: int = 8,
    simplify_lookahead_points: bool = False,
) -> np.ndarray:
    """Reference-parity name (reference: _simplify_lang.py:69): Lang
    kept-index array over a coordinate sequence."""
    return lang_idx(
        np.asarray(coords, dtype=np.float64),
        tolerance,
        lookahead,
        simplify_lookahead_points,
    )


def simplify_coords_lang(
    coords,
    tolerance: float,
    lookahead: int = 8,
    simplify_lookahead_points: bool = False,
):
    """Reference-parity name (reference: _simplify_lang.py:11): Lang
    kept COORDS; list in → list out, ndarray in → ndarray out."""
    arr = np.asarray(coords, dtype=np.float64)
    out = arr[
        lang_idx(arr, tolerance, lookahead, simplify_lookahead_points)
    ]
    return out.tolist() if isinstance(coords, list) else out
