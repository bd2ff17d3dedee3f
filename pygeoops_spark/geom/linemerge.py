"""Line merging + normalization (GEOS line_merge / normalize analogs).

line_merge: join coordinate chains at degree-2 vertices; junctions
(degree >= 3) and endpoints stay chain breaks — the behavior the
centerline pipeline relies on (/root/reference/pygeoops/_centerline.py
uses shapely.line_merge at :183,:187 and GEOS normalize at :215).

Ordering matters for golden parity: like JTS's LineMerger, merged
strings are emitted starting from nodes of degree != 2 visited in
ascending coordinate order; like GEOS normalize, multi-part results
sort components in DESCENDING canonical order.
"""

from __future__ import annotations

import numpy as np

SNAP = 1e-9


def _key(p) -> tuple[int, int]:
    return (round(float(p[0]) / SNAP), round(float(p[1]) / SNAP))


def line_merge(segments: list[np.ndarray]) -> list[np.ndarray]:
    """Merge coordinate chains (each (n,2)) at degree-2 vertices.

    Emission order follows JTS LineMerger: strings start at degree != 2
    nodes in ascending node-coordinate order; leftover cycles follow in
    input order.
    """
    chains = [np.asarray(c, dtype=float) for c in segments if len(c) >= 2]
    incident: dict[tuple, list[int]] = {}
    for idx, c in enumerate(chains):
        incident.setdefault(_key(c[0]), []).append(idx)
        incident.setdefault(_key(c[-1]), []).append(idx)
    degree = {k: len(v) for k, v in incident.items()}
    used = [False] * len(chains)
    out: list[np.ndarray] = []

    def walk(start_idx: int, from_key: tuple) -> np.ndarray:
        """Follow from chain start_idx entered at from_key through
        degree-2 nodes."""
        used[start_idx] = True
        c = chains[start_idx]
        cur = c.copy() if _key(c[0]) == from_key else c[::-1].copy()
        while True:
            endk = _key(cur[-1])
            if degree.get(endk, 0) != 2:
                break
            nxt_cands = [i for i in incident.get(endk, []) if not used[i]]
            if len(nxt_cands) != 1:
                break
            ni = nxt_cands[0]
            used[ni] = True
            nc = chains[ni]
            seg = nc[1:] if _key(nc[0]) == endk else nc[::-1][1:]
            cur = np.vstack([cur, seg])
            if _key(cur[0]) == _key(cur[-1]):
                break
        return cur

    # start nodes: degree != 2, ascending coordinate order
    start_nodes = sorted(
        (k for k, d in degree.items() if d != 2), key=lambda k: (k[0], k[1])
    )
    for node in start_nodes:
        for idx in incident.get(node, []):
            if not used[idx]:
                out.append(walk(idx, node))
    # leftover pure cycles
    for idx in range(len(chains)):
        if not used[idx]:
            out.append(walk(idx, _key(chains[idx][0])))
    return out


def normalize_line(coords: np.ndarray) -> np.ndarray:
    """GEOS-style LineString normalize: reverse unless already in
    canonical orientation (first point lexicographically <= last)."""
    a, b = coords[0], coords[-1]
    if (a[0], a[1]) > (b[0], b[1]):
        return coords[::-1].copy()
    return coords


def normalize_lines(chains: list[np.ndarray]) -> list[np.ndarray]:
    """Normalize each chain and sort components in GEOS canonical
    (descending lexicographic) multi-geometry order."""
    norm = [normalize_line(c) for c in chains]
    return sorted(
        norm, key=lambda c: tuple(map(tuple, c)), reverse=True
    )
