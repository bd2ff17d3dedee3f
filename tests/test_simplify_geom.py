"""simplify geometry-level tests — reference tests/test_simplify.py
goldens (keep_points_on, preserve_topology, pass-throughs)."""

import numpy as np
import pytest

from pygeoops_spark.geom import linestring, point, polygon, wkt_loads
from pygeoops_spark.geom.kernels import polygon_area
from pygeoops_spark.geom.simplify_geom import simplify, simplify_geometry


def test_simplify_collinear_line():
    # reference :19-29 — 3-pt collinear line, lang, lookahead=-1 -> 2
    ln = linestring([(0, 0), (10, 10), (20, 20)])
    out = simplify(ln, 1, algorithm="lang", lookahead=-1)
    assert len(out.data) == 2


def test_simplify_point_passthrough():
    # reference :48-60
    p = point(5, 5)
    assert simplify(p, 1, algorithm="lang") == p


@pytest.mark.parametrize(
    "algorithm,tolerance", [("lang", 2), ("lang+", 2), ("rdp", 2), ("vw", 15)]
)
def test_simplify_keep_points_on(algorithm, tolerance):
    # reference :275-313 — without: n-2 coords & smaller area;
    # with keep line: n-1 coords & equal area
    poly = polygon([(0, 0), (0, 10), (5, 12), (10, 10), (10, 0), (5, 0)])
    keep_line = linestring([(0, 0), (0, 12), (10, 12)])
    n = len(poly.data[0])

    simp = simplify(poly, tolerance, algorithm=algorithm)
    assert len(simp.data[0]) == n - 2
    assert polygon_area(simp) < polygon_area(poly)

    simp_keep = simplify(poly, tolerance, algorithm=algorithm, keep_points_on=keep_line)
    assert len(simp_keep.data[0]) == n - 1
    assert polygon_area(simp_keep) == polygon_area(poly)


@pytest.mark.parametrize("algorithm,tolerance", [("lang", 10), ("lang+", 10), ("vw", 50)])
def test_simplify_preserve_topology(algorithm, tolerance):
    # reference :343-374 — at this tolerance the rings degenerate:
    # preserve True -> topologically-equal polygon returned (shapely
    # .equals in the reference); False -> None
    poly = polygon(
        [(0, 0), (0, 10), (1, 10), (10, 10), (10, 0)],
        [[(2, 2), (2, 8), (8, 8), (8, 2)]],
    )
    out = simplify(poly, tolerance, algorithm=algorithm, preserve_topology=True)
    assert out is not None
    assert len(out.data) == 2  # hole preserved
    assert polygon_area(out) == polygon_area(poly)  # topological equality proxy
    # hole ring survives verbatim
    assert np.array_equal(out.data[1], poly.data[1])
    out2 = simplify(poly, tolerance, algorithm=algorithm, preserve_topology=False)
    assert out2 is None


def test_simplify_errors():
    ln = linestring([(0, 0), (10, 10), (20, 20)])
    with pytest.raises(ValueError, match="Unsupported algorithm specified: invalid"):
        simplify(ln, 1, algorithm="invalid")
    with pytest.raises(ValueError, match="preserve_common_boundaries=True and"):
        simplify(ln, 1, preserve_topology=False, preserve_common_boundaries=True)


def test_simplify_none():
    assert simplify(None, 1) is None


def test_simplify_polygon_island_lang():
    # reference :31-46 — polygon with island, lang: exterior -> 5 coords
    poly = wkt_loads(
        "POLYGON ((0 0, 0 10, 1 10, 10 10, 10 0, 0 0), (2 2, 2 8, 8 8, 8 2, 2 2))"
    )
    out = simplify(poly, 1, algorithm="lang")
    assert len(out.data[0]) == 5
    assert len(out.data) == 2


def test_lang_kept_indices_on_densified_rectangle():
    """Pins the analytic derivation behind the simplify_lang driver
    oracle: 25 collinear points per edge, lookahead 8 -> keys advance
    +8,+16,+24 per edge, then the corner breaks the window. Kept
    indices are exactly {0,8,16,24,25,...,99,100} (17 coords)."""
    import numpy as np

    from pygeoops_spark.geom.simplify import lang_idx

    corners = [(0.0, 0.0), (123.5, 0.0), (123.5, 117.0), (0.0, 117.0)]
    ring = []
    for (x0, y0), (x1, y1) in zip(corners, corners[1:] + corners[:1]):
        for t in np.linspace(0, 1, 26)[:-1]:
            ring.append((x0 + (x1 - x0) * t, y0 + (y1 - y0) * t))
    arr = np.array(ring + [ring[0]])
    idx = list(lang_idx(arr, 0.1, lookahead=8))
    expected = sorted(
        [0, 100]
        + [c + s for c in (0, 25, 50, 75) for s in (8, 16, 24)]
        + [25, 50, 75]
    )
    assert idx == expected
