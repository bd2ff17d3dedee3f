"""Kernel unit tests (no Spark) against reference golden values.

Golden values lifted from the reference test suite (cited per case;
semantics only — asserts re-expressed on our kernels).
"""

import math

import numpy as np
import pytest

from pygeoops_spark.geom import (
    linestring,
    point,
    polygon,
    wkb_dumps,
    wkb_loads,
    wkt_dumps,
    wkt_loads,
)
from pygeoops_spark.geom.grid import (
    create_grid_bboxes,
    create_grid_bboxes_wh,
    grid_shape_squarish,
    split_tile_bboxes,
)
from pygeoops_spark.geom.kernels import (
    convex_hull_coords,
    geom_length,
    points_in_polygon,
    polygon_area,
)
from pygeoops_spark.geom.simplify import lang_idx, rdp_idx, simplify_coords_idx, vw_idx
from pygeoops_spark.geom.view_angles import view_angles


# -- wkb/wkt round trip ---------------------------------------------------
@pytest.mark.parametrize(
    "wkt",
    [
        "POINT (1 2)",
        "POINT EMPTY",
        "LINESTRING (0 0, 10 0, 10 10)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
        "MULTIPOINT ((1 1), (2 2))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))",
        "GEOMETRYCOLLECTION EMPTY",
    ],
)
def test_wkb_wkt_roundtrip(wkt):
    g = wkt_loads(wkt)
    assert wkt_dumps(wkb_loads(wkb_dumps(g))) == wkt_dumps(g) == wkt
    g2 = wkb_loads(wkb_dumps(g))
    assert g2.type_id == g.type_id


def test_wkt_z_m():
    g = wkt_loads("LINESTRING M (0 0 3, 5 -2 4)")
    assert g.dims == "xym"
    assert g.data.shape == (2, 3)
    assert wkt_dumps(g) == "LINESTRING M (0 0 3, 5 -2 4)"
    g = wkt_loads("POINT Z (1 2 3)")
    assert g.dims == "xyz"
    rt = wkb_loads(wkb_dumps(g))
    assert rt.dims == "xyz" and list(rt.data) == [1, 2, 3]


# -- measures -------------------------------------------------------------
def test_area_length():
    p = polygon([(0, 0), (10, 0), (10, 2), (0, 2)])
    assert polygon_area(p) == 20.0
    assert geom_length(p) == 24.0
    holed = polygon([(0, 0), (10, 0), (10, 10), (0, 10)], [[(2, 2), (4, 2), (4, 4), (2, 4)]])
    assert polygon_area(holed) == 100.0 - 4.0


def test_points_in_polygon():
    poly = polygon([(0, 0), (10, 0), (10, 10), (0, 10)], [[(4, 4), (6, 4), (6, 6), (4, 6)]])
    px = np.array([5.0, 1.0, 11.0, 5.0])
    py = np.array([5.0, 1.0, 5.0, 4.5])
    assert list(points_in_polygon(px, py, poly)) == [False, True, False, False]


def test_convex_hull():
    pts = np.array([[0, 0], [5, 1], [10, 0], [10, 10], [0, 10], [5, 5]], dtype=float)
    hull = convex_hull_coords(pts)
    assert len(hull) == 5 + 1 - 1  # 4 corners + (5,1)? no: (5,1) inside -> 4 corners closed
    # corners only, closed ring
    assert {tuple(p) for p in hull[:-1]} == {(0, 0), (10, 0), (10, 10), (0, 10)}


# -- simplify kernels -----------------------------------------------------
def test_lang_collinear_whole_line():
    # reference tests/test_simplify.py:19-29 — 3-pt collinear line,
    # lookahead -1 -> 2 coords
    coords = np.array([(0, 0), (10, 10), (20, 20)], dtype=float)
    keep = lang_idx(coords, tolerance=1, lookahead=-1)
    assert list(keep) == [0, 2]


def test_lang_lookahead3_collinear():
    # reference tests/test_simplify_lang.py:12-39 — 8 collinear points,
    # lookahead=3: standard lang keeps ceil boundary points (4), lang+
    # reduces to endpoints-ish (3)
    coords = np.array([(i, i) for i in range(8)], dtype=float)
    std = lang_idx(coords, tolerance=1, lookahead=3, simplify_lookahead_points=False)
    plus = lang_idx(coords, tolerance=1, lookahead=3, simplify_lookahead_points=True)
    assert len(std) == 4  # 0,3,6,7
    assert list(std) == [0, 3, 6, 7]
    assert len(plus) == 2  # fully collinear -> endpoints only
    # reference tests/test_simplify_lang.py:20-39 — bent line, lang+
    # with lookahead=3 removes the (30,30) point standard lang cannot: -> 3
    bent = np.array(
        [(0, 0), (10, 10), (20, 20), (30, 30), (40, 40), (50, 30), (60, 20), (70, 10)],
        dtype=float,
    )
    assert len(lang_idx(bent, tolerance=1, lookahead=3, simplify_lookahead_points=True)) == 3
    # reference tests/test_simplify_lang.py:42-61 — 5-pt collinear default
    # lookahead -> 2
    coords5b = np.array([(i * 10, i * 10) for i in range(5)], dtype=float)
    assert len(lang_idx(coords5b, tolerance=1, lookahead=8)) == 2
    # reference tests/test_simplify_lang.py:42-61 — 5 collinear points -> 2
    coords5 = np.array([(i, i) for i in range(5)], dtype=float)
    assert len(lang_idx(coords5, tolerance=1, lookahead=-1, simplify_lookahead_points=True)) == 2


def test_rdp_basic():
    coords = np.array([(0, 0), (5, 0.1), (10, 0)], dtype=float)
    assert list(rdp_idx(coords, 1.0)) == [0, 2]
    assert list(rdp_idx(coords, 0.01)) == [0, 1, 2]


def test_vw_area_tolerance():
    # middle point triangle area = 0.5*10*0.1 = 0.5
    coords = np.array([(0, 0), (5, 0.1), (10, 0)], dtype=float)
    assert list(vw_idx(coords, 1.0)) == [0, 2]
    assert list(vw_idx(coords, 0.4)) == [0, 1, 2]


def test_simplify_dispatch_error():
    with pytest.raises(ValueError, match="Unsupported algorithm"):
        simplify_coords_idx(np.zeros((3, 2)), 1, algorithm="nope")


# -- grid -----------------------------------------------------------------
BOUNDS = (40000.0, 160000.0, 45000.0, 210000.0)


def test_create_grid_2x2():
    # reference tests/test_grid.py:12-18
    tiles = create_grid_bboxes(BOUNDS, nb_columns=2, nb_rows=2)
    assert len(tiles) == 4
    # column-major: row varies fastest
    assert list(tiles[0][:2]) == [0, 0]
    assert list(tiles[1][:2]) == [0, 1]
    assert tiles[0][2:].tolist() == [40000, 160000, 42500, 185000]


@pytest.mark.parametrize("n,expected", [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7), (8, 8), (9, 9), (100, 96)])
def test_create_grid2_tilecounts(n, expected):
    # reference tests/test_grid.py:21-48 pins these counts
    cols, rows = grid_shape_squarish(BOUNDS, n)
    assert cols * rows == expected


def test_create_grid2_max():
    cols, rows = grid_shape_squarish(BOUNDS, 150, 150)
    assert cols * rows == 148


def test_create_grid2_errors():
    with pytest.raises(ValueError, match="nb_squarish_tiles should be > 0"):
        grid_shape_squarish(BOUNDS, 0)
    with pytest.raises(ValueError, match="nb_squarish_tiles_max should be > 0"):
        grid_shape_squarish(BOUNDS, 1, 0)
    with pytest.raises(ValueError, match="nb_squarish_tiles_max should be >="):
        grid_shape_squarish(BOUNDS, 5, 4)


def test_create_grid3_4tiles():
    # reference tests/test_grid.py:71-80
    tiles = create_grid_bboxes_wh(BOUNDS, width=2500, height=25000)
    assert len(tiles) == 4


@pytest.mark.parametrize(
    "bounds,n_input,wanted,expected",
    [
        ((40, 40, 45, 46), 4, 8, 8),
        ((40, 40, 45, 46), 4, 12, 12),
        ((40, 40, 46, 45), 4, 8, 8),
        ((40, 40, 46, 45), 4, 12, 12),
        ((40, 40, 45, 45), 4, 2, 4),
    ],
)
def test_split_tiles(bounds, n_input, wanted, expected):
    # reference tests/test_grid.py:83-120 — counts + area conservation
    base = create_grid_bboxes(bounds, 2, 2)
    if wanted <= n_input:
        children = [tuple(t[2:]) for t in base]
    else:
        ratio = wanted / n_input
        children = [c for t in base for c in split_tile_bboxes(t[2], t[3], t[4], t[5], ratio)]
    assert len(children) == expected
    total_area = sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in children)
    in_area = (bounds[2] - bounds[0]) * (bounds[3] - bounds[1])
    assert total_area == pytest.approx(in_area)


# -- view angles ----------------------------------------------------------
VIEW_CASES = [
    # (descr, start, end, wkt) — reference tests/test_view_angles.py:37-79
    ("EMPTY", math.nan, math.nan, "POLYGON EMPTY"),
    ("None", math.nan, math.nan, None),
    ("NE>NW_<360", 45.0, 135.0, "POLYGON((1 1, 1 -1, -1 -1, -1 1, -2 -2, 2 -2, 1 1))"),
    ("NE>SW_<360", 0.0, 270.0, "POLYGON((1 0, 0 1, -1 0, 0 -1, -1 -1, -2 2, 2 2, 1 0))"),
    ("NE>SW_360", 0.0, 360.0, "POLYGON((1 0, 1 1, -1 1, -1 -1, 1 -1, 2 0, 2 -2, -2 -2, -2 2, 2 2, 1 0))"),
    ("NE_SE", 315.0, 45.0, "POLYGON((1 1, 1 -1, 2 -1, 2 1, 1 1))"),
    ("NE, y=0", 0.0, 45.0, "POLYGON((1 0, 1 1, 2 1, 2 0, 1 0))"),
    ("NW", 135.0, 180.0, "POLYGON((-1 0, -1 1, -2 1, -2 0, -1 0))"),
    ("NW_SE", 135.0, 315.0, "POLYGON((-1 1, -1 0.5, 1 -1, -3 1, -1 1))"),
    ("NW_SW", 135.0, 225.0, "POLYGON((-1 -1, -1 1, -2 1, -2 -1, -1 -1))"),
    ("NW>SE", 135.0, 360.0, "POLYGON((-1 1, -1 -1, 1 -1, 1 0, 2 -2, -2 -2, -1 1))"),
    ("SE, y!=0", 270.0, 315.0, "POLYGON((1 -1, 0 -1, 0 -2, 1 -1))"),
    ("SE, y=0", 315.0, 360.0, "POLYGON((1 0, 1 -1, 2 -1, 2 0, 1 0))"),
    ("SW>NW", 225.0, 135.0, "POLYGON((-1 -1, 2 -1, -1 1, 3 1, 3 -2, -1 -1))"),
]


@pytest.mark.parametrize("descr,start,end,wkt", VIEW_CASES, ids=[c[0] for c in VIEW_CASES])
def test_view_angles_goldens(descr, start, end, wkt):
    vx, vy = 10.0, 20.0
    if wkt is None:
        got = view_angles((vx, vy), None)
    else:
        g = wkt_loads(wkt)
        # translate by viewpoint like the reference test does
        if g.is_empty:
            got = view_angles((vx, vy), g)
        else:
            rings = [r + np.array([vx, vy]) for r in g.data]
            got = view_angles((vx, vy), polygon(rings[0], rings[1:]))
    if math.isnan(start):
        assert math.isnan(got[0]) and math.isnan(got[1])
    else:
        assert got == (start, end), descr


def test_view_angles_error_contracts():
    # reference tests/test_view_angles.py:104-118
    from pygeoops_spark.geom.view_angles import view_angles as va

    with pytest.raises(ValueError, match="can't be a multipart"):
        va((0.0, 0.0), wkt_loads("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"))
    # empty -> nan pair, None -> nan pair
    s, e = va((0.0, 0.0), wkt_loads("POLYGON EMPTY"))
    assert s != s and e != e
    s, e = va((0.0, 0.0), None)
    assert s != s and e != e


def test_split_tile_geometry_lshape_area_conservation():
    """Arbitrary-polygon split (reference split_tiles on non-rectangular
    tiles, _grid.py:148-232): an L-shaped tile split 4-ways conserves
    area and every child is a proper polygon."""
    from pygeoops_spark.geom import polygon
    from pygeoops_spark.geom.grid import split_tile_geometry
    from pygeoops_spark.geom.kernels import polygon_area
    from pygeoops_spark.geom.wkb import POLYGON

    lshape = polygon([(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)])
    children = split_tile_geometry(lshape, 4.0)
    assert len(children) >= 4
    assert all(c.type_id == POLYGON for c in children)
    total = sum(polygon_area(c) for c in children)
    assert total == pytest.approx(10 * 4 + 4 * 6)


def test_split_tile_geometry_concave_pinch_separates_parts():
    """A U-shaped tile cut through its opening: the two prongs on one
    side of the cut must come back as SEPARATE polygons (shapely.ops.
    split's one-geometry-per-connected-piece), not one pinched ring."""
    from pygeoops_spark.geom import polygon
    from pygeoops_spark.geom.grid import split_tile_geometry
    from pygeoops_spark.geom.kernels import polygon_area

    # U opens upward: prongs x in [0,2] and [8,10], base y in [0,2]
    u = polygon(
        [(0, 0), (10, 0), (10, 10), (8, 10), (8, 2), (2, 2), (2, 10), (0, 10)]
    )
    in_area = polygon_area(u)
    children = split_tile_geometry(u, 2.0)  # one split; w == h -> cut y=5
    # lower half: connected base+stubs (1 piece); upper half: 2 prongs
    assert len(children) == 3
    total = sum(polygon_area(c) for c in children)
    assert total == pytest.approx(in_area)
    areas = sorted(polygon_area(c) for c in children)
    assert areas[0] == pytest.approx(10.0)  # each upper prong 2x5
    assert areas[1] == pytest.approx(10.0)


def test_split_tile_geometry_triangle_counts():
    """Triangle split in 3 (ratio 3): three slabs along the longer side;
    pieces conserve area."""
    from pygeoops_spark.geom import polygon
    from pygeoops_spark.geom.grid import split_tile_geometry
    from pygeoops_spark.geom.kernels import polygon_area

    tri = polygon([(0, 0), (12, 0), (0, 6)])
    children = split_tile_geometry(tri, 3.0)
    assert len(children) == 3
    assert sum(polygon_area(c) for c in children) == pytest.approx(36.0)


def test_split_tile_geometry_property_convex():
    """Property sweep: random star-shaped polygons (angular sort of a
    random cloud), random split ratios — children conserve area exactly
    and every child is a simple polygon (any pinch introduced by the
    slab clip must have been separated by the nonzero repair)."""
    import numpy as np

    from pygeoops_spark.geom import polygon
    from pygeoops_spark.geom.grid import split_tile_geometry
    from pygeoops_spark.geom.kernels import polygon_area
    from pygeoops_spark.geom.validity import polygon_is_simple
    from pygeoops_spark.geom.wkb import POLYGON

    rng = np.random.default_rng(17)
    for trial in range(25):
        pts = rng.uniform(0, 100, (12, 2))
        # convex hull via angular sort around the centroid of extreme
        # points (fine for random clouds; exact hull not needed — any
        # simple polygon works for the property)
        c = pts.mean(axis=0)
        ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        ring = pts[np.argsort(ang)]
        poly = polygon(ring.tolist())
        in_area = polygon_area(poly)
        ratio = float(rng.uniform(1.5, 9.0))
        children = split_tile_geometry(poly, ratio)
        assert children, f"trial {trial}: no children"
        assert all(ch.type_id == POLYGON for ch in children)
        total = sum(polygon_area(ch) for ch in children)
        assert total == pytest.approx(in_area, rel=1e-9), f"trial {trial}"
        for ch in children:
            assert polygon_is_simple(ch), f"trial {trial}"


def test_ring_signed_area_projected_offset_and_tolerance_closure():
    """Shoelace conditioning at projected-CRS magnitudes: shifting by
    the first vertex removes (a) catastrophic cancellation of raw x*y
    products at |x| ~ 5e5 and (b) the offset*gap error of a ring whose
    closing vertex is within tolerance but not bit-equal (overlay
    stitching can leave a sub-snap gap — the unshifted formula returned
    0.255 for a 0.005-area ring)."""
    import numpy as np

    from pygeoops_spark.geom.kernels import ring_signed_area

    rel = np.array(
        [[1e-06, 0.0], [0.1, 0.0], [1.0, 0.1], [0.90909, 0.090909], [0.0, 0.0]]
    )
    a_rel = ring_signed_area(rel)
    for off in (1e5, 5e5, 1e6):
        a_abs = ring_signed_area(rel + off)
        assert abs(a_abs - a_rel) < 1e-6, off
