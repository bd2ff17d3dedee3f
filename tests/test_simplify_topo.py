"""Distributed simplify_topo tests — reference
tests/test_simplify_topo.py semantics on the Spark pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pygeoops_spark.geom import polygon as mk_poly, wkb_dumps, wkb_loads
from pygeoops_spark.geom.kernels import polygon_area


POLY1 = [(10, 10), (0, 10), (0, 0), (10, 0)]
POLY2 = [(10, 10), (0, 10), (0, 0), (11, 0)]


def _run(spark, polys, tolerance=1, algorithm="rdp"):
    from pygeoops_spark.operators.simplify_topo import simplify_topo

    df = spark.createDataFrame(
        [(i, wkb_dumps(mk_poly(p))) for i, p in enumerate(polys)], ["fid", "wkb"]
    )
    out = simplify_topo(df, "fid", "wkb", tolerance, algorithm)
    rows = {r["fid"]: wkb_loads(bytes(r["simplified_wkb"])) for r in out.collect()}
    return rows


@pytest.mark.parametrize("algorithm,tolerance", [("rdp", 1), ("lang", 1), ("lang+", 1), ("vw", 5)])
def test_simplify_topo_shared_boundary(spark, algorithm, tolerance):
    # reference :12-38 — poly1 unchanged; poly2's (11,0) spike removed
    # after the shared-boundary junction (10,0) is inserted -> equal
    rows = _run(spark, [POLY1, POLY2], tolerance, algorithm)
    assert len(rows) == 2
    a0 = polygon_area(rows[0])
    a1 = polygon_area(rows[1])
    assert a0 == pytest.approx(100.0)
    assert a1 == pytest.approx(100.0)
    c0 = {tuple(c) for c in np.asarray(rows[0].data[0])}
    c1 = {tuple(c) for c in np.asarray(rows[1].data[0])}
    assert c0 == c1 == {(10, 10), (0, 10), (0, 0), (10, 0)}


def test_simplify_topo_adjacent_squares_unchanged(spark):
    # reference :66-92 — 3 adjacent unit squares survive unchanged
    squares = [
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        [(10, 0), (20, 0), (20, 10), (10, 10)],
        [(20, 0), (30, 0), (30, 10), (20, 10)],
    ]
    rows = _run(spark, squares, tolerance=1, algorithm="lang")
    assert len(rows) == 3
    for i, sq in enumerate(squares):
        assert polygon_area(rows[i]) == pytest.approx(100.0)
        got = {tuple(c) for c in np.asarray(rows[i].data[0])}
        assert got == {tuple(map(float, c)) for c in sq}


def test_simplify_topo_with_hole(spark):
    """Features with interior rings keep them through the pipeline."""
    from pygeoops_spark.operators.simplify_topo import simplify_topo

    p1 = mk_poly([(0, 0), (20, 0), (20, 20), (0, 20)], [[(5, 5), (8, 5), (8, 8), (5, 8)]])
    p2 = mk_poly([(20, 0), (40, 0), (40, 20), (20, 20)])
    df = spark.createDataFrame(
        [(0, wkb_dumps(p1)), (1, wkb_dumps(p2))], ["fid", "wkb"]
    )
    out = {
        r["fid"]: wkb_loads(bytes(r["simplified_wkb"]))
        for r in simplify_topo(df, "fid", "wkb", 1, "rdp").collect()
    }
    assert polygon_area(out[0]) == pytest.approx(400 - 9)
    assert len(out[0].data) == 2  # shell + hole
    assert polygon_area(out[1]) == pytest.approx(400)


def test_simplify_topo_multipolygon(spark):
    """MultiPolygon features keep their parts separate."""
    from pygeoops_spark.geom import collection, multi
    from pygeoops_spark.geom.wkb import MULTIPOLYGON
    from pygeoops_spark.operators.simplify_topo import simplify_topo

    mp = multi(
        MULTIPOLYGON,
        [
            mk_poly([(0, 0), (10, 0), (10, 10), (0, 10)]),
            mk_poly([(30, 0), (40, 0), (40, 10), (30, 10)]),
        ],
    )
    df = spark.createDataFrame([(0, wkb_dumps(mp))], ["fid", "wkb"])
    out = simplify_topo(df, "fid", "wkb", 1, "rdp").collect()
    g = wkb_loads(bytes(out[0]["simplified_wkb"]))
    assert g.type_id == MULTIPOLYGON
    assert len(g.data) == 2
    assert polygon_area(g) == pytest.approx(200.0)


def test_simplify_topo_mixed_poly_line(spark):
    """Reference tests/test_simplify_topo.py:141-167: a line sharing a
    polygon's boundary picks up the polygon's vertex (10,0) as a
    junction, so after lang simplification the line keeps it; the
    polygon is unchanged."""
    import pandas as pd

    from pygeoops_spark.geom import linestring, polygon, wkb_dumps
    from pygeoops_spark.geom.wkb import get_coordinates, wkb_loads
    from pygeoops_spark.operators.simplify_topo import simplify_topo

    poly1 = polygon([(10, 10), (0, 10), (0, 0), (10, 0)])
    line1 = linestring([(10, 10), (0, 10), (0, 0), (11, 0)])
    df = spark.createDataFrame(
        pd.DataFrame({"fid": [0, 1], "wkb": [wkb_dumps(poly1), wkb_dumps(line1)]})
    )
    out = {r["fid"]: r["simplified_wkb"] for r in simplify_topo(
        df, "fid", "wkb", tolerance=1, algorithm="lang"
    ).collect()}
    g0 = wkb_loads(bytes(out[0]))
    assert g0.geom_type == "POLYGON"
    assert len(get_coordinates(g0)) == 5
    g1 = wkb_loads(bytes(out[1]))
    assert g1.geom_type == "LINESTRING"
    got = [tuple(c) for c in get_coordinates(g1)]
    assert got == [(10.0, 10.0), (0.0, 10.0), (0.0, 0.0), (10.0, 0.0), (11.0, 0.0)]


def test_simplify_topo_none_and_unsupported_rows_preserved(spark):
    """Reference: simplify_topo([None]) == [None] — rows must not
    vanish from the output."""
    import pandas as pd

    from pygeoops_spark.geom import polygon, wkb_dumps
    from pygeoops_spark.operators.simplify_topo import simplify_topo

    poly1 = polygon([(10, 10), (0, 10), (0, 0), (10, 0)])
    df = spark.createDataFrame(
        pd.DataFrame({"fid": [0, 1], "wkb": [wkb_dumps(poly1), None]})
    )
    rows = {r["fid"]: r["simplified_wkb"] for r in simplify_topo(
        df, "fid", "wkb", tolerance=1, algorithm="rdp"
    ).collect()}
    assert len(rows) == 2
    assert rows[0] is not None
    assert rows[1] is None


def test_simplify_topo_island_filling_hole_uniform_signature(spark):
    """ADVICE r02: an island whose entire shell coincides with another
    feature's hole has a UNIFORM fid-set signature all the way around
    the ring, so there is no signature change to rotate to; both owners
    must instead canonicalize to the lexicographically smallest snapped
    vertex or their rotations can simplify differently.  The island
    ring here starts at a different vertex (and winds the hole's
    octagon differently) than the hole ring."""
    from pygeoops_spark.geom import wkt_loads
    from pygeoops_spark.operators.simplify_topo import simplify_topo

    # octagonal hole/island: rdp@1.5 keeps 4-9 of the 8 vertices
    # depending on where the closed chain starts, so rotation
    # canonicalization is load-bearing here
    hole_pts = [
        (3, 3), (5, 2.9), (7, 3), (8, 5), (7, 7), (5, 7.1), (3, 7), (2, 5)
    ]
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    donut = mk_poly(outer, [list(reversed(hole_pts))])
    # island = same ring, rotated to start elsewhere, opposite winding
    island = mk_poly(hole_pts[3:] + hole_pts[:3])
    df = spark.createDataFrame(
        [(0, wkb_dumps(donut)), (1, wkb_dumps(island))], ["fid", "wkb"]
    )
    rows = {
        r["fid"]: wkb_loads(bytes(r["simplified_wkb"]))
        for r in simplify_topo(df, "fid", "wkb", 1.5, "rdp").collect()
    }
    hole_coords = {tuple(c) for c in np.asarray(rows[0].data[1])}
    island_coords = {tuple(c) for c in np.asarray(rows[1].data[0])}
    assert hole_coords == island_coords, (
        f"shared boundary diverged:\nhole   {sorted(hole_coords)}\n"
        f"island {sorted(island_coords)}"
    )
    # the near-collinear vertices were actually simplified away
    assert len(island_coords) < len(hole_pts)


def test_simplify_dataframe_dispatch_bridge(spark):
    """Reference one-call dispatch parity (_simplify.py:92-106):
    simplify(df, ..., preserve_common_boundaries=True) routes to the
    distributed simplify_topo; False applies the per-geometry kernel.
    Same two-polygon fixture as the shared-boundary test: the topo path
    keeps the shared edge consistent (both areas 100), the plain path
    simplifies each feature independently."""
    from pygeoops_spark.operators.simplify import simplify

    df = spark.createDataFrame(
        [(i, wkb_dumps(mk_poly(p))) for i, p in enumerate([POLY1, POLY2])],
        ["fid", "wkb"],
    )
    topo = simplify(df, "fid", "wkb", 1, preserve_common_boundaries=True)
    assert topo.columns == ["fid", "simplified_wkb"]
    rows = {r["fid"]: wkb_loads(bytes(r["simplified_wkb"])) for r in topo.collect()}
    assert polygon_area(rows[0]) == pytest.approx(100.0)
    assert polygon_area(rows[1]) == pytest.approx(100.0)

    plain = simplify(df, "fid", "wkb", 1, preserve_common_boundaries=False)
    assert plain.columns == ["fid", "simplified_wkb"]
    rows_p = {r["fid"]: wkb_loads(bytes(r["simplified_wkb"])) for r in plain.collect()}
    # independent simplification: poly2's near-collinear (10,0) kink
    # is NOT protected by a shared boundary, so the areas differ
    assert polygon_area(rows_p[0]) == pytest.approx(100.0)
    assert polygon_area(rows_p[1]) == pytest.approx(105.0)

    with pytest.raises(ValueError, match="preserve_topology=False"):
        simplify(
            df, "fid", "wkb", 1,
            preserve_common_boundaries=True, preserve_topology=False,
        )


def test_simplify_topo_keep_points_on(spark):
    """keep_points_on through the distributed pipeline (reference
    _simplify_topo.py keep_points_on): a keep geometry pinning poly2's
    spike vertex (11,0) prevents its removal, while the run without it
    removes the spike."""
    from pygeoops_spark.geom import point as mk_point
    from pygeoops_spark.operators.simplify import simplify

    df = spark.createDataFrame(
        [(i, wkb_dumps(mk_poly(p))) for i, p in enumerate([POLY1, POLY2])],
        ["fid", "wkb"],
    )
    keep = wkb_dumps(mk_point(11.0, 0.0))
    out = simplify(
        df, "fid", "wkb", 1,
        preserve_common_boundaries=True, keep_points_on_wkb=keep,
    )
    rows = {r["fid"]: wkb_loads(bytes(r["simplified_wkb"])) for r in out.collect()}
    c1 = {tuple(c) for c in np.asarray(rows[1].data[0])}
    assert (11.0, 0.0) in c1
    assert polygon_area(rows[0]) == pytest.approx(100.0)
