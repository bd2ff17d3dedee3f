"""make_valid tests — reference tests/test_simplify.py:181-251 M-shape
scenarios (self-touch -> 2 parts, self-cross -> 3 parts)."""

import pytest

from pygeoops_spark.geom import polygon, wkt_loads
from pygeoops_spark.geom.kernels import polygon_area
from pygeoops_spark.geom.simplify_geom import simplify
from pygeoops_spark.geom.validity import make_valid, polygon_is_simple
from pygeoops_spark.geom.wkb import MULTIPOLYGON, POLYGON


def test_make_valid_passthrough():
    p = polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    out = make_valid(p)
    assert out.type_id == POLYGON
    assert polygon_area(out) == 100.0
    assert polygon_is_simple(p)


def test_simplify_invalid_exterior():
    # reference :182-193 — self-crossing spike; after lang tol 1 the
    # result is a MultiPolygon whose dominant part keeps the hole and
    # has 7 exterior coords
    poly = polygon(
        [(0, 0), (0, 10), (5, 10), (3, 12), (3, 9), (10, 10), (10, 0)],
        [[(2, 2), (2, 8), (8, 8), (8, 2)]],
    )
    out = simplify(poly, 1, algorithm="lang")
    assert out is not None
    assert out.type_id == MULTIPOLYGON
    assert len(out.data[0].data[0]) == 7
    assert len(out.data[0].data) == 2  # hole stays with the big part


def test_simplify_m_touch():
    # reference :196-222 — M shape whose ring touches itself after
    # simplification -> valid MultiPolygon of 2 parts
    poly = polygon(
        [(0, 0), (0, 10), (5, 5), (10, 10), (10, 0), (8, 0), (8, 5), (5, 4), (2, 5), (2, 0)]
    )
    out = simplify(poly, 1, algorithm="lang")
    assert out is not None
    assert out.type_id == MULTIPOLYGON
    assert len(out.data) == 2
    from pygeoops_spark.geom.wkb import get_coordinates

    # reference compares against its 13-coord invalid-exterior fixture
    # (tests/test_simplify.py:221) — the split parts total 12 coords
    assert len(get_coordinates(out)) < 13


def test_simplify_m_cross():
    # reference :226-251 — ring crosses itself -> 3 parts
    poly = polygon(
        [(0, 0), (0, 10), (5, 5), (10, 10), (10, 0), (8, 0), (8, 5.5), (5, 4.5), (2, 5.5), (2, 0)]
    )
    out = simplify(poly, 1, algorithm="lang")
    assert out is not None
    assert out.type_id == MULTIPOLYGON
    assert len(out.data) == 3


# -- collapse semantics (reference _general.py:419-479 keep_collapsed) ----
def test_make_valid_collapsed_ring_to_linestring():
    from pygeoops_spark.geom import polygon
    from pygeoops_spark.geom.validity import make_valid

    flat = polygon([(0, 0), (2, 0), (5, 0)])  # zero-area ring
    kept = make_valid(flat, keep_collapsed=True)
    assert kept is not None and kept.geom_type == "LINESTRING"
    import numpy as np

    coords = np.asarray(kept.data)
    assert coords[0].tolist() == [0.0, 0.0]
    assert coords[-1].tolist() == [5.0, 0.0]
    assert make_valid(flat, keep_collapsed=False) is None


def test_make_valid_collapsed_ring_to_point():
    from pygeoops_spark.geom import polygon
    from pygeoops_spark.geom.validity import make_valid

    pt = polygon([(3, 4), (3, 4), (3, 4)])
    kept = make_valid(pt, keep_collapsed=True)
    assert kept is not None and kept.geom_type == "POINT"
    assert make_valid(pt, keep_collapsed=False) is None


def test_make_valid_multipolygon_mixed_collapse():
    from pygeoops_spark.geom import polygon
    from pygeoops_spark.geom.general import collect
    from pygeoops_spark.geom.validity import make_valid

    good = polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    flat = polygon([(10, 0), (12, 0), (14, 0)])
    mp = collect([good, flat])
    assert mp.geom_type == "MULTIPOLYGON"
    kept = make_valid(mp, keep_collapsed=True)
    assert kept.geom_type == "GEOMETRYCOLLECTION"
    types = sorted(p.geom_type for p in kept.data)
    assert types == ["LINESTRING", "POLYGON"]
    dropped = make_valid(mp, keep_collapsed=False)
    assert dropped.geom_type == "POLYGON"


def test_make_valid_only_if_invalid_fast_path():
    from pygeoops_spark.geom import polygon
    from pygeoops_spark.geom.validity import make_valid

    good = polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    assert make_valid(good, only_if_invalid=True) is good  # untouched
    # a self-crossing bowtie still gets repaired through the fast path
    bowtie = polygon([(0, 0), (4, 4), (4, 0), (0, 4)])
    fixed = make_valid(bowtie, only_if_invalid=True)
    assert fixed.geom_type == "MULTIPOLYGON"
    assert len(fixed.data) == 2


def test_make_valid_only_if_invalid_detects_collapsed_shell():
    """A zero-area shell is INVALID: the fast path must fall through to
    the repair path so keep_collapsed semantics apply (code-review r02
    finding: 0 loops used to count as 'simple')."""
    from pygeoops_spark.geom import polygon
    from pygeoops_spark.geom.validity import make_valid

    flat = polygon([(0, 0), (2, 0), (5, 0)])
    fast = make_valid(flat, keep_collapsed=True, only_if_invalid=True)
    slow = make_valid(flat, keep_collapsed=True)
    assert fast.geom_type == slow.geom_type == "LINESTRING"
