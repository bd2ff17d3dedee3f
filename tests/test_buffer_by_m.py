"""buffer_by_m kernel tests — reference tests/test_buffer_by_m.py:27-143
golden table (types + part relations), re-asserted on our kernels."""

import math

import numpy as np
import pytest

from pygeoops_spark.geom import wkt_loads
from pygeoops_spark.geom.buffer_by_m import buffer_by_m, circle_coords
from pygeoops_spark.geom.kernels import polygon_area
from pygeoops_spark.geom.overlay import polygon_intersection
from pygeoops_spark.geom.wkb import MULTIPOLYGON, POLYGON, get_parts


def _parts_relation(geom) -> str | None:
    parts = get_parts(geom)
    if len(parts) < 2:
        return None
    shared_vertex = False
    overlapping = False
    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            ci = {tuple(np.round(c, 9)) for c in parts[i].data[0]}
            cj = {tuple(np.round(c, 9)) for c in parts[j].data[0]}
            if ci & cj:
                shared_vertex = True
            if polygon_intersection(parts[i], parts[j]) is not None:
                overlapping = True
    if overlapping:
        return "overlaps"
    if shared_vertex:
        return "touches"
    return "disjoint"


CASES = [
    # (descr, wkt, exp_type, exp_relation)
    ("point +Z", "POINT Z (0 0 1)", POLYGON, None),
    ("point -Z", "POINT Z (0 0 -1)", "empty", None),
    ("multipoint", "MULTIPOINT Z ((0 0 1), (5 6 2))", MULTIPOLYGON, "disjoint"),
    ("line", "LINESTRING Z (0 6 1, 0 0 2, 9 0 2)", POLYGON, None),
    ("line zero taper", "LINESTRING Z (0 6 1, 0 0 0, 9 0 2)", MULTIPOLYGON, "touches"),
    ("line neg disjoint", "LINESTRING Z (0 6 1, 0 0 -1, 9 0 2)", MULTIPOLYGON, "disjoint"),
    ("line nan disjoint", "LINESTRING Z (0 6 1, 0 0 nan, 9 0 2)", MULTIPOLYGON, "disjoint"),
    ("line all neg", "LINESTRING Z (0 6 -1, 0 0 -1, 9 0 -2)", "empty", None),
    ("line M", "LINESTRING M (0 6 1, 0 0 2, 9 0 2)", POLYGON, None),
    ("line ZM prefers M", "LINESTRING ZM (0 6 -1 1, 0 0 -1 0, 9 0 -1 2)", MULTIPOLYGON, "touches"),
    ("multiline", "MULTILINESTRING Z ((0 6 1, 0 0 2, 9 0 2), (0 9 1, 5 9 2, 9 9 1))", MULTIPOLYGON, None),
    ("polygon", "POLYGON Z ((0 0 0, 0 5 1, 5 2.5 2, 0 0 0))", POLYGON, None),
    (
        "multipolygon",
        "MULTIPOLYGON Z (((0 0 0, 0 5 1, 5 5 2, 5 0 3, 0 0 0)), ((10 0 0, 10 5 1, 15 5 2, 15 0 3, 10 0 0)))",
        None,
        None,
    ),
    (
        "collection mixed",
        "GEOMETRYCOLLECTION (LINESTRING Z (0 6 1, 0 0 2, 9 0 2), POINT Z (5 9 1), "
        "POLYGON Z ((10 0 0, 10 5 1, 15 5 2, 15 0 3, 10 0 0)))",
        MULTIPOLYGON,
        None,
    ),
]


@pytest.mark.parametrize("descr,wkt,exp_type,exp_rel", CASES, ids=[c[0] for c in CASES])
def test_buffer_by_m_cases(descr, wkt, exp_type, exp_rel):
    g = wkt_loads(wkt)
    out = buffer_by_m(g)
    assert out is not None
    if exp_type == "empty":
        assert out.type_id == POLYGON and out.is_empty
        return
    if exp_type is not None:
        assert out.type_id == exp_type, f"{descr}: got {out.geom_type}"
    if exp_rel is not None:
        assert _parts_relation(out) == exp_rel, descr


def test_buffer_by_m_none_and_no_mz():
    assert buffer_by_m(None) is None
    with pytest.raises(ValueError, match="must have M or Z"):
        buffer_by_m(wkt_loads("POINT (0 0)"))


def test_buffer_point_area():
    out = buffer_by_m(wkt_loads("POINT Z (0 0 2)"), quad_segs=16)
    # 64-gon area approaches pi*r^2
    assert polygon_area(out) == pytest.approx(math.pi * 4, rel=0.01)


def test_circle_coords():
    c = circle_coords(1, 2, 3, quad_segs=8)
    assert len(c) == 33
    d = np.hypot(c[:, 0] - 1, c[:, 1] - 2)
    assert np.allclose(d, 3.0)
