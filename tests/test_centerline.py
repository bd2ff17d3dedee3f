"""centerline kernel tests — reference tests/test_centerline.py goldens.

Box cases assert exact WKT (like the reference :18-29); complex cases
compare chains order-insensitively with coordinate tolerance 1e-6 (the
reference uses equals_exact 1e-6, :175-177); regression polys assert
not-None (:195-225).
"""

import numpy as np
import pytest

from pygeoops_spark.geom import wkt_dumps, wkt_loads
from pygeoops_spark.geom.centerline import average_width, centerline, compactness
from pygeoops_spark.geom.wkb import LINESTRING, MULTILINESTRING, get_parts


def _chains(geom):
    return [np.asarray(p.data)[:, :2] for p in get_parts(geom) if p.type_id == LINESTRING]


def assert_equals_tol(got, expected_wkt: str, tol: float = 1e-6):
    exp = wkt_loads(expected_wkt)
    got_chains = _chains(got)
    exp_chains = _chains(exp)
    assert len(got_chains) == len(exp_chains), (
        f"part count {len(got_chains)} != {len(exp_chains)}:\n"
        f"got {wkt_dumps(got)}\nexp {expected_wkt}"
    )
    remaining = list(exp_chains)
    for g in got_chains:
        hit = None
        for i, e in enumerate(remaining):
            if len(e) == len(g) and (
                np.allclose(g, e, atol=tol) or np.allclose(g[::-1], e, atol=tol)
            ):
                hit = i
                break
        assert hit is not None, f"no match for chain {g.tolist()}\nexp {expected_wkt}\ngot {wkt_dumps(got)}"
        remaining.pop(hit)


def test_centerline_boxes_exact():
    # reference tests/test_centerline.py:17-29 — exact WKT
    got = centerline(wkt_loads("POLYGON ((0 0, 0 2, 10 2, 10 0, 0 0))"))
    assert wkt_dumps(got) == "LINESTRING (1 1, 9 1)"
    got = centerline(wkt_loads("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"))
    assert wkt_dumps(got) == "LINESTRING (5 0, 5 10)"


def test_centerline_none():
    assert centerline(None) is None


L_SHAPE = "POLYGON ((0 0, 0 10, 2 10, 2 2, 10 2, 10 0, 0 0))"


def test_centerline_l_shape():
    # reference :129-134 — L shape, mbl=-1 -> LINESTRING (1 9, 1 1, 9 1)
    got = centerline(wkt_loads(L_SHAPE), min_branch_length=-1.0)
    assert_equals_tol(got, "LINESTRING (1 9, 1 1, 9 1)")
    got_ext = centerline(wkt_loads(L_SHAPE), min_branch_length=-1.0, extend=True)
    assert_equals_tol(got_ext, "LINESTRING (1 10, 1 1, 10 1)")


ELLIPTICAL = "POLYGON ((0 1, 1 3.25, 2 4.5, 3 5.75, 3.5 6.25, 5 3.25, 3.75 1.75, 2.5 0.5, 1 0, 0 1))"


def test_centerline_elliptical_mbl_auto():
    # reference :105-111 — mbl=-1 -> single linestring
    got = centerline(wkt_loads(ELLIPTICAL), min_branch_length=-1.0)
    assert_equals_tol(
        got, "LINESTRING (1.375 1.375, 3.7916666666666665 5.458333333333333)"
    )


def test_centerline_elliptical_mbl_zero():
    # reference :97-104 — mbl=0 keeps the small branches
    got = centerline(wkt_loads(ELLIPTICAL), min_branch_length=0.0)
    assert_equals_tol(
        got,
        "MULTILINESTRING ((3.2641509433962264 3.3726415094339623, 3.7916666666666665 5.458333333333333), "
        "(3.2641509433962264 3.3726415094339623, 3.34375 3.359375), "
        "(1.375 1.375, 3.2641509433962264 3.3726415094339623))",
    )


FANCY_L = "POLYGON ((0 0, 0 8, -2 10, 4 10, 2 8, 2 2, 10 2, 10 0, 0 0))"


def test_centerline_fancy_l_mbl_auto():
    got = centerline(wkt_loads(FANCY_L), min_branch_length=-1.0)
    assert_equals_tol(
        got,
        "MULTILINESTRING ((1 8.75, 1.1367816091954022 1.1160919540229888, 8.87687074829932 0.9829931972789112), "
        "(1 8.75, 3.25 9.75), (-1.25 9.75, 1 8.75))",
    )


NARROW = (
    "POLYGON ((64440.00000007346534403 218000.00000000279396772, "
    "64438.00000007345079212 218000.00000000279396772, "
    "64438.00000007345079212 218000.00000000311410986, "
    "64440.00000007346534403 218000.00000000311410986, "
    "64440.00000007346534403 218000.00000000279396772))"
)


def test_centerline_very_narrow():
    got = centerline(wkt_loads(NARROW), min_branch_length=-1.0)
    assert got is not None
    assert_equals_tol(
        got,
        "LINESTRING (64438.00000007345 218000.00000000297, 64440.000000073465 218000.00000000297)",
        tol=1e-6,
    )


GAVE_ERRORS = [
    "POLYGON ((139770.26822331376024522 188334.00010800323798321, 139769.5 188338.01162790699163452, 139769.5 188338.3723930635896977, 139769.5 188338.5, 139769.81343283582828008 188338.5, 139770.375 188339.375, 139772.39924806414637715 188340.26989983080420643, 139770.26822331376024522 188334.00010800323798321),(139769.75256541155977175 188338.40516005983226933, 139769.75256541153066792 188338.40516005983226933, 139769.75256541153066792 188338.4051600598031655, 139769.75256541155977175 188338.40516005983226933))",
    "POLYGON ((178951.875 232219.875, 178937.875 232223.875, 178933.125 232234.125, 178930.125 232238.125, 178916.375 232270.125, 178913.375 232282.625, 178913.375 232286.23988888890016824, 178913.375 232287.625, 178911.375 232290.625, 178911.2054976865183562 232290.82441448644385673, 178907.125 232295.625, 178905.125 232300.125, 178903.125 232303.375, 178912.375 232308.375, 178918.125 232297.375, 178918.85213925343123265 232295.53897338511887938, 178918.85200000001350418 232295.51199999998789281, 178918.85213925343123265 232295.53897338508977555, 178921.44179962016642094 232289.00008095911471173, 178921.84463567720376886 232287.98291991505539045, 178928.125 232272.125, 178929.125 232271.625, 178929.125 232266.625, 178931.375 232262.625, 178933.875 232256.875, 178937.875 232251.125, 178938.375 232248.875, 178939.375 232248.125, 178945.125 232237.625, 178951.875 232219.875))",
]


@pytest.mark.parametrize("wkt", GAVE_ERRORS, ids=["regr1", "regr2"])
def test_centerline_gave_errors(wkt):
    # reference :195-208 — must not raise, must not return None
    got = centerline(wkt_loads(wkt))
    assert got is not None


def test_average_width_compactness():
    box = wkt_loads("POLYGON ((0 0, 10 0, 10 2, 0 2, 0 0))")
    assert average_width(box) == pytest.approx(2.0)
    assert compactness(box) == pytest.approx(4 * np.pi * 20 / 24**2)
