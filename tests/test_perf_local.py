"""Performance-contract tests mirroring the reference's local-only perf
asserts (tests/test_difference.py:115-253 gates with RUNS_LOCAL; so do
we — set RUNS_LOCAL=1 to run; skipped in automated runs to avoid
timing flakes)."""

import os
import time

import pytest

from pygeoops_spark.geom import polygon
from pygeoops_spark.geom.difference import difference_all
from pygeoops_spark.geom.overlay import polygon_difference, polygon_union

RUNS_LOCAL = os.environ.get("RUNS_LOCAL") == "1"


def box(x0, y0, x1, y1):
    return polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


@pytest.mark.skipif(not RUNS_LOCAL, reason="timing test; set RUNS_LOCAL=1")
def test_intersects_prefilter_speedup():
    # reference asserts the prepared-intersects prefilter is >=2x faster
    # than blind difference when most subtrahends don't intersect
    n = 600
    ring = [(i, (i % 2) * 3) for i in range(n)] + [(n, -5), (0, -5)]
    geom = polygon(ring)
    far_subs = [box(10_000 + 10 * k, 0, 10_005 + 10 * k, 5) for k in range(60)]

    t0 = time.time()
    for _ in range(3):
        r1 = difference_all(geom, far_subs, check_intersects=True)
    t_pref = time.time() - t0

    t0 = time.time()
    for _ in range(3):
        r2 = difference_all(geom, far_subs, check_intersects=False)
    t_blind = time.time() - t0

    from pygeoops_spark.geom.kernels import polygon_area

    assert polygon_area(r1) == pytest.approx(polygon_area(r2))
    assert t_blind > t_pref * 1.5, (t_pref, t_blind)


@pytest.mark.skipif(not RUNS_LOCAL, reason="timing test; set RUNS_LOCAL=1")
def test_union_first_beats_sequential_differences():
    # reference notes union-then-single-difference is significantly
    # faster than looping differences (_difference.py:167-168)
    n = 400
    ring = [(i, (i % 2) * 3) for i in range(n)] + [(n, -5), (0, -5)]
    geom = polygon(ring)
    subs = [box(8 * k, -2, 8 * k + 3, 1) for k in range(30)]

    t0 = time.time()
    u = polygon_union(subs)
    r_union = polygon_difference(geom, u)
    t_union_first = time.time() - t0

    t0 = time.time()
    r_seq = geom
    for s in subs:
        r_seq = polygon_difference(r_seq, s)
    t_seq = time.time() - t0

    from pygeoops_spark.geom.kernels import polygon_area

    assert polygon_area(r_union) == pytest.approx(polygon_area(r_seq), rel=1e-6)
    # sequential pays n full overlay passes; union-first pays one
    assert t_seq > t_union_first, (t_union_first, t_seq)
