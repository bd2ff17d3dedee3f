"""Top-level API surface: every name in pygeoops_spark._EXPORTS resolves
(lazy PEP 562 re-exports), and the reference's public API names all have
a top-level counterpart here (reference pygeoops/__init__.py:5-13)."""

import pygeoops_spark


def test_all_exports_resolve():
    for name in pygeoops_spark._EXPORTS:
        obj = getattr(pygeoops_spark, name)
        assert callable(obj), name


def test_dir_lists_exports():
    d = dir(pygeoops_spark)
    assert "centerline" in d and "pip_join_rects" in d


def test_reference_public_names_covered():
    # EVERY public (non-underscore) def/class across the reference's
    # modules resolves at our top level under the same name — the full
    # 31-name surface, not just the __init__ star-exports
    reference_public = [
        "GeometryType", "PrimitiveType", "buffer_by_m", "centerline",
        "collect", "collection_extract", "create_grid", "create_grid2",
        "create_grid3", "difference_all", "difference_all_tiled", "empty",
        "explode", "extend_line_by_distance", "extend_line_to_geometry",
        "format_short", "get_parts_recursive", "get_primitivetype_id",
        "keep_geom_type2primitivetype_id", "make_valid",
        "remove_inner_rings", "simplify", "simplify_coords",
        "simplify_coords_lang", "simplify_coords_lang_idx",
        "simplify_linestring", "simplify_polygon", "simplify_topo",
        "split_tiles", "subdivide", "view_angles",
    ]
    for name in reference_public:
        assert callable(getattr(pygeoops_spark, name)), name


def test_reference_parity_adapters_behave():
    import numpy as np

    # simplify_coords_lang: list in -> list out; collinear interior
    # points beyond the tolerance window are kept per standard lang
    coords = [[0.0, 0.0], [1.0, 0.1], [2.0, -0.1], [3.0, 0.0]]
    out = pygeoops_spark.simplify_coords_lang(coords, 0.5, lookahead=3)
    assert isinstance(out, list) and out[0] == [0.0, 0.0] and out[-1] == [3.0, 0.0]
    idx = pygeoops_spark.simplify_coords_lang_idx(coords, 0.5, lookahead=3)
    assert list(idx[:1]) == [0] and idx[-1] == 3

    # simplify_coords: kept coords through the algorithm dispatch
    arr = np.array([[0.0, 0.0], [1.0, 0.01], [2.0, 0.0]])
    kept = pygeoops_spark.simplify_coords(arr, 0.5, algorithm="rdp")
    assert kept.shape == (2, 2)

    # simplify_linestring / simplify_polygon route to the ring-wise
    # geometry path
    from pygeoops_spark.geom.wkb import wkt_dumps, wkt_loads

    ls = wkt_loads("LINESTRING (0 0, 1 0.01, 2 0)")
    s = pygeoops_spark.simplify_linestring(ls, 0.5, algorithm="rdp")
    assert wkt_dumps(s) == "LINESTRING (0 0, 2 0)"
    poly = wkt_loads("POLYGON ((0 0, 5 0.01, 10 0, 10 10, 0 10, 0 0))")
    sp = pygeoops_spark.simplify_polygon(poly, 0.5, algorithm="rdp")
    assert sp is not None and len(sp.data[0]) == 5

    # keep_geom_type2primitivetype_id: reference value table
    assert pygeoops_spark.keep_geom_type2primitivetype_id(False, poly) == 0
    assert pygeoops_spark.keep_geom_type2primitivetype_id(True, poly) == 3
    assert pygeoops_spark.keep_geom_type2primitivetype_id(2, poly) == 2
    try:
        pygeoops_spark.keep_geom_type2primitivetype_id(7, poly)
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")


def test_type_enums_and_explode_top_level():
    # reference namespace parity for the remaining names: the type
    # enums (_types.py star-export) and the deprecated explode
    from pygeoops_spark.geom.types import GeometryType, PrimitiveType
    from pygeoops_spark.geom.wkb import wkt_loads

    assert pygeoops_spark.GeometryType is GeometryType
    assert pygeoops_spark.PrimitiveType is PrimitiveType

    import warnings

    g = wkt_loads("MULTIPOINT (0 0, 1 1)")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        parts = pygeoops_spark.explode(g)
        assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert len(parts) == 2
    assert pygeoops_spark.explode(None) is None


def test_unknown_name_raises():
    try:
        pygeoops_spark.not_a_real_name
    except AttributeError as e:
        assert "not_a_real_name" in str(e)
    else:
        raise AssertionError("expected AttributeError")


def test_simplify_coords_lang_reference_goldens():
    """Ported from the reference suite (tests/test_simplify_lang.py:12,
    43, 65): the lang+ lookahead-point removal golden (the 4th point
    (30,30) is collinear but unremovable under standard lang with
    lookahead=3) and container-type preservation."""
    import numpy as np

    zig = [(0, 0), (10, 10), (20, 20), (30, 30), (40, 40), (50, 30), (60, 20), (70, 10)]
    out = pygeoops_spark.simplify_coords_lang(
        zig, 1, lookahead=3, simplify_lookahead_points=True
    )
    assert len(out) == 3
    assert out[0] == [0.0, 0.0] and out[-1] == [70.0, 10.0]

    col = [(0, 0), (10, 10), (20, 20), (30, 30), (40, 40)]
    out_list = pygeoops_spark.simplify_coords_lang(col, 1)
    assert isinstance(out_list, list) and len(out_list) == 2
    out_arr = pygeoops_spark.simplify_coords_lang(np.asarray(col, dtype=float), 1)
    assert isinstance(out_arr, np.ndarray) and len(out_arr) == 2
    idx = pygeoops_spark.simplify_coords_lang_idx(col, 1)
    assert list(idx) == [0, 4]
