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
    # the reference's 24 public callables / classes and our mapping:
    # same-name kernels plus documented renames (explode->get_parts,
    # simplify_coords*->simplify_coords_idx, keep_geom_type2primitivetype_id
    # is internal parameter validation surfaced via keep_geom_type args)
    same_name = [
        "buffer_by_m", "centerline", "difference_all", "difference_all_tiled",
        "extend_line_by_distance", "extend_line_to_geometry", "collect",
        "collection_extract", "empty", "format_short", "get_parts_recursive",
        "get_primitivetype_id", "make_valid", "remove_inner_rings",
        "subdivide", "create_grid", "create_grid3", "create_grid2",
        "split_tiles", "simplify", "simplify_topo", "view_angles",
    ]
    for name in same_name:
        assert callable(getattr(pygeoops_spark, name)), name


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
