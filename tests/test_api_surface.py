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


def test_unknown_name_raises():
    try:
        pygeoops_spark.not_a_real_name
    except AttributeError as e:
        assert "not_a_real_name" in str(e)
    else:
        raise AssertionError("expected AttributeError")
