"""GeometryType/PrimitiveType algebra tests — reference
pygeoops/_types.py semantics (ids, variants, conversions)."""

import pytest

from pygeoops_spark.geom.types import GeometryType, PrimitiveType, format_short


def test_ids():
    assert GeometryType.POINT.value == 1
    assert GeometryType.GEOMETRYCOLLECTION.value == 7
    assert GeometryType.POINTZ.value == 1001
    assert GeometryType.POINTM.value == 2001
    assert GeometryType.POINTZM.value == 3001


def test_constructor_from_string():
    assert GeometryType("point") is GeometryType.POINT
    assert GeometryType("MultiPolygon") is GeometryType.MULTIPOLYGON
    assert GeometryType(5) is GeometryType.MULTILINESTRING


def test_flags_and_flatten():
    assert GeometryType.POINTZ.has_z and not GeometryType.POINTZ.has_m
    assert GeometryType.POINTM.has_m and not GeometryType.POINTM.has_z
    assert GeometryType.POINTZM.has_z and GeometryType.POINTZM.has_m
    assert GeometryType.MULTIPOLYGONZ.flatten is GeometryType.MULTIPOLYGON


def test_multitype_conversions():
    assert GeometryType.POINT.to_multitype is GeometryType.MULTIPOINT
    assert GeometryType.MULTIPOINT.to_multitype is GeometryType.MULTIPOINT
    assert GeometryType.MULTIPOLYGON.to_singletype is GeometryType.POLYGON
    assert GeometryType.LINESTRINGZ.to_multitype is GeometryType.MULTILINESTRINGZ
    assert not GeometryType.POLYGON.is_multitype
    assert GeometryType.MULTIPOLYGON.is_multitype


def test_primitivetype():
    assert GeometryType.MULTIPOLYGON.to_primitivetype is PrimitiveType.POLYGON
    assert GeometryType.GEOMETRYCOLLECTION.to_primitivetype is PrimitiveType.GEOMETRY
    assert PrimitiveType.POLYGON.dimensions == 2
    assert PrimitiveType.POINT.dimensions == 0
    with pytest.raises(ValueError):
        _ = PrimitiveType.GEOMETRY.dimensions


def test_name_camelcase():
    assert GeometryType.MULTILINESTRING.name_camelcase == "MultiLineString"
    assert GeometryType.POINTZM.name_camelcase == "PointZM"


def test_format_short():
    from pygeoops_spark.geom import polygon

    p = polygon([(0, 0), (1, 0), (1, 1)])
    assert format_short(p).startswith("POLYGON")
    assert format_short(None) == "None"
    big = polygon([(i, i % 7) for i in range(100)])
    assert len(format_short(big)) <= 80
    assert format_short(big).endswith("...")
