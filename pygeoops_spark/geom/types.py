"""Geometry type algebra — GeometryType / PrimitiveType enums.

Behavioral parity: /root/reference/pygeoops/_types.py (WKB-style ids,
Z +1000 / M +2000 / ZM +3000 variants, conversion properties, and the
primitive-type rule dimensions+1). These ids double as the plain
IntegerType codes the Spark layer carries in columns.
"""

from __future__ import annotations

import enum


class PrimitiveType(enum.Enum):
    GEOMETRY = 0
    POINT = 1
    LINESTRING = 2
    POLYGON = 3

    @property
    def dimensions(self) -> int:
        if self is PrimitiveType.GEOMETRY:
            raise ValueError("GEOMETRY has no dimensions")
        return self.value - 1

    def to_multitype_id(self) -> int:
        return {1: 4, 2: 5, 3: 6, 0: 7}[self.value]

    def to_singletype_id(self) -> int:
        return self.value if self.value else 7


class GeometryType(enum.Enum):
    GEOMETRY = 0
    POINT = 1
    LINESTRING = 2
    POLYGON = 3
    MULTIPOINT = 4
    MULTILINESTRING = 5
    MULTIPOLYGON = 6
    GEOMETRYCOLLECTION = 7
    POINTZ = 1001
    LINESTRINGZ = 1002
    POLYGONZ = 1003
    MULTIPOINTZ = 1004
    MULTILINESTRINGZ = 1005
    MULTIPOLYGONZ = 1006
    GEOMETRYCOLLECTIONZ = 1007
    POINTM = 2001
    LINESTRINGM = 2002
    POLYGONM = 2003
    MULTIPOINTM = 2004
    MULTILINESTRINGM = 2005
    MULTIPOLYGONM = 2006
    GEOMETRYCOLLECTIONM = 2007
    POINTZM = 3001
    LINESTRINGZM = 3002
    POLYGONZM = 3003
    MULTIPOINTZM = 3004
    MULTILINESTRINGZM = 3005
    MULTIPOLYGONZM = 3006
    GEOMETRYCOLLECTIONZM = 3007

    @classmethod
    def _missing_(cls, value):
        # accept case-insensitive names like the reference constructor
        if isinstance(value, str):
            name = value.upper()
            for m in cls:
                if m.name == name:
                    return m
        return None

    @property
    def base_id(self) -> int:
        return self.value % 1000

    @property
    def has_z(self) -> bool:
        return self.value // 1000 in (1, 3)

    @property
    def has_m(self) -> bool:
        return self.value // 1000 in (2, 3)

    @property
    def flatten(self) -> "GeometryType":
        return GeometryType(self.base_id)

    @property
    def is_multitype(self) -> bool:
        return self.base_id >= 4

    @property
    def to_multitype(self) -> "GeometryType":
        b = self.base_id
        m = b if b >= 4 else {1: 4, 2: 5, 3: 6, 0: 7}.get(b, 7)
        return GeometryType((self.value - b) + m)

    @property
    def to_singletype(self) -> "GeometryType":
        b = self.base_id
        s = b if b < 4 else {4: 1, 5: 2, 6: 3, 7: 0}[b]
        return GeometryType((self.value - b) + s)

    @property
    def to_primitivetype(self) -> PrimitiveType:
        b = self.base_id
        if b in (1, 4):
            return PrimitiveType.POINT
        if b in (2, 5):
            return PrimitiveType.LINESTRING
        if b in (3, 6):
            return PrimitiveType.POLYGON
        return PrimitiveType.GEOMETRY

    @property
    def name_camelcase(self) -> str:
        special = {
            "POINT": "Point",
            "LINESTRING": "LineString",
            "POLYGON": "Polygon",
            "MULTIPOINT": "MultiPoint",
            "MULTILINESTRING": "MultiLineString",
            "MULTIPOLYGON": "MultiPolygon",
            "GEOMETRYCOLLECTION": "GeometryCollection",
            "GEOMETRY": "Geometry",
        }
        base = special[self.flatten.name]
        suffix = {0: "", 1: "Z", 2: "M", 3: "ZM"}[self.value // 1000]
        return base + suffix


def format_short(geom, max_len: int = 80) -> str:
    """WKT preview with truncation (reference _general.py:287-337 uses
    this for error context)."""
    from pygeoops_spark.geom.wkb import wkt_dumps

    if geom is None:
        return "None"
    w = wkt_dumps(geom)
    if len(w) <= max_len:
        return w
    return w[: max_len - 3] + "..."
