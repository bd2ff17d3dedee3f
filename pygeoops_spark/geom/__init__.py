"""Pure-numpy geometry kernel library (no Spark, no GEOS).

Everything here operates on plain numpy coordinate arrays and a tiny
tagged geometry representation (see :mod:`.wkb`). The Spark layer wraps
these kernels in Arrow-batched pandas UDFs.
"""

from pygeoops_spark.geom.wkb import (  # noqa: F401
    Geometry,
    point,
    linestring,
    polygon,
    multi,
    collection,
    wkb_dumps,
    wkb_loads,
    wkt_dumps,
    wkt_loads,
)
