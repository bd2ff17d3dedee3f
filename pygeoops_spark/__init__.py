"""pygeoops_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-realizes the semantics of the reference library pygeoops (see
/root/reference, studied behaviorally only) as vectorized numpy kernels
wrapped in Arrow-batched pandas UDFs over Spark DataFrames, plus a
brand-new quadkey cell-indexed spatial-join layer (point-in-polygon,
kNN, bbox join, raster<->vector tile assignment) that the reference
does not have.

Design rules (enforced throughout):
  * DataFrame/SQL first: everything relational stays in Catalyst
    (whole-stage codegen, AQE, broadcast joins, predicate pushdown).
  * No per-row Python UDFs anywhere. Geometry kernels are numpy over
    Arrow batches (pandas_udf / applyInPandas) only where built-in SQL
    functions genuinely cannot express the semantics.
  * Geometry is carried as WKB bytes in BinaryType columns; the codec
    is our own (no shapely/GEOS available nor wanted on executors).
"""

__version__ = "0.1.0"
