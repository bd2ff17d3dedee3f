"""Cell-indexed spatial-join layer (brand-new surface, no reference
counterpart — required by the engine north rule).

All candidate generation is pure Spark SQL (quadkey-style cell ids via
integer arithmetic — whole-stage codegen, no UDF); exact geometry
filters drop into vectorized pandas UDF kernels only for non-rectangular
polygons.
"""
