"""Partitioning policy for CPU-bound geometry stages.

AQE sizes exchanges by BYTES, so a shuffle carrying kilobytes of WKB
whose every row costs milliseconds of kernel CPU gets coalesced down to
one task — observed as a 10x serialization of the tiled-difference
union stage. An explicit partition count is the user-specified escape
hatch AQE respects, and when the keys match a downstream groupBy's
clustering Catalyst adds no extra exchange. See DESIGN_1T.md §3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def repartition_for_cpu(
    df: DataFrame, *keys: str | Column, factor: int = 2
) -> DataFrame:
    """Hash-repartition on `keys` with an explicit count of
    defaultParallelism * factor, immune to AQE size-based coalescing.
    Use before any grouped-map / pandas-UDF stage whose cost is CPU per
    row rather than bytes."""
    npart = df.sparkSession.sparkContext.defaultParallelism * factor
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.repartition(npart, *cols)
