"""GeoJSONSeq source/sink round-trip tests."""

import shutil
import tempfile

from pyspark.sql import functions as F


def test_geojson_kernel_roundtrip():
    from pygeoops_spark.geom import linestring, point, polygon
    from pygeoops_spark.geom.general import collect
    from pygeoops_spark.geom.wkb import get_coordinates
    from pygeoops_spark.sources.geojson import (
        geojson_to_geometry,
        geometry_to_geojson,
    )

    geoms = [
        point(1.5, -2.25),
        linestring([(0, 0), (1, 1), (2, 0)]),
        polygon([(0, 0), (4, 0), (4, 4), (0, 4)], [[(1, 1), (2, 1), (2, 2), (1, 2)]]),
        collect([point(0, 0), point(1, 1)]),
        collect([polygon([(0, 0), (1, 0), (1, 1)]), polygon([(5, 5), (6, 5), (6, 6)])]),
        collect([point(3, 3), linestring([(0, 0), (1, 0)])]),
    ]
    for g in geoms:
        j = geometry_to_geojson(g)
        back = geojson_to_geometry(j)
        assert back.geom_type == g.geom_type
        assert get_coordinates(back).tolist() == get_coordinates(g).tolist()


def test_geojson_seq_spark_roundtrip(spark):
    import pandas as pd

    from pygeoops_spark.geom import polygon, wkb_dumps
    from pygeoops_spark.geom.wkb import get_coordinates, wkb_loads
    from pygeoops_spark.sources.geojson import read_geojson_seq, write_geojson_seq

    rows = []
    for i in range(40):
        x0 = float(i * 10)
        rows.append(
            (i, f"zone{i}", wkb_dumps(polygon([(x0, 0), (x0 + 5, 0), (x0 + 5, 5), (x0, 5)])))
        )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["zid", "name", "geometry_wkb"]))
    path = tempfile.mkdtemp(prefix="geojson_") + "/out"
    try:
        write_geojson_seq(df, path)
        back = read_geojson_seq(spark, path)
        assert sorted(back.columns) == ["geometry_wkb", "name", "zid"]
        assert back.count() == 40
        joined = back.select("zid", F.col("geometry_wkb").alias("g2")).join(
            df.select("zid", "geometry_wkb"), "zid"
        )
        for r in joined.collect():
            a = get_coordinates(wkb_loads(bytes(r["geometry_wkb"]))).tolist()
            b = get_coordinates(wkb_loads(bytes(r["g2"]))).tolist()
            assert a == b
        # lines are valid single-line JSON features
        txt = spark.read.text(path)
        assert txt.count() == 40
        one = txt.first()["value"]
        import json as _json

        f = _json.loads(one)
        assert f["type"] == "Feature" and f["geometry"]["type"] == "Polygon"
    finally:
        shutil.rmtree(path, ignore_errors=True)
