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


def test_geojson_seq_mixed_types_and_missing_properties(spark):
    """Mixed geometry types in one file (schema inference would mangle
    `coordinates`) and features without a properties object must both
    read back correctly."""
    import json as _json
    import tempfile as _tf

    from pygeoops_spark.geom.wkb import wkb_loads

    d = _tf.mkdtemp(prefix="geojson_mixed_")
    lines = [
        '{"type": "Feature", "properties": {"name": "pt"}, "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}}',
        '{"type": "Feature", "properties": {"name": "poly"}, "geometry": {"type": "Polygon", "coordinates": [[[0.0,0.0],[3.0,0.0],[3.0,3.0],[0.0,0.0]]]}}',
        '{"type": "Feature", "properties": {"name": "nullgeom"}, "geometry": null}',
    ]
    with open(f"{d}/part.json", "w") as f:
        f.write("\n".join(lines))
    from pygeoops_spark.sources.geojson import read_geojson_seq

    back = read_geojson_seq(spark, d)
    rows = {r["name"]: r["geometry_wkb"] for r in back.collect()}
    assert wkb_loads(bytes(rows["pt"])).geom_type == "POINT"
    assert wkb_loads(bytes(rows["poly"])).geom_type == "POLYGON"
    assert rows["nullgeom"] is None

    # no properties object at all -> geometry-only frame
    d2 = _tf.mkdtemp(prefix="geojson_noprops_")
    with open(f"{d2}/part.json", "w") as f:
        f.write('{"type": "Feature", "geometry": {"type": "Point", "coordinates": [5.0, 6.0]}}\n')
    back2 = read_geojson_seq(spark, d2)
    assert back2.columns == ["geometry_wkb"]
    g = wkb_loads(bytes(back2.first()["geometry_wkb"]))
    assert g.geom_type == "POINT"
