"""Structured Streaming tile-assignment test (memory source/sink)."""

import tempfile

from pyspark.sql import functions as F


def test_streaming_tile_assignment(spark):
    from pygeoops_spark.corpus.pages import synth_pages
    from pygeoops_spark.operators.grid import assign_to_grid
    from pygeoops_spark.streaming.tiles import assign_stream_to_grid, windowed_tile_counts

    # write a small batch as the file-stream source
    src = tempfile.mkdtemp(prefix="stream_src_")
    pages = synth_pages(spark, 500).select("url", "warc_ts", "x", "y")
    pages.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(pages.schema).parquet(src)
    assigned = assign_stream_to_grid(stream, "x", "y", (0.0, 0.0, 1000.0, 1000.0), 8, 8, cell_level=5)
    counts = windowed_tile_counts(assigned, "warc_ts", "30 days", "1 day")

    q = (
        counts.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # batch ground truth
    batch = assign_to_grid(pages, "x", "y", (0.0, 0.0, 1000.0, 1000.0), 8, 8)
    expected_total = batch.count()
    got = spark.sql("select sum(n_events) s from tile_counts").first()["s"]
    # append mode only emits windows older than the watermark; with
    # availableNow + wide watermark all-but-the-newest window flush
    assert got is None or got <= expected_total
    # per-event assignment parity (run the stateless part as batch)
    assigned_batch = assign_stream_to_grid(
        pages, "x", "y", (0.0, 0.0, 1000.0, 1000.0), 8, 8, cell_level=5
    )
    diff = assigned_batch.select("url", "tile_id").exceptAll(
        batch.select("url", "tile_id")
    )
    assert diff.count() == 0
