"""Structured Streaming geotag + windowed rollup tests (memory sink,
processAllAvailable for determinism)."""

from pyspark.sql import functions as F

from sedona_db_spark.sources import pages as P
from sedona_db_spark.streaming import geostream as GS


def test_stream_geotag_and_window(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    P.synthesize_pages(spark, 1500, partitions=5).write.mode("overwrite").parquet(src)

    stream = GS.stream_pages_from_dir(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming
    tagged = GS.geotag_stream(stream, grid_level=5)
    counts = GS.windowed_cell_counts(tagged, "1 hour", "2 hours")

    q = (
        counts.writeStream.format("memory")
        .queryName("cell_counts")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT sum(n_pages) AS total, sum(n_geotagged) AS geo, "
            "count(DISTINCT cell_id) AS cells FROM cell_counts"
        ).collect()[0]
    finally:
        q.stop()

    # batch ground truth
    batch = P.geotag_pages(spark.read.parquet(src), grid_level=5)
    want_total = batch.count()
    want_geo = batch.where(F.col("lat").isNotNull()).count()
    want_cells = batch.select("cell_id").distinct().count()  # incl. null row

    # streaming update-mode may emit a key several times across batches;
    # the memory sink keeps every update, so compare against the LAST
    # update per (window, cell) instead of raw sums
    last = spark.sql(
        "SELECT window, cell_id, max(n_pages) AS n_pages, max(n_geotagged) AS g "
        "FROM cell_counts GROUP BY window, cell_id"
    )
    got_total = last.agg(F.sum("n_pages")).collect()[0][0]
    got_geo = last.agg(F.sum("g")).collect()[0][0]
    assert got_total == want_total
    assert got_geo == want_geo
    got_cells = last.select("cell_id").distinct().count()
    assert got_cells == want_cells
