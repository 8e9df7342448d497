"""Structured Streaming support: streaming geotag + windowed cell rollups.

The reference is a pure batch engine (SURVEY.md §1.1 — no streaming
operator exists in it), so nothing here is required for parity; this
module exists because the north-rule pipeline (a continuously-crawled
pages table) naturally ingests as a stream. Every transform in
sources/pages.py is stateless column/UDF logic, so it lifts onto
readStream unchanged; this module adds the stateful pieces:

* `geotag_stream` — the batch geotagger applied to a streaming frame;
* `windowed_cell_counts` — watermarked tumbling-window counts per quadkey
  cell (late data dropped past the watermark), the streaming analogue of
  the batch per-cell rollup;
* `stream_pages_from_dir` — file-source ingestion of a pages parquet
  directory (the Iceberg-table tail-read stand-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.pages import PAGES_SCHEMA, geotag_pages


def stream_pages_from_dir(spark: SparkSession, path: str,
                          max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def geotag_stream(pages_stream: DataFrame, grid_level: int = 7) -> DataFrame:
    """Stateless — identical logic to the batch path, applied per micro-batch."""
    return geotag_pages(pages_stream, grid_level=grid_level)


def windowed_cell_counts(
    tagged_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Tumbling-window page counts per cell with late-data handling.

    Output: (window struct, cell_id, n_pages, n_geotagged). Rows later than
    the watermark past their window close are dropped (state is bounded —
    the property that matters at 10^12 rows/day)."""
    return (
        tagged_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("cell_id"))
        .agg(
            F.count("*").alias("n_pages"),
            F.count("lat").alias("n_geotagged"),
        )
    )
