"""GeoParquet read/write: the `geo` footer-metadata convention.

Mirrors the reference's GeoParquet layer (in /root/reference:
`rust/sedona-geoparquet/src/metadata.rs:283-308` — the `geo` JSON key with
version / primary_column / per-column encoding + bbox;
`writer.rs:60-210` — v1.1 auto-projects a `bbox` struct column per
geometry column; `file_opener.rs:169-280` — bbox-driven pruning).

Spark-side design:
* data is written by ordinary `df.write.parquet` (distributed, scalable);
  the v1.1 `bbox` struct column is projected BEFORE the write, so parquet
  min/max column stats on bbox.xmin/... give row-group pruning through the
  stock Spark reader — pruning needs NO custom reader;
* the `geo` footer key is stamped onto each part file afterwards with
  pyarrow (footer-only rewrite of the metadata blob). At 100 TB the stamp
  step is a metadata-only pass per file, parallelizable; interop targets
  (GeoPandas, DuckDB-spatial, the reference) all read the key.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.aggregates import bounds_struct
from ..types import DEFAULT_CRS, with_geom_meta

GEO_KEY = b"geo"
VERSION = "1.1.0"


def _geo_metadata(geom_cols: List[str], bboxes: Dict[str, List[float]],
                  crs: Optional[str], primary: str) -> dict:
    cols = {}
    for c in geom_cols:
        entry = {
            "encoding": "WKB",
            "geometry_types": [],  # unconstrained (mixed), like the reference default
        }
        if c in bboxes:
            entry["bbox"] = bboxes[c]
        if crs:
            entry["crs"] = crs
        entry["covering"] = {
            "bbox": {
                "xmin": [f"{c}_bbox", "xmin"],
                "ymin": [f"{c}_bbox", "ymin"],
                "xmax": [f"{c}_bbox", "xmax"],
                "ymax": [f"{c}_bbox", "ymax"],
            }
        }
        cols[c] = entry
    return {"version": VERSION, "primary_column": primary, "columns": cols}


def write_geoparquet(
    df: DataFrame,
    path: str,
    geom_cols: Optional[List[str]] = None,
    crs: Optional[str] = DEFAULT_CRS,
    version: str = "1.1",
) -> dict:
    """Write df as GeoParquet. v1.1 projects a `<geom>_bbox` struct per
    geometry column (the reference refuses null CRS — we default CRS84).
    Returns the `geo` metadata dict that was stamped."""
    geom_cols = geom_cols or ["geometry"]
    if crs is None:
        raise ValueError("GeoParquet requires a CRS (reference writer.rs refuses null CRS)")
    out = df
    if version.startswith("1.1"):
        for c in geom_cols:
            out = out.withColumn(f"{c}_bbox", bounds_struct(F.col(c)))
    out.write.mode("overwrite").parquet(path)

    # column-level bbox from the written data (one pass over stats columns)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    bboxes = {}
    for c in geom_cols:
        if f"{c}_bbox" in written.columns:
            r = written.agg(
                F.min(f"{c}_bbox.xmin"), F.min(f"{c}_bbox.ymin"),
                F.max(f"{c}_bbox.xmax"), F.max(f"{c}_bbox.ymax"),
            ).collect()[0]
            if r[0] is not None:
                bboxes[c] = [float(v) for v in r]
    meta = _geo_metadata(geom_cols, bboxes, crs, geom_cols[0])
    _stamp_geo_key(path, meta)
    return meta


def _stamp_geo_key(path: str, meta: dict) -> None:
    """Add the `geo` key to every part file's footer key-value metadata."""
    blob = json.dumps(meta).encode("utf-8")
    for part in glob.glob(os.path.join(path, "*.parquet")):
        t = pq.read_table(part)
        existing = t.schema.metadata or {}
        t = t.replace_schema_metadata({**existing, GEO_KEY: blob})
        pq.write_table(t, part)
        # the rewrite invalidates Hadoop's checksum sidecar
        crc = os.path.join(os.path.dirname(part), f".{os.path.basename(part)}.crc")
        if os.path.exists(crc):
            os.remove(crc)


def read_geo_metadata(path: str) -> Optional[dict]:
    parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not parts:
        return None
    md = pq.ParquetFile(parts[0]).schema_arrow.metadata or {}
    if GEO_KEY not in md:
        return None
    return json.loads(md[GEO_KEY])


def read_geoparquet(spark: SparkSession, path: str) -> DataFrame:
    """Read GeoParquet: plain parquet scan + re-attach geometry column
    metadata from the `geo` footer key (the Spark analogue of the
    reference's schema re-tagging, format.rs:63-149)."""
    df = spark.read.parquet(path)
    meta = read_geo_metadata(path)
    if meta:
        for c, entry in meta.get("columns", {}).items():
            if c in df.columns:
                df = with_geom_meta(df, c, crs=entry.get("crs", DEFAULT_CRS))
    return df


def filter_bbox(df: DataFrame, geom_col: str, xmin: float, ymin: float,
                xmax: float, ymax: float) -> DataFrame:
    """Bbox predicate against the covering columns — pushes down to parquet
    row-group stats (the stock-reader equivalent of the reference's
    row-group pruning, file_opener.rs:191-280)."""
    b = f"{geom_col}_bbox"
    return df.where(
        (F.col(f"{b}.xmin") <= xmax)
        & (F.col(f"{b}.xmax") >= xmin)
        & (F.col(f"{b}.ymin") <= ymax)
        & (F.col(f"{b}.ymax") >= ymin)
    )
