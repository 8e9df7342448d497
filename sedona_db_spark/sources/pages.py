"""Common-Crawl-style web-pages table: synthesis, extraction, geotagging.

This is the engine's primary input per the north rule: an Iceberg/parquet
table of pages ``(url: string, warc_ts: timestamp, html: binary,
text: string, lang: string)`` at 10^12-document design scale. Everything
here is deterministic — a pure function of (row id, seed) — so the table
can be re-synthesized at any scale, on any partitioning, and the
``text`` column is byte-identical per url no matter where it's computed
(the input_hint invariant, verified by tests/test_pages.py).

Scale design:
* synthesis runs as ``spark.range(n).mapInPandas`` — embarrassingly
  parallel, no shuffle, content keyed by global row id (NOT partition id),
  so 10^12 rows partition freely;
* extraction/geotagging are vectorized pandas UDFs (regex over Arrow
  batches, no per-row Python);
* geotags are Zipf-clustered around hotspot cities to reproduce the
  cell-level skew a real web corpus has (FIXTURES.md §1) — the salting /
  AQE-skew machinery in operators/spatial_join.py exists because of this;
* the table is range-partitioned by quadkey ``cell_id`` (tiling.Grid), so
  parquet min/max stats give spatial row-group pruning — the Spark
  analogue of the reference's GeoParquet bbox pruning
  (`rust/sedona-geoparquet/src/file_opener.rs:169-280` in /root/reference).
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..geometry import wkb
from ..tiling import Grid

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

LANGS = ["en", "de", "fr", "es", "pt", "zh", "hi", "ar"]

# 50 hotspot "cities" (synthetic but stable): Zipf-weighted geotag clusters
_CITY_RNG = np.random.default_rng(777)
CITY_LON = _CITY_RNG.uniform(-175.0, 175.0, 50)
CITY_LAT = _CITY_RNG.uniform(-60.0, 70.0, 50)
CITY_WEIGHT = 1.0 / np.arange(1, 51) ** 1.2  # Zipf s=1.2
CITY_WEIGHT /= CITY_WEIGHT.sum()
CITY_CDF = np.cumsum(CITY_WEIGHT)

_WORDS = (
    "the data web page spark join spatial index tile query scan filter "
    "cell point polygon distance nearest page city map layer zoom crawl "
    "archive record batch column row group parquet schema partition shuffle"
).split()


def _splitmix64(v: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    v = (v + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    v = ((v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    v = ((v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return v ^ (v >> np.uint64(31))


def _hashes(ids: np.ndarray, salt: int, seed: int) -> np.ndarray:
    return _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed * 0x100000001B3 + salt))


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _page_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    """Vectorized page synthesis for one batch of global row ids."""
    n = len(ids)
    urls = [f"https://site{int(i) % 1000}.example/page/{int(i)}" for i in ids]
    ts = pd.to_datetime("2025-01-01") + pd.to_timedelta(ids.astype(np.int64), unit="s")

    lang_idx = _hashes(ids, 1, seed) % np.uint64(len(LANGS))
    langs = [LANGS[int(i)] for i in lang_idx]

    has_geo = _u01(_hashes(ids, 2, seed)) < 0.60
    city = np.searchsorted(CITY_CDF, _u01(_hashes(ids, 3, seed)), side="left")
    city = np.clip(city, 0, 49)
    jlon = (_u01(_hashes(ids, 4, seed)) - 0.5) * 2.0  # ±1 degree jitter
    jlat = (_u01(_hashes(ids, 5, seed)) - 0.5) * 2.0
    lon = np.clip(CITY_LON[city] + jlon, -179.999, 179.999)
    lat = np.clip(CITY_LAT[city] + jlat, -89.999, 89.999)

    nwords = (8 + (_hashes(ids, 6, seed) % np.uint64(40))).astype(np.int64)
    htmls, texts = [], []
    for i in range(n):
        h = _hashes(np.full(int(nwords[i]), ids[i], dtype=np.uint64) + np.arange(nwords[i], dtype=np.uint64), 7, seed)
        words = [_WORDS[int(w % len(_WORDS))] for w in h]
        title = f"Page {int(ids[i])}"
        body = " ".join(words)
        geo = (
            f'<meta name="geo.position" content="{lat[i]:.6f};{lon[i]:.6f}">'
            if has_geo[i]
            else ""
        )
        html = (
            f"<html><head><title>{title}</title>{geo}</head>"
            f"<body><h1>{title}</h1><p>{body}</p></body></html>"
        )
        htmls.append(html.encode("utf-8"))
        # the canonical extraction of this html (see extract_text_bytes)
        texts.append(f"{title}\n{title}\n{body}")
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def synthesize_pages(spark: SparkSession, n: int, seed: int = 42,
                     partitions: Optional[int] = None) -> DataFrame:
    """Deterministic pages table of n rows (content keyed by global id)."""
    parts = partitions or max(1, min(256, n // 10_000 + 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.uint64)
            yield _page_batch(ids, seed)

    return spark.range(0, n, 1, parts).mapInPandas(gen, PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# extraction (the byte-identical invariant)
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(rb"<[^>]+>")
_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)
_BLOCK_SPLIT_RE = re.compile(rb"</(?:title|h1|p|div|li)>")
_GEO_RE = re.compile(rb'<meta name="geo.position" content="(-?[0-9.]+);(-?[0-9.]+)"')


def extract_text_bytes(html: bytes) -> bytes:
    """Canonical text extraction: block-split on closing tags, strip all
    tags, join non-empty blocks with newline. Pure bytes->bytes function —
    this exact implementation defines the per-url invariant."""
    blocks = _BLOCK_SPLIT_RE.split(html)
    out = []
    for blk in blocks:
        stripped = _TAG_RE.sub(b"", blk).strip()
        if stripped:
            out.append(stripped)
    return b"\n".join(out)


def extract_text_udf():
    @F.pandas_udf(StringType())
    def extract(html: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else extract_text_bytes(bytes(v)).decode("utf-8") for v in html],
            dtype=object,
        )

    return extract


def extract_geo_udf():
    """html -> (lat, lon) struct from the geo.position meta tag."""

    @F.pandas_udf(
        StructType([StructField("lat", DoubleType()), StructField("lon", DoubleType())])
    )
    def extract(html: pd.Series) -> pd.DataFrame:
        lats, lons = [], []
        for v in html:
            m = _GEO_RE.search(bytes(v)) if v is not None else None
            if m:
                lats.append(float(m.group(1)))
                lons.append(float(m.group(2)))
            else:
                lats.append(None)
                lons.append(None)
        return pd.DataFrame({"lat": lats, "lon": lons})

    return extract


def geotag_pages(pages: DataFrame, grid_level: int = 7,
                 cell_scheme: str = "quadkey") -> DataFrame:
    """pages -> + (lat, lon, geom WKB point, cell_id); geo-less rows keep
    NULLs (they simply don't participate in spatial joins).

    ``cell_scheme``: ``"quadkey"`` (tiling.Grid Z-order, the engine's join
    grid) or ``"s2"`` (true S2 Hilbert-curve cells, geometry/s2cell.py, at
    level ``grid_level``). Both are locality-preserving 64-bit keys, so
    ``partition_by_cell`` range partitioning and parquet min/max pruning
    work identically; S2 keeps cross-system compatibility (any external
    S2-indexed layer range-joins on the same ids) and its signed order
    never breaks a cell's [range_min, range_max] interval because a
    parent's leaf range never crosses a face boundary (the sign bit is
    face >= 4)."""
    if cell_scheme not in ("quadkey", "s2"):
        raise ValueError(f"cell_scheme must be 'quadkey' or 's2', got "
                         f"{cell_scheme!r}")
    grid = Grid(grid_level)
    df = pages.withColumn("_geo", extract_geo_udf()(F.col("html")))
    df = (
        df.withColumn("lat", F.col("_geo.lat"))
        .withColumn("lon", F.col("_geo.lon"))
        .drop("_geo")
    )

    @F.pandas_udf(BinaryType())
    def mkpoint(lon: pd.Series, lat: pd.Series) -> pd.Series:
        x = lon.to_numpy(dtype=np.float64, na_value=np.nan)
        y = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        bufs = wkb.encode_points_xy(np.nan_to_num(x), np.nan_to_num(y))
        out = pd.Series(list(bufs), dtype=object)
        out[np.isnan(x) | np.isnan(y)] = None
        return out

    @F.pandas_udf(LongType())
    def cellid(lon: pd.Series, lat: pd.Series) -> pd.Series:
        x = lon.to_numpy(dtype=np.float64, na_value=np.nan)
        y = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        if cell_scheme == "s2":
            from sedona_db_spark.geometry import s2cell

            cells = s2cell.cell_id_from_latlng(
                np.nan_to_num(y), np.nan_to_num(x), grid_level)
        else:
            cells = grid.cell_of_points(np.nan_to_num(x), np.nan_to_num(y))
        # nullable Int64, NOT None-into-int64 (which upcasts to float64 and
        # corrupts ids above 2^53)
        out = pd.Series(cells, dtype="Int64")
        out[np.isnan(x) | np.isnan(y)] = pd.NA
        return out

    return df.withColumn("geom", mkpoint(F.col("lon"), F.col("lat"))).withColumn(
        "cell_id", cellid(F.col("lon"), F.col("lat"))
    )


def partition_by_cell(df: DataFrame, num_partitions: int) -> DataFrame:
    """Range-partition by cell_id: Z-order ranges = spatial ranges, so
    parquet min/max stats on cell_id prune row groups spatially."""
    return df.repartitionByRange(num_partitions, F.col("cell_id"))


def is_table_identifier(dest: str) -> bool:
    """True when ``dest`` names a catalog table (``cat.db.tbl``), False when
    it is a filesystem path (contains ``/`` or a URI scheme like ``s3a:``)."""
    if "/" in dest or "\\" in dest:
        return False
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", dest):
        return False
    return bool(re.match(r"^[A-Za-z_][\w]*(\.[A-Za-z_][\w]*)*$", dest))


def write_pages_table(
    df: DataFrame,
    dest: str,
    num_partitions: int = 32,
    using: str = "parquet",
    partition_col: Optional[str] = "cell_prefix",
    prefix_shift: int = 8,
) -> None:
    """Materialize the cell-partitioned pages table.

    ``dest`` is either a filesystem path (written as a parquet directory) or
    a catalog table identifier (written through the DataSourceV2 ``writeTo``
    path — the exact plan an Iceberg catalog binds to when
    ``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog`` is
    configured with the iceberg-spark-runtime jar; pass ``using="iceberg"``
    there). Tests exercise the identical ``writeTo`` code path through the
    in-memory session catalog, so the plumbing is real even though the
    sandbox ships no Iceberg jar.

    Layout is the same in both modes: rows are range-partitioned by the full
    quadkey ``cell_id`` (parquet min/max stats ⇒ spatial row-group pruning),
    and the table is directory/identity-partitioned by the coarse
    ``cell_prefix`` (``cell_id >> prefix_shift``) so partition pruning kicks
    in before row-group pruning — the Iceberg analogue is an identity
    partition on the same derived column (or ``truncate(cell_id)``), never
    raw ``cell_id`` (10^12 docs at level 7 would mint millions of manifests).
    """
    out = partition_by_cell(df, num_partitions)
    if not is_table_identifier(dest):
        out.write.mode("overwrite").parquet(dest)
        return
    if partition_col == "cell_prefix" and "cell_prefix" not in out.columns:
        out = out.withColumn(
            "cell_prefix", F.shiftright(F.col("cell_id"), prefix_shift)
        )
    writer = out.writeTo(dest).using(using)
    if partition_col:
        writer = writer.partitionedBy(F.col(partition_col))
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {dest}")
    writer.create()


def read_pages_table(spark: SparkSession, source: str) -> DataFrame:
    """Read the pages table back from a parquet path or a catalog table
    identifier (Iceberg/DSv2 or session catalog — same call)."""
    if is_table_identifier(source):
        return spark.read.table(source)
    return spark.read.parquet(source)
