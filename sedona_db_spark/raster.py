"""Raster column model + RS_* functions + raster→vector zonal overlay.

Mirrors the reference's Arrow raster schema
(`rust/sedona-schema/src/raster.rs:25-107` in /root/reference): a struct of
  metadata: {width, height, upperleft_x, upperleft_y,
             scale_x, scale_y, skew_x, skew_y}
  crs:      string (PROJJSON / authority code)
  bands:    list of {metadata: {nodata, storage_type, datatype,
                                outdb_url, outdb_band_id}, data: binary}
with band pixel data as a binary blob (row-major), and the
`BandDataType` enumeration (raster.rs:96-107). Spark has no unsigned
integer types, so width/height are LongType and the enum codes IntegerType
(documented deviation — value ranges are identical in practice).

The reference registers one raster accessor (`rs_width`,
`rust/sedona-raster-functions/src/register.rs:39`); this module covers it
plus the natural siblings (height/corner/scale/band count/nodata/value-at)
and the raster↔vector zonal path SURVEY.md §1.4 promises: explode tiles to
pixel-center points (vectorized numpy per tile inside mapInPandas), then
reuse the two-phase spatial join + groupBy for zonal statistics.

Scale shape: one raster row is one tile (the Arrow-native layout); tile
explode is map-side only (no shuffle), the zonal join shuffles pixel rows
once on the grid cell — the same plan as any point-in-polygon join, which
is exactly how a 100 TB tile archive wants to run.
"""

from __future__ import annotations

import math
import struct as _struct
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- BandDataType (raster.rs:96-107) ----------------------------------------
BAND_UINT8, BAND_UINT16, BAND_INT16, BAND_UINT32, BAND_INT32, BAND_FLOAT32, BAND_FLOAT64 = range(7)
_BAND_NP = {
    BAND_UINT8: np.uint8, BAND_UINT16: np.uint16, BAND_INT16: np.int16,
    BAND_UINT32: np.uint32, BAND_INT32: np.int32,
    BAND_FLOAT32: np.float32, BAND_FLOAT64: np.float64,
}
STORAGE_IN_DB = 0  # raster.rs StorageType::InDb
STORAGE_OUTDB_REF = 1

BAND_METADATA_TYPE = StructType([
    StructField("nodata", BinaryType(), True),
    StructField("storage_type", IntegerType(), False),
    StructField("datatype", IntegerType(), False),
    StructField("outdb_url", StringType(), True),
    StructField("outdb_band_id", IntegerType(), True),
])

RASTER_METADATA_TYPE = StructType([
    StructField("width", LongType(), False),
    StructField("height", LongType(), False),
    StructField("upperleft_x", DoubleType(), False),
    StructField("upperleft_y", DoubleType(), False),
    StructField("scale_x", DoubleType(), False),
    StructField("scale_y", DoubleType(), False),
    StructField("skew_x", DoubleType(), False),
    StructField("skew_y", DoubleType(), False),
])

RASTER_TYPE = StructType([
    StructField("metadata", RASTER_METADATA_TYPE, False),
    StructField("crs", StringType(), True),
    StructField("bands", ArrayType(StructType([
        StructField("metadata", BAND_METADATA_TYPE, False),
        StructField("data", BinaryType(), False),
    ])), True),
])


def band_to_bytes(arr: np.ndarray, datatype: int = BAND_FLOAT64) -> bytes:
    """Row-major pixel block -> the band `data` blob (InDb storage)."""
    return np.ascontiguousarray(arr, dtype=_BAND_NP[datatype]).tobytes()


def bytes_to_band(buf: bytes, width: int, height: int, datatype: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=_BAND_NP[datatype], count=width * height).reshape(height, width)


def make_raster_row(width: int, height: int, ulx: float, uly: float,
                    scale_x: float, scale_y: float, bands: List[np.ndarray],
                    crs: str = "OGC:CRS84", datatype: int = BAND_FLOAT64,
                    nodata: Optional[float] = None):
    """Python-side constructor for one raster struct value (tests/synthesis).
    scale_y is negative for north-up rasters, like GDAL geotransforms."""
    nd = None if nodata is None else _struct.pack("<d", float(nodata))
    return {
        "metadata": {
            "width": width, "height": height,
            "upperleft_x": ulx, "upperleft_y": uly,
            "scale_x": scale_x, "scale_y": scale_y,
            "skew_x": 0.0, "skew_y": 0.0,
        },
        "crs": crs,
        "bands": [
            {
                "metadata": {"nodata": nd, "storage_type": STORAGE_IN_DB,
                             "datatype": datatype, "outdb_url": None,
                             "outdb_band_id": None},
                "data": band_to_bytes(b, datatype),
            }
            for b in bands
        ],
    }


# --- accessors ----------------------------------------------------------------
# Metadata accessors are PURE COLUMN field reads — whole-stage codegen, no
# Python (the reference's rs_width kernel reads the same struct slot,
# rust/sedona-raster-functions/src/rs_size.rs:53-96).

def RS_Width(r) -> F.Column:
    return F.col(f"{r}.metadata.width") if isinstance(r, str) else r["metadata"]["width"]


def RS_Height(r) -> F.Column:
    return F.col(f"{r}.metadata.height") if isinstance(r, str) else r["metadata"]["height"]


def RS_UpperLeftX(r) -> F.Column:
    return F.col(f"{r}.metadata.upperleft_x") if isinstance(r, str) else r["metadata"]["upperleft_x"]


def RS_UpperLeftY(r) -> F.Column:
    return F.col(f"{r}.metadata.upperleft_y") if isinstance(r, str) else r["metadata"]["upperleft_y"]


def RS_ScaleX(r) -> F.Column:
    return F.col(f"{r}.metadata.scale_x") if isinstance(r, str) else r["metadata"]["scale_x"]


def RS_ScaleY(r) -> F.Column:
    return F.col(f"{r}.metadata.scale_y") if isinstance(r, str) else r["metadata"]["scale_y"]


def RS_NumBands(r) -> F.Column:
    c = F.col(f"{r}.bands") if isinstance(r, str) else r["bands"]
    return F.coalesce(F.size(c), F.lit(0))


def RS_CRS(r) -> F.Column:
    return F.col(f"{r}.crs") if isinstance(r, str) else r["crs"]


def RS_BandNoDataValue(raster_col: str, band: int = 1) -> F.Column:
    """Decode the little-endian f8 nodata blob of band `band` (1-based)."""
    nd = F.element_at(F.col(f"{raster_col}.bands"), band)["metadata"]["nodata"]

    @F.pandas_udf(DoubleType())
    def dec(b: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else _struct.unpack("<d", bytes(v))[0] for v in b],
            dtype="float64",
        )

    return dec(nd)


def RS_Value(raster_col: str, col_idx, row_idx, band: int = 1) -> F.Column:
    """Pixel value at (col, row), 0-based, from band `band` (1-based)."""
    meta = F.col(f"{raster_col}.metadata")
    bd = F.element_at(F.col(f"{raster_col}.bands"), band)

    @F.pandas_udf(DoubleType())
    def val(data: pd.Series, dtype_code: pd.Series, w: pd.Series, h: pd.Series,
            ci: pd.Series, ri: pd.Series) -> pd.Series:
        out = []
        for buf, dc, ww, hh, c, r in zip(data, dtype_code, w, h, ci, ri):
            if buf is None or c is None or r is None or not (0 <= c < ww and 0 <= r < hh):
                out.append(None)
                continue
            arr = bytes_to_band(bytes(buf), int(ww), int(hh), int(dc))
            out.append(float(arr[int(r), int(c)]))
        return pd.Series(out, dtype="float64")

    return val(bd["data"], bd["metadata"]["datatype"], meta["width"], meta["height"],
               F.lit(col_idx) if isinstance(col_idx, int) else col_idx,
               F.lit(row_idx) if isinstance(row_idx, int) else row_idx)


def RS_MapAlgebra(raster_col: str, fn, bands: tuple = (1,)) -> F.Column:
    """Per-pixel band math: ``fn(*band_arrays) -> array`` (numpy,
    float64), returned as a new little-endian f8 band-data blob of the
    same width×height. The whole tile's pixels go through ONE vectorized
    numpy call per row — no per-pixel Python — and the result composes
    with :func:`RS_BandStats` or ``make_raster_row`` re-assembly.

    Mirrors Sedona's RS_MapAlgebra intent with a Python callable instead
    of a jiffle script (no JVM scripting engine here); NULL rasters map
    to NULL."""
    meta = F.col(f"{raster_col}.metadata")
    band_cols = [F.element_at(F.col(f"{raster_col}.bands"), b) for b in bands]

    @F.pandas_udf(BinaryType())
    def alg(w: pd.Series, h: pd.Series, *flat: pd.Series) -> pd.Series:
        n_b = len(flat) // 2
        datas, dcodes = flat[:n_b], flat[n_b:]
        out = []
        for i in range(len(w)):
            if any(datas[b].iloc[i] is None for b in range(n_b)):
                out.append(None)
                continue
            ww, hh = int(w.iloc[i]), int(h.iloc[i])
            arrs = [
                bytes_to_band(bytes(datas[b].iloc[i]), ww, hh,
                              int(dcodes[b].iloc[i])).astype(np.float64)
                for b in range(n_b)
            ]
            res = np.asarray(fn(*arrs), dtype=np.float64)
            if res.shape != (hh, ww):
                raise ValueError(
                    f"map-algebra fn returned shape {res.shape}, "
                    f"expected {(hh, ww)}")
            out.append(band_to_bytes(res, BAND_FLOAT64))
        return pd.Series(out, dtype=object)

    return alg(meta["width"], meta["height"],
               *[b["data"] for b in band_cols],
               *[b["metadata"]["datatype"] for b in band_cols])


_BAND_STATS_T = StructType([
    StructField("vmin", DoubleType()),
    StructField("vmax", DoubleType()),
    StructField("vsum", DoubleType()),
    StructField("vmean", DoubleType()),
    StructField("cnt", LongType()),
])


def RS_BandStats(raster_col: str, band: int = 1,
                 data_col=None) -> F.Column:
    """Per-tile band summary struct (min/max/sum/mean/count), skipping
    nodata pixels. Pass ``data_col`` to summarize a map-algebra output
    blob instead of a stored band (nodata then not applied)."""
    meta = F.col(f"{raster_col}.metadata")
    bd = F.element_at(F.col(f"{raster_col}.bands"), band)
    data = bd["data"] if data_col is None else (
        F.col(data_col) if isinstance(data_col, str) else data_col)
    dcode = bd["metadata"]["datatype"] if data_col is None else F.lit(BAND_FLOAT64)
    nd = bd["metadata"]["nodata"] if data_col is None else F.lit(None).cast(BinaryType())

    @F.pandas_udf(_BAND_STATS_T)
    def stats(data: pd.Series, dc: pd.Series, w: pd.Series, h: pd.Series,
              ndb: pd.Series) -> pd.DataFrame:
        rows = []
        for buf, c, ww, hh, ndv in zip(data, dc, w, h, ndb):
            if buf is None:
                rows.append({"vmin": None, "vmax": None, "vsum": None,
                             "vmean": None, "cnt": None})
                continue
            # stats are shape-free: decode the blob FLAT by its dtype, so
            # map-algebra/resample outputs (any length) summarize too
            v = np.frombuffer(
                bytes(buf), dtype=np.dtype(_BAND_NP[int(c)]).newbyteorder("<")
            ).astype(np.float64)
            if ndv is not None:
                v = v[v != _struct.unpack("<d", bytes(ndv))[0]]
            if len(v) == 0:
                rows.append({"vmin": None, "vmax": None, "vsum": 0.0,
                             "vmean": None, "cnt": 0})
                continue
            s = float(v.sum())
            rows.append({"vmin": float(v.min()), "vmax": float(v.max()),
                         "vsum": s, "vmean": s / len(v), "cnt": len(v)})
        return pd.DataFrame(rows)

    return stats(data, dcode, meta["width"], meta["height"], nd)


def RS_Resample(raster_col: str, factor: int, band: int = 1) -> F.Column:
    """Block-mean downsample of band ``band`` by an integer ``factor``
    (width and height must divide evenly; raises otherwise — silent
    edge-cropping would change zonal answers). Returns the new band blob
    (little-endian f8, (h/factor) x (w/factor)); one reshape-mean numpy
    call per tile. Compose with :func:`RS_BandStats`(data_col=...) or
    re-assemble a raster with scale_x/scale_y multiplied by ``factor``.
    The standard pyramid/overview builder (GDAL 'average')."""
    if not 1 <= int(factor) <= 4096:
        raise ValueError(f"factor must be in [1, 4096], got {factor}")
    f = int(factor)
    meta = F.col(f"{raster_col}.metadata")
    bd = F.element_at(F.col(f"{raster_col}.bands"), band)

    @F.pandas_udf(BinaryType())
    def rs(data: pd.Series, dc: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        out = []
        for buf, c, ww, hh in zip(data, dc, w, h):
            if buf is None:
                out.append(None)
                continue
            ww, hh = int(ww), int(hh)
            if ww % f or hh % f:
                raise ValueError(
                    f"RS_Resample factor {f} does not divide {ww}x{hh}")
            arr = bytes_to_band(bytes(buf), ww, hh, int(c)).astype(np.float64)
            blk = arr.reshape(hh // f, f, ww // f, f).mean(axis=(1, 3))
            out.append(band_to_bytes(blk, BAND_FLOAT64))
        return pd.Series(out, dtype=object)

    return rs(bd["data"], bd["metadata"]["datatype"], meta["width"], meta["height"])


# --- raster -> vector ---------------------------------------------------------


def raster_to_points(df: DataFrame, raster_col: str = "raster", band: int = 1,
                     keep_cols: Optional[List[str]] = None,
                     drop_nodata: bool = True) -> DataFrame:
    """Explode each raster tile into pixel-center point rows
    (x, y, value) — the raster side of the zonal overlay. Vectorized numpy
    per tile; map-side only (no shuffle)."""
    keep_cols = keep_cols or [c for c in df.columns if c != raster_col]
    in_schema = df.schema
    out_fields = [in_schema[c] for c in keep_cols] + [
        StructField("px_x", DoubleType()),
        StructField("px_y", DoubleType()),
        StructField("value", DoubleType()),
    ]
    out_schema = StructType(out_fields)
    ridx = raster_col

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            frames = []
            for _, row in pdf.iterrows():
                r = row[ridx]
                if r is None:
                    continue
                md = r["metadata"]
                w, h = int(md["width"]), int(md["height"])
                bands = r["bands"]
                if bands is None or len(bands) < band:
                    continue
                b = bands[band - 1]
                arr = bytes_to_band(bytes(b["data"]), w, h, int(b["metadata"]["datatype"])).astype(np.float64)
                ci, rI = np.meshgrid(np.arange(w), np.arange(h))
                # affine geotransform incl. skew (raster.rs metadata fields)
                xs = md["upperleft_x"] + (ci + 0.5) * md["scale_x"] + (rI + 0.5) * md["skew_x"]
                ys = md["upperleft_y"] + (ci + 0.5) * md["skew_y"] + (rI + 0.5) * md["scale_y"]
                vals = arr.ravel()
                mask = np.ones(len(vals), dtype=bool)
                nd = b["metadata"]["nodata"]
                if drop_nodata and nd is not None:
                    mask = vals != _struct.unpack("<d", bytes(nd))[0]
                out = pd.DataFrame({
                    "px_x": xs.ravel()[mask], "px_y": ys.ravel()[mask], "value": vals[mask],
                })
                for c in keep_cols:
                    out[c] = row[c]
                frames.append(out[keep_cols + ["px_x", "px_y", "value"]])
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return df.mapInPandas(explode, out_schema)


def zonal_stats(tiles: DataFrame, zones: DataFrame, zone_id: str,
                raster_col: str = "raster", zone_geom: str = "geometry",
                band: int = 1, stats: Optional[List[str]] = None) -> DataFrame:
    """Zonal statistics: pixels of `tiles` aggregated per zone polygon.
    raster explode (map-side) -> point-in-polygon spatial join (two-phase,
    pure-column when zones are boxes) -> groupBy(zone)."""
    from .operators.spatial_join import spatial_join

    pts = raster_to_points(tiles, raster_col, band=band)
    # left_xy drives the whole pixel side through pure column math — no
    # geometry column is ever materialized on the (100 TB) raster side
    joined = spatial_join(
        pts, zones.select(zone_id, zone_geom), predicate="within",
        left_geom="__unused__", right_geom=zone_geom, left_xy=("px_x", "px_y"),
    )
    stats = stats or ["count", "sum", "mean", "min", "max"]
    aggs = []
    for s in stats:
        if s == "count":
            aggs.append(F.count("*").alias("px_count"))
        elif s == "sum":
            aggs.append(F.sum("value").alias("value_sum"))
        elif s == "mean":
            aggs.append(F.avg("value").alias("value_mean"))
        elif s == "min":
            aggs.append(F.min("value").alias("value_min"))
        elif s == "max":
            aggs.append(F.max("value").alias("value_max"))
    return joined.groupBy(zone_id).agg(*aggs)


# --- deterministic synthetic tiles --------------------------------------------


def synthesize_world_tiles(spark: SparkSession, tiles_x: int = 16, tiles_y: int = 8,
                           tile_px: int = 8, datatype: int = BAND_FLOAT64,
                           nodata: Optional[float] = None) -> DataFrame:
    """A deterministic world-covering tile table: `tiles_x * tiles_y` tiles,
    each `tile_px`^2 pixels, value = ((tile_id*px_count + row*w + col) * 37
    % 1000) / 10 — reproducible by integer arithmetic in any SQL engine."""
    tw = 360.0 / tiles_x
    th = 180.0 / tiles_y
    sx = tw / tile_px
    sy = th / tile_px
    n = tiles_x * tiles_y
    px_count = tile_px * tile_px

    base = spark.range(0, n).select(F.col("id").alias("tile_id"))
    out_schema = StructType([StructField("tile_id", LongType()), StructField("raster", RASTER_TYPE)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf["tile_id"]:
                t = int(t)
                tx, ty = t % tiles_x, t // tiles_x
                idx = np.arange(px_count, dtype=np.int64)
                vals = ((t * px_count + idx) * 37 % 1000) / 10.0
                band = vals.reshape(tile_px, tile_px)
                rows.append({
                    "tile_id": t,
                    "raster": make_raster_row(
                        tile_px, tile_px,
                        ulx=-180.0 + tx * tw, uly=-90.0 + (ty + 1) * th,
                        scale_x=sx, scale_y=-sy, bands=[band],
                        datatype=datatype, nodata=nodata,
                    ),
                })
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, out_schema)


def RS_Slope(raster_col: str, band: int = 1, z_factor: float = 1.0) -> F.Column:
    """Slope in DEGREES via Horn's method (Horn 1981 — the GDAL/Esri
    standard 3x3 kernel): per tile, dz/dx and dz/dy from the 8 neighbors
    with edge replication, slope = atan(z * sqrt(gx^2 + gy^2)).  Gradients
    use the raster's scale_x/scale_y as the ground distances (one numpy
    pass per tile — no per-pixel Python).  Border pixels use edge
    replication (the GDAL default), which DAMPS the border gradient —
    a planar ramp is exact on the interior only (the oracle law)."""
    meta = F.col(f"{raster_col}.metadata")
    bd = F.element_at(F.col(f"{raster_col}.bands"), band)

    @F.pandas_udf(BinaryType())
    def slope(data: pd.Series, dc: pd.Series, w: pd.Series, h: pd.Series,
              sx: pd.Series, sy: pd.Series) -> pd.Series:
        out = []
        for buf, c, ww, hh, dx, dy in zip(data, dc, w, h, sx, sy):
            if buf is None:
                out.append(None)
                continue
            ww, hh = int(ww), int(hh)
            a = bytes_to_band(bytes(buf), ww, hh, int(c)).astype(np.float64)
            p = np.pad(a, 1, mode="edge")
            # Horn 1981 weights (same as GDAL gdaldem slope)
            gx = ((p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
                  - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2]))                 / (8.0 * abs(float(dx)))
            gy = ((p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
                  - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:]))                 / (8.0 * abs(float(dy)))
            s = np.degrees(np.arctan(
                float(z_factor) * np.hypot(gx, gy)))
            out.append(band_to_bytes(s, BAND_FLOAT64))
        return pd.Series(out, dtype=object)

    return slope(bd["data"], bd["metadata"]["datatype"], meta["width"],
                 meta["height"], meta["scale_x"], meta["scale_y"])


def RS_Hillshade(raster_col: str, band: int = 1, azimuth: float = 315.0,
                 altitude: float = 45.0, z_factor: float = 1.0) -> F.Column:
    """Hillshade 0..255 (the GDAL gdaldem formula): Horn gradients ->
    illumination = cos(zenith) cos(slope) + sin(zenith) sin(slope)
    cos(azimuth - aspect), clamped at 0, scaled to 255."""
    meta = F.col(f"{raster_col}.metadata")
    bd = F.element_at(F.col(f"{raster_col}.bands"), band)
    az = math.radians((360.0 - azimuth + 90.0) % 360.0)
    zen = math.radians(90.0 - altitude)

    @F.pandas_udf(BinaryType())
    def shade(data: pd.Series, dc: pd.Series, w: pd.Series, h: pd.Series,
              sx: pd.Series, sy: pd.Series) -> pd.Series:
        out = []
        for buf, c, ww, hh, dx, dy in zip(data, dc, w, h, sx, sy):
            if buf is None:
                out.append(None)
                continue
            ww, hh = int(ww), int(hh)
            a = bytes_to_band(bytes(buf), ww, hh, int(c)).astype(np.float64)
            p = np.pad(a, 1, mode="edge")
            gx = ((p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
                  - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2]))                 / (8.0 * abs(float(dx)))
            gy = ((p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
                  - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:]))                 / (8.0 * abs(float(dy)))
            slope = np.arctan(float(z_factor) * np.hypot(gx, gy))
            aspect = np.arctan2(gy, -gx)   # ESRI/GDAL: atan2(dz/dy, -dz/dx)
            lum = (math.cos(zen) * np.cos(slope)
                   + math.sin(zen) * np.sin(slope) * np.cos(az - aspect))
            out.append(band_to_bytes(np.clip(lum, 0, 1) * 255.0,
                                     BAND_FLOAT64))
        return pd.Series(out, dtype=object)

    return shade(bd["data"], bd["metadata"]["datatype"], meta["width"],
                 meta["height"], meta["scale_x"], meta["scale_y"])
