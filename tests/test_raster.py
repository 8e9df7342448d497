"""Raster model tests: struct schema parity with the reference
(`rust/sedona-schema/src/raster.rs:25-107`), RS_* accessors (RS_Width
mirrors `rust/sedona-raster-functions/src/rs_size.rs`), tile->pixel
explode, and the raster↔vector zonal overlay."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark import raster as R
from sedona_db_spark.geometry import wkb


@pytest.fixture(scope="module")
def tiles(spark):
    return R.synthesize_world_tiles(spark, tiles_x=4, tiles_y=2, tile_px=4).cache()


def test_accessors_are_column_reads(spark, tiles):
    row = tiles.select(
        "tile_id",
        R.RS_Width("raster").alias("w"),
        R.RS_Height("raster").alias("h"),
        R.RS_UpperLeftX("raster").alias("ulx"),
        R.RS_UpperLeftY("raster").alias("uly"),
        R.RS_ScaleX("raster").alias("sx"),
        R.RS_ScaleY("raster").alias("sy"),
        R.RS_NumBands("raster").alias("nb"),
        R.RS_CRS("raster").alias("crs"),
    ).where(F.col("tile_id") == 5).collect()[0]
    assert row["w"] == 4 and row["h"] == 4
    # tile 5 -> tx=1, ty=1 (4x2 grid, 90x90 deg tiles)
    assert row["ulx"] == -180.0 + 1 * 90.0
    assert row["uly"] == -90.0 + 2 * 90.0
    assert row["sx"] == 90.0 / 4 and row["sy"] == -90.0 / 4
    assert row["nb"] == 1 and row["crs"] == "OGC:CRS84"
    # accessors must be pure struct-field reads (no Python stage)
    plan = tiles.select(R.RS_Width("raster"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_rs_value(spark, tiles):
    # value formula: ((t*16 + r*4 + c) * 37 % 1000)/10
    got = tiles.select(
        "tile_id", R.RS_Value("raster", 2, 1).alias("v")
    ).where(F.col("tile_id") == 3).collect()[0]["v"]
    assert got == ((3 * 16 + 1 * 4 + 2) * 37 % 1000) / 10.0


def test_raster_to_points_roundtrip(spark, tiles):
    pts = R.raster_to_points(tiles).collect()
    assert len(pts) == 8 * 16  # 8 tiles x 16 px
    for p in pts[:50]:
        t = p["tile_id"]
        tx, ty = t % 4, t // 4
        assert -180 + tx * 90 < p["px_x"] < -180 + (tx + 1) * 90
        assert -90 + ty * 90 < p["px_y"] < -90 + (ty + 1) * 90
    # every formula value present exactly once per tile
    vals = sorted(p["value"] for p in pts if p["tile_id"] == 0)
    want = sorted(((0 * 16 + i) * 37 % 1000) / 10.0 for i in range(16))
    assert vals == want


def test_nodata_dropped(spark):
    df = spark.createDataFrame(
        [(0, R.make_raster_row(2, 2, 0.0, 2.0, 1.0, -1.0,
                               [np.array([[1.0, -9.0], [3.0, 4.0]])], nodata=-9.0))],
        R.StructType([R.StructField("tile_id", R.LongType()),
                      R.StructField("raster", R.RASTER_TYPE)]),
    )
    pts = R.raster_to_points(df).collect()
    assert sorted(p["value"] for p in pts) == [1.0, 3.0, 4.0]
    nd = df.select(R.RS_BandNoDataValue("raster").alias("nd")).collect()[0]["nd"]
    assert nd == -9.0


def test_zonal_stats_matches_numpy(spark, tiles):
    # zones: 2 hemispheres as boxes
    zones = spark.createDataFrame(
        [(0, wkb.encode(wkb.box(-180, -90, 0, 90))),
         (1, wkb.encode(wkb.box(0, -90, 180, 90)))],
        "zone_id LONG, geometry BINARY",
    )
    out = {r["zone_id"]: r for r in R.zonal_stats(tiles, zones, "zone_id").collect()}
    # numpy oracle
    agg = {0: [], 1: []}
    for t in range(8):
        tx, ty = t % 4, t // 4
        for i in range(16):
            c, r_ = i % 4, i // 4
            x = -180 + tx * 90 + (c + 0.5) * 22.5
            v = ((t * 16 + i) * 37 % 1000) / 10.0
            agg[0 if x < 0 else 1].append(v)
    for z in (0, 1):
        assert out[z]["px_count"] == len(agg[z])
        assert out[z]["value_sum"] == pytest.approx(sum(agg[z]))
        assert out[z]["value_max"] == max(agg[z])


def test_map_algebra_and_band_stats(spark):
    from sedona_db_spark.raster import (
        RS_BandStats,
        RS_MapAlgebra,
        bytes_to_band,
        synthesize_world_tiles,
    )

    tiles = synthesize_world_tiles(spark, 4, 2, tile_px=4)
    out = tiles.withColumn(
        "g", RS_MapAlgebra("raster", lambda v: (v - 50.0) / (v + 50.0 + 1.0))
    ).withColumn("st", RS_BandStats("raster", data_col="g"))
    rows = out.select("tile_id", "g", "st").collect()
    assert len(rows) == 8
    for r in rows:
        t = r["tile_id"]
        idx = np.arange(16, dtype=np.int64)
        vals = ((t * 16 + idx) * 37 % 1000) / 10.0
        want = (vals - 50.0) / (vals + 51.0)
        got = bytes_to_band(bytes(r["g"]), 4, 4, 6).ravel()
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        assert r["st"]["cnt"] == 16
        assert r["st"]["vmin"] == want.min() and r["st"]["vmax"] == want.max()
        assert abs(r["st"]["vsum"] - want.sum()) < 1e-12


def test_band_stats_skips_nodata(spark):
    from sedona_db_spark.raster import RS_BandStats, synthesize_world_tiles

    tiles = synthesize_world_tiles(spark, 2, 1, tile_px=4, nodata=0.0)
    rows = tiles.withColumn("st", RS_BandStats("raster")).collect()
    for r in rows:
        t = r["tile_id"]
        idx = np.arange(16, dtype=np.int64)
        vals = ((t * 16 + idx) * 37 % 1000) / 10.0
        keep = vals[vals != 0.0]
        assert r["st"]["cnt"] == len(keep)
        assert abs(r["st"]["vsum"] - keep.sum()) < 1e-12


def test_map_algebra_two_bands(spark):
    from sedona_db_spark.raster import (
        RS_BandStats,
        RS_MapAlgebra,
        band_to_bytes,
        make_raster_row,
        RASTER_TYPE,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    a = np.arange(16, dtype=np.float64).reshape(4, 4)
    b = np.full((4, 4), 2.0)
    row = {"tile_id": 0, "raster": make_raster_row(
        4, 4, ulx=0.0, uly=4.0, scale_x=1.0, scale_y=-1.0, bands=[a, b])}
    import pandas as _pd
    schema = StructType([StructField("tile_id", LongType()),
                         StructField("raster", RASTER_TYPE)])
    df = spark.createDataFrame(_pd.DataFrame([row]), schema)
    out = df.withColumn(
        "nd", RS_MapAlgebra("raster", lambda x, y: (x - y) / (x + y + 1.0),
                            bands=(1, 2))
    ).withColumn("st", RS_BandStats("raster", data_col="nd")).collect()[0]
    want = (a - b) / (a + b + 1.0)
    assert out["st"]["vmin"] == want.min() and out["st"]["vmax"] == want.max()


def test_resample_block_mean(spark):
    from sedona_db_spark.raster import (
        RS_Resample,
        bytes_to_band,
        synthesize_world_tiles,
    )

    tiles = synthesize_world_tiles(spark, 2, 2, tile_px=8)
    rows = tiles.withColumn("ds", RS_Resample("raster", 4)).collect()
    for r in rows:
        t = r["tile_id"]
        vals = (((t * 64 + np.arange(64, dtype=np.int64)) * 37 % 1000) / 10.0
                ).reshape(8, 8)
        want = vals.reshape(2, 4, 2, 4).mean(axis=(1, 3))
        got = bytes_to_band(bytes(r["ds"]), 2, 2, 6)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_resample_uneven_raises(spark):
    import pytest as _pytest

    from sedona_db_spark.raster import RS_Resample, synthesize_world_tiles

    tiles = synthesize_world_tiles(spark, 2, 1, tile_px=8)
    with _pytest.raises(Exception, match="does not divide"):
        tiles.withColumn("ds", RS_Resample("raster", 3)).collect()


def test_slope_planar_ramp(spark):
    """Horn slope of z = 2x + 3y on a unit grid is atan(sqrt(13))
    everywhere — including edges, thanks to edge replication."""
    import math

    w, h = 8, 6
    arr = np.add.outer(3.0 * np.arange(h), 2.0 * np.arange(w))
    df = spark.createDataFrame(
        [(0, R.make_raster_row(w, h, 0.0, float(h), 1.0, -1.0, [arr]))],
        R.StructType([R.StructField("tile_id", R.LongType()),
                      R.StructField("raster", R.RASTER_TYPE)]))
    buf = df.select(R.RS_Slope("raster").alias("s")).collect()[0]["s"]
    s = R.bytes_to_band(bytes(buf), w, h, R.BAND_FLOAT64)
    want = math.degrees(math.atan(math.hypot(2.0, 3.0)))
    # interior exact; borders are damped by edge replication (GDAL-style)
    assert np.allclose(s[1:-1, 1:-1], want)
    assert np.all(s <= want + 1e-9)


def test_slope_flat_zero_and_zfactor(spark):
    w, h = 4, 4
    flat = np.full((h, w), 7.0)
    ramp = np.add.outer(0.0 * np.arange(h), 1.0 * np.arange(w))
    df = spark.createDataFrame(
        [(0, R.make_raster_row(w, h, 0.0, 4.0, 1.0, -1.0, [flat])),
         (1, R.make_raster_row(w, h, 0.0, 4.0, 1.0, -1.0, [ramp]))],
        R.StructType([R.StructField("tile_id", R.LongType()),
                      R.StructField("raster", R.RASTER_TYPE)]))
    rows = {r["tile_id"]: R.bytes_to_band(bytes(r["s"]), w, h, R.BAND_FLOAT64)
            for r in df.select("tile_id",
                               R.RS_Slope("raster", z_factor=2.0).alias("s"))
            .collect()}
    assert np.allclose(rows[0], 0.0)
    import math
    assert np.allclose(rows[1][1:-1, 1:-1], math.degrees(math.atan(2.0)))


def test_hillshade_flat_is_sin_altitude(spark):
    """A flat surface shades to 255*sin(altitude) regardless of azimuth."""
    import math

    w, h = 5, 5
    flat = np.zeros((h, w))
    df = spark.createDataFrame(
        [(0, R.make_raster_row(w, h, 0.0, 5.0, 1.0, -1.0, [flat]))],
        R.StructType([R.StructField("tile_id", R.LongType()),
                      R.StructField("raster", R.RASTER_TYPE)]))
    buf = df.select(R.RS_Hillshade("raster", altitude=37.0).alias("s")) \
        .collect()[0]["s"]
    s = R.bytes_to_band(bytes(buf), w, h, R.BAND_FLOAT64)
    assert np.allclose(s, 255.0 * math.sin(math.radians(37.0)))


def test_hillshade_sun_facing_brighter(spark):
    """A west-facing ramp lit from the west outshines one lit from the
    east (azimuth sensitivity)."""
    w, h = 6, 6
    ramp = np.add.outer(0.0 * np.arange(h), 2.0 * np.arange(w))  # rises east
    df = spark.createDataFrame(
        [(0, R.make_raster_row(w, h, 0.0, 6.0, 1.0, -1.0, [ramp]))],
        R.StructType([R.StructField("tile_id", R.LongType()),
                      R.StructField("raster", R.RASTER_TYPE)]))
    west = R.bytes_to_band(bytes(df.select(
        R.RS_Hillshade("raster", azimuth=270.0).alias("s"))
        .collect()[0]["s"]), w, h, R.BAND_FLOAT64)
    east = R.bytes_to_band(bytes(df.select(
        R.RS_Hillshade("raster", azimuth=90.0).alias("s"))
        .collect()[0]["s"]), w, h, R.BAND_FLOAT64)
    assert west.mean() > east.mean()
