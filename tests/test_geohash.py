"""ST_GeoHash / ST_GeomFromGeoHash / ST_PointFromGeoHash.

PostGIS/Sedona base-32 geohash semantics (lon bit leads the interleave).
Known vectors are the canonical public examples (Wikipedia "Geohash"):
(57.64911 N, 10.40744 E) -> u4pruydqqvj ; (42.605 N, -5.603 E) -> ezs42.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sedona_db_spark.functions import st
from sedona_db_spark.geometry import wkb


def _pt(lon, lat):
    return wkb.encode(wkb.point(lon, lat))


def test_known_vectors(spark):
    df = spark.createDataFrame(
        [
            (1, _pt(10.40744, 57.64911), 11),
            (2, _pt(-5.603, 42.605), 5),
            (3, _pt(-0.0000001, 0.0000001), 9),
        ],
        "id int, g binary, p int",
    )
    rows = {
        r["id"]: r["gh"]
        for r in df.select(
            "id", st.ST_GeoHash("g", "p").alias("gh")
        ).collect()
    }
    assert rows[1] == "u4pruydqqvj"
    assert rows[2] == "ezs42"
    # the (−ε, +ε) corner pins the lon-leads bit order: base-32 'e' = 0b01101
    assert rows[3].startswith("e")


def test_roundtrip_point_within_cell(spark):
    pts = [(i, _pt(-180 + 37.3 * i % 360, -90 + 17.7 * i % 180)) for i in range(40)]
    df = spark.createDataFrame(pts, "id int, g binary")
    got = df.select(
        "id",
        st.ST_X("g").alias("x"),
        st.ST_Y("g").alias("y"),
        st.ST_X(st.ST_PointFromGeoHash(st.ST_GeoHash("g", F.lit(12)))).alias("rx"),
        st.ST_Y(st.ST_PointFromGeoHash(st.ST_GeoHash("g", F.lit(12)))).alias("ry"),
    ).collect()
    for r in got:
        # 12-char cell is ~3.7e-5 deg lon x 1.8e-5 deg lat; centre is within half
        assert math.isclose(r["x"], r["rx"], abs_tol=1e-4), r
        assert math.isclose(r["y"], r["ry"], abs_tol=1e-4), r


def test_geomfromgeohash_bbox_contains_point(spark):
    df = spark.createDataFrame(
        [(1, _pt(10.40744, 57.64911))], "id int, g binary"
    )
    row = df.select(
        st.ST_Contains(
            st.ST_GeomFromGeoHash(st.ST_GeoHash("g", F.lit(6))), "g"
        ).alias("ok"),
        st.ST_Area(st.ST_GeomFromGeoHash(F.lit("u"))).alias("cell1_area"),
    ).collect()[0]
    assert row["ok"] is True
    # one base-32 char = 45 deg lon x 45 deg lat
    assert math.isclose(row["cell1_area"], 45.0 * 45.0, rel_tol=1e-9)


def test_nonpoint_hashes_envelope_centroid(spark):
    poly = wkb.encode(
        wkb.from_wkt("POLYGON ((10 57, 11 57, 11 58, 10 58, 10 57))")
    )
    df = spark.createDataFrame([(1, poly), (2, None)], "id int, g binary")
    rows = {
        r["id"]: r["gh"]
        for r in df.select(
            "id", st.ST_GeoHash("g", F.lit(7)).alias("gh")
        ).collect()
    }
    # centroid of the envelope is (10.5, 57.5)
    exp = df.sparkSession.createDataFrame(
        [(1, _pt(10.5, 57.5))], "id int, g binary"
    ).select(st.ST_GeoHash("g", F.lit(7)).alias("gh")).collect()[0]["gh"]
    assert rows[1] == exp
    assert rows[2] is None


def test_sql_registration(spark):
    st.register_all(spark)
    row = spark.sql(
        "SELECT ST_GeoHash(ST_Point(10.40744, 57.64911), 5) AS gh, "
        "ST_AsText(ST_PointFromGeoHash('ezs42')) AS wkt"
    ).collect()[0]
    assert row["gh"] == "u4pru"
    assert row["wkt"].startswith("POINT")


def test_invalid_geohash_char_raises(spark):
    df = spark.createDataFrame([("ab!",)], "gh string")
    with pytest.raises(Exception):
        df.select(st.ST_PointFromGeoHash("gh")).collect()
