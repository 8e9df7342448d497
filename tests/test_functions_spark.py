"""ST_* function surface tests through Spark SQL.

Mirrors the reference's SQL-level function tests
(`python/sedonadb/tests/functions/test_functions.py`) — literal WKT cases
run through registered UDFs."""

import pytest

from sedona_db_spark.functions import st


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    st.register_all(spark)


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_constructors_roundtrip(spark):
    assert one(spark, "ST_AsText(ST_Point(1.0D, 2.0D))") == "POINT (1 2)"
    assert one(spark, "ST_AsText(ST_GeomFromWKT('LINESTRING (0 0, 1 1)'))") == "LINESTRING (0 0, 1 1)"
    assert one(spark, "ST_AsText(ST_PointZ(1.0D, 2.0D, 3.0D))") == "POINT Z (1 2 3)"
    assert one(spark, "ST_AsText(ST_PointM(1.0D, 2.0D, 4.0D))") == "POINT M (1 2 4)"
    assert one(spark, "ST_AsText(ST_PointZM(1.0D, 2.0D, 3.0D, 4.0D))") == "POINT ZM (1 2 3 4)"
    assert one(spark, "ST_AsText(ST_MakeEnvelope(0.0D, 0.0D, 2.0D, 3.0D))") == (
        "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"
    )


def test_null_propagation(spark):
    assert one(spark, "ST_AsText(CAST(NULL AS BINARY))") is None
    assert one(spark, "ST_Area(CAST(NULL AS BINARY))") is None
    assert one(spark, "ST_Intersects(CAST(NULL AS BINARY), ST_Point(1.0D,1.0D))") is None


def test_measures(spark):
    assert one(spark, "ST_Area(ST_GeomFromWKT('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'))") == 100.0
    assert one(spark, "ST_Length(ST_GeomFromWKT('LINESTRING (0 0, 3 4)'))") == 5.0
    assert one(spark, "ST_Perimeter(ST_GeomFromWKT('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'))") == 40.0
    assert one(spark, "ST_AsText(ST_Centroid(ST_GeomFromWKT('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')))") == "POINT (5 5)"


def test_accessors(spark):
    assert one(spark, "ST_X(ST_Point(3.5D, 4.5D))") == 3.5
    assert one(spark, "ST_Y(ST_Point(3.5D, 4.5D))") == 4.5
    assert one(spark, "ST_Z(ST_PointZ(1.0D, 2.0D, 9.0D))") == 9.0
    assert one(spark, "ST_M(ST_PointM(1.0D, 2.0D, 7.0D))") == 7.0
    assert one(spark, "ST_XMin(ST_GeomFromWKT('LINESTRING (1 2, 3 8)'))") == 1.0
    assert one(spark, "ST_YMax(ST_GeomFromWKT('LINESTRING (1 2, 3 8)'))") == 8.0
    assert one(spark, "ST_NPoints(ST_GeomFromWKT('LINESTRING (0 0, 1 1, 2 2)'))") == 3
    assert one(spark, "ST_NumGeometries(ST_GeomFromWKT('MULTIPOINT ((1 1), (2 2))'))") == 2
    assert one(spark, "ST_GeometryType(ST_Point(1.0D, 1.0D))") == "ST_Point"
    assert one(spark, "ST_Dimension(ST_GeomFromWKT('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") == 2


def test_flags(spark):
    assert one(spark, "ST_HasZ(ST_PointZ(1.0D,2.0D,3.0D))") is True
    assert one(spark, "ST_HasM(ST_PointZ(1.0D,2.0D,3.0D))") is False
    assert one(spark, "ST_ZMFlag(ST_PointZM(1.0D,2.0D,3.0D,4.0D))") == 3
    assert one(spark, "ST_IsEmpty(ST_GeomFromWKT('POLYGON EMPTY'))") is True
    assert one(spark, "ST_IsClosed(ST_GeomFromWKT('LINESTRING (0 0, 1 0, 1 1, 0 0)'))") is True
    assert one(spark, "ST_IsValid(ST_GeomFromWKT('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") is True
    assert one(spark, "ST_IsRing(ST_GeomFromWKT('LINESTRING (0 0, 1 0, 1 1, 0 0)'))") is True


def test_predicates(spark):
    poly = "ST_GeomFromWKT('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')"
    assert one(spark, f"ST_Contains({poly}, ST_Point(5.0D, 5.0D))") is True
    assert one(spark, f"ST_Contains({poly}, ST_Point(0.0D, 5.0D))") is False
    assert one(spark, f"ST_Covers({poly}, ST_Point(0.0D, 5.0D))") is True
    assert one(spark, f"ST_Intersects({poly}, ST_Point(20.0D, 20.0D))") is False
    assert one(spark, f"ST_Within(ST_Point(5.0D, 5.0D), {poly})") is True
    assert one(spark, f"ST_Touches({poly}, ST_GeomFromWKT('POINT (10 5)'))") is True
    assert one(spark, "ST_DWithin(ST_Point(0.0D,0.0D), ST_Point(3.0D,4.0D), 5.0D)") is True


def test_distances(spark):
    assert one(spark, "ST_Distance(ST_Point(0.0D,0.0D), ST_Point(3.0D,4.0D))") == 5.0
    assert one(spark, "ST_MaxDistance(ST_Point(0.0D,0.0D), ST_GeomFromWKT('LINESTRING (3 4, 6 8)'))") == 10.0
    d = one(spark, "ST_DistanceSphere(ST_Point(0.0D,0.0D), ST_Point(0.0D,90.0D))")
    assert abs(d - 10007557.22) < 1.0  # pi/2 * 6371008.8 (IUGG mean radius)


def test_overlay_and_processing(spark):
    # polygon x convex polygon clip
    out = one(
        spark,
        "ST_Area(ST_Intersection("
        "ST_GeomFromWKT('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'),"
        "ST_GeomFromWKT('POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))')))",
    )
    assert out == 25.0
    assert one(spark, "ST_AsText(ST_Union(ST_Point(1.0D,1.0D), ST_Point(2.0D,2.0D)))") == (
        "MULTIPOINT ((1 1), (2 2))"
    )
    buf_area = one(spark, "ST_Area(ST_Buffer(ST_Point(0.0D,0.0D), 1.0D))")
    assert 3.0 < buf_area < 3.1416  # inscribed 32-gon
    assert one(spark, "ST_AsText(ST_Translate(ST_Point(1.0D,2.0D), 10.0D, 20.0D))") == "POINT (11 22)"


def test_dump_and_line_referencing(spark):
    rows = spark.sql(
        "SELECT explode(ST_Dump(ST_GeomFromWKT('MULTIPOINT ((1 1), (2 2))'))) AS d"
    ).collect()
    assert len(rows) == 2
    assert rows[0]["d"]["path"] == [1]
    assert one(
        spark,
        "ST_AsText(ST_LineInterpolatePoint(ST_GeomFromWKT('LINESTRING (0 0, 10 0)'), 0.25D))",
    ) == "POINT (2.5 0)"
    assert one(
        spark,
        "ST_LineLocatePoint(ST_GeomFromWKT('LINESTRING (0 0, 10 0)'), ST_Point(2.5D, 3.0D))",
    ) == 0.25


def test_transform(spark):
    wkt = one(
        spark,
        "ST_AsText(ST_Transform(ST_Point(0.0D, 0.0D), 'EPSG:4326', 'EPSG:3857'))",
    )
    assert wkt == "POINT (0 0)"
    x = one(
        spark,
        "ST_X(ST_Transform(ST_Point(180.0D, 0.0D), 'EPSG:4326', 'EPSG:3857'))",
    )
    assert abs(x - 20037508.34) < 0.01


def test_function_count_parity():
    # the reference registers ~70 scalar names; we expose the full list
    assert len(st.function_names()) >= 70


def test_dwithin_distance_fast_path_differential(spark):
    """The vectorized point×point fast path in ST_DWithin/ST_Distance must
    agree exactly with the generic algos route on a MIXED column — LE
    points, a big-endian point (slow decode), polygons, NULLs, and an
    empty point — round 5, after the sf1 OR-of-AND join showed the
    per-row loop 50x slower than the join itself."""
    import struct

    from sedona_db_spark.geometry import algos, wkb as gwkb

    def pt(x, y):
        return bytes(gwkb.encode_points_xy(__import__("numpy").array([x]), __import__("numpy").array([y]))[0])

    be_pt = struct.pack(">BI2d", 0, 1, 3.0, 4.0)  # big-endian POINT (3 4)
    poly = gwkb.from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    empty = pt(float("nan"), float("nan"))
    rows = [
        (pt(0.0, 0.0), pt(3.0, 4.0)),
        (pt(1.5, 1.5), gwkb.encode(poly)),
        (be_pt, pt(0.0, 0.0)),
        (None, pt(1.0, 1.0)),
        (pt(1.0, 1.0), None),
        (empty, pt(0.0, 0.0)),
        (pt(0.1, 0.2), pt(0.1, 0.2)),
    ]
    df = spark.createDataFrame(rows, "a binary, b binary")
    df.createOrReplaceTempView("__dw_fast")
    got = spark.sql(
        "SELECT ST_DWithin(a, b, 5.0) AS w, ST_Distance(a, b) AS d "
        "FROM __dw_fast"
    ).collect()
    for (a, b), r in zip(rows, got):
        if a is None or b is None:
            assert r["w"] is None and r["d"] is None
            continue
        ga, gb = gwkb.parse(bytes(a)), gwkb.parse(bytes(b))
        assert r["w"] == bool(algos.dwithin(ga, gb, 5.0))
        want = algos.distance(ga, gb)
        import math

        if math.isnan(want):
            assert r["d"] is None
        else:
            assert r["d"] == want
