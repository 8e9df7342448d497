"""SQL-surface parity with the reference's register files (round-4,
VERDICT r3 next #5): every SQL name the reference registers must exist in
the Spark catalog after `st.register_all`.

Name provenance (all in /root/reference):
* rust/sedona-functions/src/register.rs:23-112 — canonical scalar +
  aggregate names
* st_astext.rs:39 / st_asbinary.rs:37 — st_aswkt / st_aswkb aliases
* st_geomfromwkt.rs:51-70 — st_geomfromtext / st_geometryfromtext /
  st_geogfromtext aliases
* referencing.rs:28,55 — st_line_interpolate_point / st_line_locate_point
* predicates.rs — the 10 relation predicates + st_dwithin + st_knn
* c/sedona-geos/src/register.rs — st_isvalid(reason), st_issimple,
  st_isring, st_convexhull, st_simplifypreservetopology, st_unaryunion,
  overlay + buffer kernels (same SQL names)
* c/sedona-s2geography/src/register.rs:21-48 — geography kernels under the
  same ST_ names (our SQL surface exposes the *_Spherical spellings plus
  metadata dispatch at the DataFrame level)
* rust/sedona-raster-functions/src/register.rs — rs_width
"""

import pytest

# Every SQL identifier the reference registers, lowercased.
REFERENCE_SQL_NAMES = [
    # constructors / IO
    "st_point", "st_pointz", "st_pointm", "st_pointzm", "st_geogpoint",
    "st_geomfromwkt", "st_geomfromtext", "st_geometryfromtext",
    "st_geogfromwkt", "st_geogfromtext",
    "st_geomfromwkb", "st_geogfromwkb",
    "st_astext", "st_aswkt", "st_asbinary", "st_aswkb",
    "st_makeline", "sd_format",
    # accessors / measures
    "st_area", "st_length", "st_perimeter", "st_centroid", "st_envelope",
    "st_dimension", "st_geometrytype", "st_x", "st_y", "st_z", "st_m",
    "st_xmin", "st_xmax", "st_ymin", "st_ymax", "st_zmin", "st_zmax",
    "st_mmin", "st_mmax", "st_npoints", "st_points", "st_numgeometries",
    "st_pointn", "st_startpoint", "st_endpoint", "st_isclosed",
    "st_iscollection", "st_isempty", "st_hasz", "st_hasm", "st_zmflag",
    "st_srid", "st_setsrid", "st_crs", "st_setcrs",
    # validity (GEOS kernels)
    "st_isvalid", "st_isvalidreason", "st_issimple", "st_isring",
    # predicates
    "st_intersects", "st_disjoint", "st_contains", "st_within",
    "st_covers", "st_coveredby", "st_touches", "st_crosses",
    "st_overlaps", "st_equals", "st_dwithin", "st_knn",
    # distances
    "st_distance", "st_distancesphere", "st_distancespheroid",
    "st_maxdistance", "st_hausdorffdistance", "st_frechetdistance",
    "st_closestpoint", "st_shortestline",
    # overlay / processing
    "st_intersection", "st_union", "st_difference", "st_symdifference",
    "st_unaryunion", "st_buffer", "st_convexhull",
    "st_simplifypreservetopology", "st_azimuth", "st_flipcoordinates",
    "st_translate", "st_dump",
    "st_line_interpolate_point", "st_line_locate_point",
    "st_lineinterpolatepoint", "st_linelocatepoint",
    "st_transform",
    # aggregates (register.rs:105-112)
    "st_collect", "st_union_aggr", "st_intersection_aggr",
    "st_envelope_aggr", "st_analyze_aggr",
    # raster
    "rs_width",
]


@pytest.fixture(scope="module")
def registered(spark):
    from sedona_db_spark.functions import st

    st.register_all(spark)
    return spark


def test_every_reference_name_exists(registered):
    missing = [
        n for n in REFERENCE_SQL_NAMES
        if not registered.catalog.functionExists(n)
    ]
    assert not missing, f"unregistered reference SQL names: {missing}"


def test_alias_spellings_agree_with_canonical(registered):
    """The alias names run the same kernels (not just exist)."""
    rows = registered.sql(
        "SELECT ST_AsWKT(ST_GeometryFromText('POINT (1 2)')) AS a, "
        "       ST_AsText(ST_GeomFromText('POINT (1 2)')) AS b, "
        "       ST_AsWKB(ST_GeomFromWKT('POINT (1 2)')) AS c, "
        "       ST_AsBinary(ST_GeomFromWKT('POINT (1 2)')) AS d, "
        "       ST_Line_Interpolate_Point(ST_GeomFromWKT('LINESTRING (0 0, 10 0)'), 0.3) AS e, "
        "       ST_LineInterpolatePoint(ST_GeomFromWKT('LINESTRING (0 0, 10 0)'), 0.3) AS f"
    ).collect()[0]
    assert rows["a"] == rows["b"] == "POINT (1 2)"
    assert bytes(rows["c"]) == bytes(rows["d"])
    assert bytes(rows["e"]) == bytes(rows["f"])


def test_sql_aggregates_run(registered, spark):
    """The SQL aggregate surface computes real results (GROUP BY path)."""
    import numpy as np

    from sedona_db_spark.geometry import wkb

    rows = []
    for grp in (0, 1):
        for i in range(4):
            rows.append((grp, bytes(wkb.encode(
                wkb.box(grp * 100.0 + i, 0.0, grp * 100.0 + i + 2.0, 2.0)))))
    df = spark.createDataFrame(rows, "grp INT, g BINARY")
    df.createOrReplaceTempView("agg_t")
    out = {r["grp"]: r for r in spark.sql(
        "SELECT grp, ST_Envelope_Aggr(g) AS env, ST_Union_Aggr(g) AS u, "
        "       ST_Collect(g) AS c, ST_Analyze_Aggr(g) AS a "
        "FROM agg_t GROUP BY grp"
    ).collect()}
    from sedona_db_spark.geometry import algos

    for grp in (0, 1):
        env = wkb.parse(bytes(out[grp]["env"]))
        assert algos.bounds(env) == (grp * 100.0, 0.0, grp * 100.0 + 5.0, 2.0)
        # union of 4 unit-overlapping 2x2 boxes: x extent 5, area 10
        assert abs(algos.area(wkb.parse(bytes(out[grp]["u"]))) - 10.0) < 1e-9
        c = wkb.parse(bytes(out[grp]["c"]))
        assert c.type_id == wkb.MULTIPOLYGON and len(c.coords) == 4
        import json

        a = json.loads(out[grp]["a"])
        assert a["count"] == 4 and a["polygonal_count"] == 4


def test_st_knn_marker_raises_outside_join(registered):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError, Exception),
                       match="join-only|ST_KNN"):
        registered.sql(
            "SELECT ST_KNN(ST_Point(0.0, 0.0), ST_Point(1.0, 1.0), 3) AS k"
        ).collect()


def test_rs_width_sql(registered, spark):
    from sedona_db_spark import raster as R

    df = R.synthesize_world_tiles(spark, tiles_x=2, tiles_y=2, tile_px=16)
    rcol = [c for c in df.columns if c not in ("tile_id",)][0]
    df.createOrReplaceTempView("tiles_t")
    rows = spark.sql(f"SELECT RS_Width({rcol}) AS w FROM tiles_t").collect()
    assert {r["w"] for r in rows} == {16}


def test_postgis_aggregate_aliases(spark):
    from sedona_db_spark.functions import st

    st.register_all(spark)
    r = spark.sql(
        "SELECT ST_AsText(ST_Extent(g)) AS e, ST_Area(ST_MemUnion(g)) AS u "
        "FROM (SELECT ST_MakeEnvelope(0D,0D,1D,1D) AS g "
        "      UNION ALL SELECT ST_MakeEnvelope(1D,0D,2D,1D))"
    ).collect()[0]
    assert r.e == "POLYGON ((0 0, 2 0, 2 1, 0 1, 0 0))"
    assert r.u == 2.0
