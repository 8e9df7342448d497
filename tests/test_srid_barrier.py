"""SRID/CRS functions + barrier() tests."""

from pyspark.sql import functions as F

from sedona_db_spark.functions import st


def one(spark, expr):
    st.register_all(spark)
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_setsrid_roundtrip(spark):
    assert one(spark, "ST_SRID(ST_SetSRID(ST_Point(1.0D,2.0D), 4326))") == 4326
    assert one(spark, "ST_SRID(ST_Point(1.0D,2.0D))") == 0
    # geometry survives the tag
    assert one(spark, "ST_AsText(ST_SetSRID(ST_Point(1.0D,2.0D), 4326))") == "POINT (1 2)"
    assert one(spark, "ST_X(ST_SetSRID(ST_Point(1.5D,2.0D), 3857))") == 1.5


def test_setcrs_and_crs(spark):
    assert one(spark, "ST_CRS(ST_SetCRS(ST_Point(1.0D,2.0D), 'OGC:CRS84'))") == "EPSG:4326"
    assert one(spark, "ST_CRS(ST_Point(1.0D,2.0D))") is None


def test_setsrid_preserves_z(spark):
    assert one(spark, "ST_AsText(ST_SetSRID(ST_PointZ(1.0D,2.0D,3.0D), 4326))") == "POINT Z (1 2 3)"
    assert one(spark, "ST_Z(ST_SetSRID(ST_PointZ(1.0D,2.0D,3.0D), 4326))") == 3.0


def test_asbinary_strips_srid(spark):
    n = one(spark, "length(ST_AsBinary(ST_SetSRID(ST_Point(1.0D,2.0D), 4326)))")
    assert n == 21  # plain ISO XY point again


def test_barrier_prevents_pushdown(spark):
    """barrier() wraps a filter so Catalyst cannot push it below the wrap
    point (reference barrier.rs semantics)."""
    df = spark.range(100).select(F.col("id"), (F.col("id") % 2 == 0).alias("flag"))
    plain = df.where(F.col("flag"))
    barred = df.where(st.barrier(F.col("flag")))
    assert barred.count() == plain.count() == 50
    # the barrier expression appears as a (non-pushed) python UDF filter
    plan = barred._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" in plan or "<lambda>" in plan
