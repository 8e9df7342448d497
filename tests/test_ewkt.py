"""PostGIS extended wire formats: ST_AsEWKT / ST_GeomFromEWKT /
ST_AsEWKB / ST_GeomFromEWKB (SRID-carrying)."""

import pytest


@pytest.mark.usefixtures("spark")
class TestEWKT:
    def test_roundtrip_with_srid(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_AsEWKT(ST_SetSRID(ST_Point(1.5D, 2.5D), 4326)) AS e, "
            "       ST_SRID(ST_GeomFromEWKT('SRID=3857;POINT (10 20)')) AS s, "
            "       ST_X(ST_GeomFromEWKT('SRID=3857;POINT (10 20)')) AS x, "
            "       ST_AsEWKT(ST_Point(1.0D, 2.0D)) AS plain"
        ).collect()[0]
        assert row.e == "SRID=4326;POINT (1.5 2.5)"
        assert row.s == 3857 and row.x == 10.0
        assert row.plain == "POINT (1 2)"

    def test_ewkb_preserves_srid(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_SRID(ST_GeomFromEWKB(ST_AsEWKB("
            "         ST_SetSRID(ST_Point(3.0D, 4.0D), 4326)))) AS s, "
            "       ST_Y(ST_GeomFromEWKB(ST_AsEWKB("
            "         ST_SetSRID(ST_Point(3.0D, 4.0D), 4326)))) AS y"
        ).collect()[0]
        assert row.s == 4326 and row.y == 4.0

    def test_zm_ewkt(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_AsEWKT(ST_GeomFromEWKT("
            "  'SRID=4326;LINESTRING ZM (0 0 1 2, 3 4 5 6)')) AS e"
        ).collect()[0]
        assert row.e == "SRID=4326;LINESTRING ZM (0 0 1 2, 3 4 5 6)"

    def test_malformed_raises(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        with pytest.raises(Exception):
            spark.sql(
                "SELECT ST_GeomFromEWKT('SRID=4326POINT (1 2)')"
            ).collect()
