"""ST_DumpPoints / ST_DumpSegments (PostGIS set-returning shape as the
same path+geom struct array ST_Dump uses)."""

import pytest


@pytest.mark.usefixtures("spark")
class TestDumpPoints:
    def test_polygon_points(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        rows = spark.sql(
            "SELECT explode(ST_DumpPoints(ST_GeomFromText("
            "  'POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))'))) AS d"
        ).select("d.path", "d.geom").collect()
        assert len(rows) == 5
        assert rows[0].path == [1, 1] and rows[4].path == [1, 5]

    def test_multilinestring_paths(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        rows = spark.sql(
            "SELECT d.path, ST_AsText(d.geom) AS w FROM (SELECT "
            "explode(ST_DumpPoints(ST_GeomFromText("
            "  'MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))'))) AS d)"
        ).collect()
        assert [r.path for r in rows] == [[1, 1], [1, 2], [2, 1], [2, 2], [2, 3]]
        assert rows[2].w == "POINT (2 2)"

    def test_segments(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        rows = spark.sql(
            "SELECT d.path, ST_Length(d.geom) AS l FROM (SELECT "
            "explode(ST_DumpSegments(ST_GeomFromText("
            "  'POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))'))) AS d)"
        ).collect()
        assert len(rows) == 4
        assert sum(r.l for r in rows) == pytest.approx(12.0)

    def test_segments_count_law(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        n = spark.sql(
            "SELECT size(ST_DumpSegments(ST_GeomFromText("
            "  'MULTILINESTRING ((0 0, 1 1, 2 2), (5 5, 6 6))'))) AS n"
        ).collect()[0].n
        assert n == 3

    def test_point_dump(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        rows = spark.sql(
            "SELECT ST_DumpPoints(ST_Point(1.0D, 2.0D)) AS d"
        ).collect()[0].d
        assert len(rows) == 1 and rows[0].path == [1]
