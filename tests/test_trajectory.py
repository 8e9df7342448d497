"""Trajectory family: ST_IsValidTrajectory, ST_ClosestPointOfApproach,
ST_DistanceCPA, ST_CPAWithin."""

import math

import pytest

from sedona_db_spark.geometry import trajectory as tj, wkb


def G(w):
    return wkb.from_wkt(w)


A = "LINESTRING M (0 0 0, 10 0 10)"       # x = t, y = 0


class TestValidity:
    def test_valid(self):
        assert tj.is_valid_trajectory(G(A)) is True

    def test_decreasing_m_invalid(self):
        assert tj.is_valid_trajectory(G("LINESTRING M (0 0 5, 1 0 2)")) is False

    def test_equal_m_invalid(self):
        assert tj.is_valid_trajectory(G("LINESTRING M (0 0 1, 1 0 1)")) is False

    def test_no_m_invalid(self):
        assert tj.is_valid_trajectory(G("LINESTRING (0 0, 1 1)")) is False

    def test_polygon_invalid(self):
        assert tj.is_valid_trajectory(
            G("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")) is False


class TestCPA:
    def test_head_on_lanes(self):
        # B starts at x=6 moving -1; relative closure 2/s from gap 6 -> t*=3
        b = G("LINESTRING M (6 3 0, -4 3 10)")
        assert tj.closest_point_of_approach(G(A), b) == pytest.approx(3.0)
        assert tj.distance_cpa(G(A), b) == pytest.approx(3.0)

    def test_parallel_constant_gap(self):
        b = G("LINESTRING M (0 4 0, 10 4 10)")
        assert tj.distance_cpa(G(A), b) == pytest.approx(4.0)
        # dv = 0: CPA reported at the earliest co-temporal instant
        assert tj.closest_point_of_approach(G(A), b) == pytest.approx(0.0)

    def test_crossing_zero(self):
        b = G("LINESTRING M (5 -5 0, 5 5 10)")   # meets A at (5, 0) at t=5
        assert tj.distance_cpa(G(A), b) == pytest.approx(0.0)
        assert tj.closest_point_of_approach(G(A), b) == pytest.approx(5.0)

    def test_clamped_to_overlap_end(self):
        # B only exists for t in [0, 2]; unclamped t* would be 3
        b = G("LINESTRING M (6 3 0, 4 3 2)")
        assert tj.closest_point_of_approach(G(A), b) == pytest.approx(2.0)
        assert tj.distance_cpa(G(A), b) == pytest.approx(math.hypot(2, 3))

    def test_multi_segment(self):
        d = G("LINESTRING M (0 5 0, 5 5 5, 5 0 10)")
        # second leg: both points converge to (5, ...): min at t=7.5
        assert tj.distance_cpa(G(A), d) == pytest.approx(math.sqrt(12.5))

    def test_no_time_overlap_null(self):
        c = G("LINESTRING M (0 0 20, 1 0 30)")
        assert tj.closest_point_of_approach(G(A), c) is None
        assert tj.distance_cpa(G(A), c) is None
        assert tj.cpa_within(G(A), c, 1e9) is False

    def test_3d_cpa(self):
        a = G("LINESTRING ZM (0 0 0 0, 10 0 0 10)")
        b = G("LINESTRING ZM (0 0 8 0, 10 0 8 10)")
        assert tj.distance_cpa(a, b) == pytest.approx(8.0)

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            tj.distance_cpa(G("LINESTRING M (0 0 5, 1 0 2)"), G(A))


class TestCPAWithin:
    def test_within(self):
        b = G("LINESTRING M (6 3 0, -4 3 10)")
        assert tj.cpa_within(G(A), b, 3.0) is True
        assert tj.cpa_within(G(A), b, 2.9) is False


@pytest.mark.usefixtures("spark")
class TestSQL:
    def test_sql_surface(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_IsValidTrajectory("
            "  ST_GeomFromText('LINESTRING M (0 0 0, 10 0 10)')) AS v, "
            "ST_ClosestPointOfApproach("
            "  ST_GeomFromText('LINESTRING M (0 0 0, 10 0 10)'), "
            "  ST_GeomFromText('LINESTRING M (6 3 0, -4 3 10)')) AS t, "
            "ST_DistanceCPA("
            "  ST_GeomFromText('LINESTRING M (0 0 0, 10 0 10)'), "
            "  ST_GeomFromText('LINESTRING M (6 3 0, -4 3 10)')) AS d, "
            "ST_CPAWithin("
            "  ST_GeomFromText('LINESTRING M (0 0 0, 10 0 10)'), "
            "  ST_GeomFromText('LINESTRING M (6 3 0, -4 3 10)'), 3.0D) AS w"
        ).collect()[0]
        assert row.v is True and row.w is True
        assert row.t == pytest.approx(3.0)
        assert row.d == pytest.approx(3.0)
