"""Linear referencing (M) + 3D measures (ST_InterpolatePoint,
ST_LocateAlong, ST_LocateBetween, ST_3DDistance/3DLength/3DMaxDistance,
ST_Force3DM/Force4D)."""

import math

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, measures as ms, wkb


def G(w):
    return wkb.from_wkt(w)


class TestInterpolatePoint:
    def test_midpoint(self):
        assert ms.interpolate_point(
            G("LINESTRING M (0 0 0, 3 4 10)"), G("POINT (1.5 2)")) == 5.0

    def test_off_line_projects(self):
        # closest point on the X axis segment is (2, 0) at t=0.2
        assert ms.interpolate_point(
            G("LINESTRING M (0 0 0, 10 0 100)"), G("POINT (2 7)")) == \
            pytest.approx(20.0)

    def test_clamps_to_endpoint(self):
        assert ms.interpolate_point(
            G("LINESTRING M (0 0 3, 1 0 9)"), G("POINT (-5 0)")) == 3.0

    def test_requires_m(self):
        with pytest.raises(ValueError):
            ms.interpolate_point(G("LINESTRING (0 0, 1 0)"), G("POINT (0 0)"))

    def test_requires_point(self):
        with pytest.raises(ValueError):
            ms.interpolate_point(G("LINESTRING M (0 0 0, 1 0 1)"),
                                 G("LINESTRING (0 0, 1 0)"))

    def test_multiline_picks_nearest_part(self):
        g = G("MULTILINESTRING M ((0 0 0, 1 0 1), (0 10 50, 1 10 60))")
        assert ms.interpolate_point(g, G("POINT (0.5 9)")) == pytest.approx(55.0)


class TestLocateAlong:
    def test_interpolates(self):
        out = ms.locate_along(G("LINESTRING M (0 0 0, 3 4 10)"), 2.5)
        assert len(out.coords) == 1
        assert out.coords[0].coords[0, :2].tolist() == [0.75, 1.0]

    def test_multiple_hits_and_descending(self):
        out = ms.locate_along(
            G("LINESTRING M (0 0 0, 2 0 10, 4 0 0)"), 5.0)
        xs = sorted(float(p.coords[0, 0]) for p in out.coords)
        assert xs == [1.0, 3.0]

    def test_no_hit_empty(self):
        out = ms.locate_along(G("LINESTRING M (0 0 0, 1 0 1)"), 99.0)
        assert out.is_empty

    def test_multipoint_filter(self):
        out = ms.locate_along(
            G("MULTIPOINT M ((0 0 1), (1 1 2), (2 2 1))"), 1.0)
        assert len(out.coords) == 2


class TestLocateBetween:
    def test_middle_half(self):
        out = ms.locate_between(G("LINESTRING M (0 0 0, 3 4 10)"), 2.5, 7.5)
        assert algos.length(out) == pytest.approx(2.5)

    def test_covers_all(self):
        out = ms.locate_between(G("LINESTRING M (0 0 0, 3 4 10)"), -1, 11)
        assert algos.length(out) == pytest.approx(5.0)

    def test_disjoint_window(self):
        out = ms.locate_between(G("LINESTRING M (0 0 0, 3 4 10)"), 20, 30)
        assert out.is_empty

    def test_split_runs(self):
        # M dips out of the window mid-line: two separate pieces
        g = G("LINESTRING M (0 0 0, 1 0 10, 2 0 0, 3 0 10)")
        out = ms.locate_between(g, 0, 4)
        # piece 1: [0, 0.4] on segment 1; piece 2: re-entry at 1.6 through
        # the valley at 2.0 and out again at 2.4 (one connected run)
        assert len(out.coords) == 2
        assert algos.length(out) == pytest.approx(1.2)

    def test_flat_segment_kept(self):
        g = G("LINESTRING M (0 0 5, 1 0 5, 2 0 20)")
        out = ms.locate_between(g, 0, 10)
        assert algos.length(out) == pytest.approx(1.0 + 1.0 / 3.0)

    def test_bad_range_raises(self):
        with pytest.raises(ValueError):
            ms.locate_between(G("LINESTRING M (0 0 0, 1 0 1)"), 5, 2)


class Test3D:
    def test_length(self):
        assert ms.length_3d(G("LINESTRING Z (0 0 0, 3 4 12)")) == 13.0

    def test_length_2d_degrade(self):
        assert ms.length_3d(G("LINESTRING (0 0, 3 4)")) == 5.0

    def test_point_point(self):
        assert ms.distance_3d(G("POINT Z (0 0 0)"),
                              G("POINT Z (3 4 12)")) == 13.0

    def test_mixed_dim_z0(self):
        assert ms.distance_3d(G("POINT (0 0)"), G("POINT Z (0 0 7)")) == 7.0

    def test_point_segment(self):
        assert ms.distance_3d(G("POINT Z (1.5 0 5)"),
                              G("LINESTRING Z (0 0 0, 3 0 0)")) == 5.0

    def test_segment_segment_skew(self):
        assert ms.distance_3d(G("LINESTRING Z (0 0 0, 1 0 0)"),
                              G("LINESTRING Z (0.5 -1 3, 0.5 1 3)")) == 3.0

    def test_crossing_is_zero(self):
        assert ms.distance_3d(G("LINESTRING Z (0 0 0, 1 1 1)"),
                              G("LINESTRING Z (1 0 0, 0 1 1)")) == 0.0

    def test_max_distance(self):
        assert ms.max_distance_3d(
            G("LINESTRING Z (0 0 0, 1 0 0)"),
            G("POINT Z (0 0 5)")) == pytest.approx(math.sqrt(26))

    def test_polygon_ring_counts(self):
        d = ms.distance_3d(G("POINT Z (0.5 0.5 4)"),
                           G("POLYGON Z ((0 0 0, 1 0 0, 1 1 0, 0 1 0, 0 0 0))"))
        # boundary distance (documented deviation): nearest ring point is
        # the edge midpoint at distance hypot(0.5, 4)
        assert d == pytest.approx(math.hypot(0.5, 4.0))


class TestForce:
    def test_force_4d(self):
        g = ms.force_4d(G("POINT (1 2)"), 7.0, 9.0)
        assert wkb.to_wkt(g) == "POINT ZM (1 2 7 9)"

    def test_force_3dm_drops_z(self):
        g = ms.force_3dm(G("POINT Z (1 2 3)"), 4.0)
        assert (g.has_z, g.has_m) == (False, True)
        assert wkb.to_wkt(g) == "POINT M (1 2 4)"

    def test_force_preserves_existing_m(self):
        g = ms.force_4d(G("LINESTRING M (0 0 5, 1 0 6)"))
        assert g.has_z and g.has_m
        assert g.coords[:, 3].tolist() == [5.0, 6.0]
        assert g.coords[:, 2].tolist() == [0.0, 0.0]


@pytest.mark.usefixtures("spark")
class TestSQL:
    def test_sql_surface(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_InterpolatePoint("
            "         ST_GeomFromText('LINESTRING M (0 0 0, 3 4 10)'), "
            "         ST_Point(1.5D, 2.0D)) AS ip, "
            "       ST_3DLength(ST_GeomFromText('LINESTRING Z (0 0 0, 3 4 12)')) AS l3, "
            "       ST_3DDistance(ST_GeomFromText('POINT Z (0 0 0)'), "
            "                     ST_GeomFromText('POINT Z (3 4 12)')) AS d3, "
            "       ST_Length(ST_LocateBetween("
            "         ST_GeomFromText('LINESTRING M (0 0 0, 3 4 10)'), "
            "         2.5D, 7.5D)) AS lb, "
            "       ST_AsText(ST_LocateAlong("
            "         ST_GeomFromText('LINESTRING M (0 0 0, 4 0 10)'), 2.5D)) AS la, "
            "       ST_AsText(ST_Force4D(ST_Point(1.0D, 2.0D))) AS f4"
        ).collect()[0]
        assert row.ip == 5.0 and row.l3 == 13.0 and row.d3 == 13.0
        assert row.lb == pytest.approx(2.5)
        assert row.la == "MULTIPOINT M ((1 0 2.5))"
        assert row.f4 == "POINT ZM (1 2 0 0)"


@pytest.mark.usefixtures("spark")
class Test3DPredicates:
    def test_sql(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_3DIntersects("
            "  ST_GeomFromText('LINESTRING Z (0 0 0, 1 1 1)'), "
            "  ST_GeomFromText('LINESTRING Z (1 0 0, 0 1 1)')) AS hit, "
            "ST_3DIntersects("
            "  ST_GeomFromText('POINT Z (0 0 0)'), "
            "  ST_GeomFromText('POINT Z (0 0 5)')) AS miss, "
            "ST_3DDWithin("
            "  ST_GeomFromText('POINT Z (0 0 0)'), "
            "  ST_GeomFromText('POINT Z (3 4 12)'), 13.0D) AS w1, "
            "ST_3DDWithin("
            "  ST_GeomFromText('POINT Z (0 0 0)'), "
            "  ST_GeomFromText('POINT Z (3 4 12)'), 12.9D) AS w0"
        ).collect()[0]
        assert row.hit is True and row.miss is False
        assert row.w1 is True and row.w0 is False
