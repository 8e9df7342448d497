"""Geography (geodesic) buffer: geometry/sphere.buffer_geography +
ST_Buffer_Spherical SQL surface."""

import math

import numpy as np
import pytest

from sedona_db_spark.geometry import sphere, wkb
from sedona_db_spark.geometry.algos import haversine_m, spherical_ring_area_m2

R = sphere.EARTH_RADIUS_M


def G(w):
    return wkb.from_wkt(w)


class TestPointBuffer:
    def test_vertices_geodesically_exact(self):
        b = sphere.buffer_geography(G("POINT (10 45)"), 100_000.0)
        ring = b.coords[0][:-1]
        d = haversine_m(np.full(len(ring), 10.0), np.full(len(ring), 45.0),
                        ring[:, 0], ring[:, 1])
        assert float(np.max(np.abs(d - 100_000.0))) < 1e-6

    def test_area_matches_spherical_ngon(self):
        # regular spherical 32-gon inscribed in the 100 km cap: area =
        # n * (C + 2A - pi) R^2 with C = 2pi/n and A from spherical
        # law of cosines — the closed form the SQL oracle recomputes
        b = sphere.buffer_geography(G("POINT (10 45)"), 100_000.0)
        area = spherical_ring_area_m2(b.coords[0])
        n, theta = 32, 100_000.0 / R
        C = 2 * math.pi / n
        cos_c = math.cos(theta) ** 2 + math.sin(theta) ** 2 * math.cos(C)
        c = math.acos(cos_c)
        A = math.acos(math.cos(theta) * (1 - cos_c)
                      / (math.sin(theta) * math.sin(c)))
        want = n * (C + 2 * A - math.pi) * R * R
        assert area == pytest.approx(want, rel=1e-5)

    def test_high_latitude_not_distorted(self):
        # planar-degree buffering would be ~2x wrong in lon at 60N;
        # geodesic vertices stay exact
        b = sphere.buffer_geography(G("POINT (0 60)"), 50_000.0)
        ring = b.coords[0][:-1]
        d = haversine_m(np.zeros(len(ring)), np.full(len(ring), 60.0),
                        ring[:, 0], ring[:, 1])
        assert float(np.max(np.abs(d - 50_000.0))) < 1e-6


class TestLineBuffer:
    def test_ring_within_tolerance(self):
        L = G("LINESTRING (10 45, 11 45.5)")
        b = sphere.buffer_geography(L, 50_000.0)
        pts = b.coords[0][:-1]
        d = sphere.points_to_geography_distance_m(pts[:, 0], pts[:, 1], L)
        # AEQD error is O((span/R)^2): sub-meter here
        assert float(np.min(d)) > 49_990.0
        assert float(np.max(d)) < 50_010.0

    def test_contains_the_line(self):
        L = G("LINESTRING (10 45, 11 45.5)")
        b = sphere.buffer_geography(L, 50_000.0)
        for x, y in L.coords[:, :2]:
            assert sphere.locate_points_winding(
                np.array([x]), np.array([y]), b)[0] != 0


class TestGuards:
    def test_nonpositive_raises(self):
        with pytest.raises(ValueError):
            sphere.buffer_geography(G("POINT (0 0)"), 0.0)

    def test_hemisphere_cap_raises(self):
        with pytest.raises(NotImplementedError):
            sphere.buffer_geography(G("POINT (0 0)"), R * math.pi)

    def test_wide_input_raises(self):
        with pytest.raises(NotImplementedError):
            sphere.buffer_geography(G("LINESTRING (-40 0, 40 0)"), 1000.0)


@pytest.mark.usefixtures("spark")
class TestSQL:
    def test_sql_surface(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_Area_Spherical(ST_Buffer_Spherical("
            "  ST_Point(10.0D, 45.0D), 100000.0D)) AS a"
        ).collect()[0]
        cap = 2 * math.pi * R * R * (1 - math.cos(100_000.0 / R))
        # inscribed 32-gon runs (2pi/n)^2/6 ~ 0.64% below the cap
        assert row.a == pytest.approx(cap, rel=8e-3)
        assert row.a < cap


class TestSegmentize:
    def test_vertices_on_geodesic(self):
        L = G("LINESTRING (0 60, 90 60)")
        from sedona_db_spark.functions.geography import geog_length_m

        D = geog_length_m(L)
        out = sphere.segmentize_geography(L, D / 6.5)
        assert len(out.coords) == 8        # ceil(6.5) = 7 pieces
        pts = out.coords
        d = sphere.points_to_geography_distance_m(pts[:, 0], pts[:, 1], L)
        assert float(np.max(d)) < 1e-6
        assert geog_length_m(out) == pytest.approx(D, rel=1e-12)

    def test_short_edge_untouched(self):
        L = G("LINESTRING (0 0, 0.001 0)")
        out = sphere.segmentize_geography(L, 1e9)
        assert len(out.coords) == 2

    def test_bad_max_raises(self):
        with pytest.raises(ValueError):
            sphere.segmentize_geography(G("LINESTRING (0 0, 1 1)"), 0.0)
