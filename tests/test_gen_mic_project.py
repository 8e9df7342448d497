"""ST_GeneratePoints / ST_MaximumInscribedCircle / ST_Project
(round-4f PostGIS family, beyond the reference's register)."""

import math

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, wkb

mk = wkb.from_wkt
R = algos.EARTH_RADIUS_M


class TestMaximumInscribedCircle:
    def test_square_exact(self):
        assert algos.maximum_inscribed_circle(mk("POLYGON((2 3,8 3,8 9,2 9,2 3))")) == (5.0, 6.0, 3.0)

    def test_rectangle_exact(self):
        assert algos.maximum_inscribed_circle(mk("POLYGON((0 0,10 0,10 4,0 4,0 0))")) == (5.0, 2.0, 2.0)

    def test_l_shape_analytic(self):
        # circle pinned by x=0, y=0 and the reflex corner (2,2):
        # r = 2*sqrt(2)/(1+sqrt(2)), center (r, r)
        cx, cy, r = algos.maximum_inscribed_circle(
            mk("POLYGON((0 0,6 0,6 2,2 2,2 6,0 6,0 0))"), tolerance=1e-6
        )
        want = 2.0 * math.sqrt(2.0) / (1.0 + math.sqrt(2.0))
        assert r == pytest.approx(want, abs=1e-4)
        assert cx == pytest.approx(want, abs=1e-4) and cy == pytest.approx(want, abs=1e-4)

    def test_donut(self):
        g = mk("POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))")
        cx, cy, r = algos.maximum_inscribed_circle(g, tolerance=1e-6)
        # corner pocket beats the flat ring width: circle touching both
        # shell walls (r = c) and the hole corner (4,4) gives
        # sqrt(2)*(4-c) = c  =>  r = 4*sqrt(2)/(1+sqrt(2)) ~ 2.3431
        want = 4.0 * math.sqrt(2.0) / (1.0 + math.sqrt(2.0))
        assert r == pytest.approx(want, abs=1e-4)
        # center must be interior with boundary distance == r
        loc = algos.locate_points_in_geometry(np.array([cx]), np.array([cy]), g)[0]
        assert loc == algos.INTERIOR

    def test_non_areal_none(self):
        assert algos.maximum_inscribed_circle(mk("LINESTRING(0 0,1 1)")) is None


class TestGeneratePoints:
    def test_count_inside_deterministic(self):
        tri = mk("POLYGON((0 0,8 0,0 8,0 0))")
        a = algos.generate_points(tri, 25, seed=5)
        b = algos.generate_points(tri, 25, seed=5)
        assert wkb.encode(a) == wkb.encode(b)
        xs = np.array([p.coords[0, 0] for p in a.coords])
        ys = np.array([p.coords[0, 1] for p in a.coords])
        assert len(xs) == 25
        assert (algos.locate_points_in_geometry(xs, ys, tri) != algos.OUTSIDE).all()

    def test_seed_changes_points(self):
        box = mk("POLYGON((0 0,4 0,4 4,0 4,0 0))")
        a = algos.generate_points(box, 10, seed=1)
        b = algos.generate_points(box, 10, seed=2)
        assert wkb.encode(a) != wkb.encode(b)

    def test_box_closed_form(self):
        # no rejection in a box: candidate j's uniforms are the poly31
        # buckets — recompute independently
        box = mk("POLYGON((10 20,14 20,14 22,10 22,10 20))")
        seed, P, M = 9, 2147483647, 2654435761
        got = algos.generate_points(box, 4, seed=seed)
        for j, p in enumerate(got.coords):
            ux = ((abs(seed * 1000003 + 2 * j) % P) * M) % P % 1000000 / 1e6
            uy = ((abs(seed * 1000003 + 2 * j + 1) % P) * M) % P % 1000000 / 1e6
            assert p.coords[0, 0] == 10 + ux * 4
            assert p.coords[0, 1] == 20 + uy * 2

    def test_empty_and_zero(self):
        assert algos.generate_points(mk("POLYGON((0 0,1 0,1 1,0 1,0 0))"), 0).is_empty
        assert algos.generate_points(mk("LINESTRING(0 0,1 1)"), 5).is_empty


class TestProjectSQL:
    def test_known_directions(self, spark):
        from sedona_db_spark.functions.st import register_all

        register_all(spark)
        d = R * math.radians(1.0)
        row = spark.sql(
            f"SELECT ST_AsText(ST_Project(ST_Point(0.0, 0.0), {d!r}, 0.0)) AS north, "
            f"ST_AsText(ST_Project(ST_Point(0.0, 0.0), {d!r}, {math.pi/2!r})) AS east"
        ).first()
        nx, ny = map(float, row.north[7:-1].split())
        ex, ey = map(float, row.east[7:-1].split())
        assert (nx, ny) == (pytest.approx(0.0, abs=1e-9), pytest.approx(1.0, abs=1e-9))
        assert (ex, ey) == (pytest.approx(1.0, abs=1e-9), pytest.approx(0.0, abs=1e-9))

    def test_roundtrip_distance(self, spark):
        from sedona_db_spark.functions.st import register_all

        register_all(spark)
        row = spark.sql(
            "SELECT ST_DistanceSphere(p, ST_Project(p, 250000.0, 1.1)) AS d "
            "FROM (SELECT ST_Point(12.5, 47.25) AS p)"
        ).first()
        assert row.d == pytest.approx(250000.0, rel=1e-9)

    def test_gen_and_mic_sql(self, spark):
        from sedona_db_spark.functions.st import register_all

        register_all(spark)
        row = spark.sql(
            "SELECT ST_NumGeometries(ST_GeneratePoints(b, 7, 3)) AS n, "
            "ST_MaximumInscribedCircle(b).radius AS r, "
            "ST_AsText(ST_MaximumInscribedCircle(b).center) AS c "
            "FROM (SELECT ST_MakeEnvelope(0.0, 0.0, 10.0, 4.0) AS b)"
        ).first()
        assert row.n == 7 and row.r == 2.0 and row.c == "POINT (5 2)"
