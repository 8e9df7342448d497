"""ST_OrientedEnvelope / ST_LongestLine / ST_Angle (round-4f extras)."""

import math

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, wkb

mk, show = wkb.from_wkt, wkb.to_wkt


class TestOrientedEnvelope:
    def test_axis_box_is_itself(self):
        v = algos.oriented_envelope(mk("POLYGON((1 2,5 2,5 4,1 4,1 2))"))
        assert algos.area(v) == pytest.approx(8.0)
        assert algos.bounds(v) == (1.0, 2.0, 5.0, 4.0)

    def test_diamond_recovers_rotation(self):
        # 45-degree square: bbox area 16, true minimum rectangle area 8
        v = algos.oriented_envelope(mk("POLYGON((0 2,2 0,4 2,2 4,0 2))"))
        assert algos.area(v) == pytest.approx(8.0)

    def test_rotation_invariance(self):
        base = mk("POLYGON((0 0,6 0,6 2,0 2,0 0))")
        for t in (0.3, 0.7, 1.1, 2.4):
            rot = algos.affine_2d(base, math.cos(t), -math.sin(t),
                                  math.sin(t), math.cos(t), 0.0, 0.0)
            v = algos.oriented_envelope(rot)
            assert algos.area(v) == pytest.approx(12.0, rel=1e-9)

    def test_right_triangle(self):
        v = algos.oriented_envelope(mk("POLYGON((0 0,6 0,0 3,0 0))"))
        assert algos.area(v) == pytest.approx(18.0)

    def test_contains_input_vertices(self):
        g = mk("MULTIPOINT(0 0,3 1,1 4,5 5,2 2)")
        v = algos.oriented_envelope(g)
        c = g.all_coords()
        loc = algos.locate_points_in_geometry(c[:, 0], c[:, 1], v)
        assert (loc != algos.OUTSIDE).all()

    def test_degenerate(self):
        assert show(algos.oriented_envelope(mk("POINT(3 4)"))) == "POINT (3 4)"
        assert algos.oriented_envelope(mk("LINESTRING(0 0,2 2)")).type_id == wkb.LINESTRING


class TestLongestLineAngle:
    def test_longest_line(self):
        v = algos.longest_line(
            mk("POLYGON((0 0,4 0,4 3,0 3,0 0))"), mk("POINT(10 10)")
        )
        assert show(v) == "LINESTRING (0 0, 10 10)"
        assert algos.length(v) == pytest.approx(math.hypot(10, 10))

    def test_longest_line_length_is_maxdistance(self):
        a = mk("LINESTRING(0 0,5 1,2 7)")
        b = mk("POLYGON((10 0,14 0,14 4,10 4,10 0))")
        assert algos.length(algos.longest_line(a, b)) == pytest.approx(
            algos.max_distance(a, b)
        )

    def test_angle_postgis_doc_example(self):
        # PostGIS doc: ST_Angle(P(0 0), P(10 10), P(20 0)) = 270 degrees
        a = algos.angle_3pt(0, 0, 10, 10, 20, 0)
        assert float(a) == pytest.approx(3 * math.pi / 2)

    def test_angle_right(self):
        assert float(algos.angle_3pt(1, 0, 0, 0, 0, 1)) == pytest.approx(3 * math.pi / 2)
        assert float(algos.angle_3pt(0, 1, 0, 0, 1, 0)) == pytest.approx(math.pi / 2)


def test_sql_surface(spark):
    from sedona_db_spark.functions.st import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT round(ST_Area(ST_OrientedEnvelope(ST_GeomFromWKT("
        "'POLYGON((0 2,2 0,4 2,2 4,0 2))'))), 9) AS a, "
        "round(ST_Length(ST_LongestLine(ST_MakeEnvelope(0,0,4,3), "
        "ST_Point(10.0, 10.0))), 9) AS l, "
        "round(ST_Angle(ST_Point(0.0,0.0), ST_Point(10.0,10.0), "
        "ST_Point(20.0,0.0)), 9) AS t, "
        "round(ST_Area(ST_MinimumRotatedRectangle(ST_GeomFromWKT("
        "'POLYGON((0 2,2 0,4 2,2 4,0 2))'))), 9) AS a2"
    ).first()
    assert row.a == 8.0 and row.a2 == 8.0
    assert row.l == round(math.hypot(10, 10), 9)
    assert row.t == round(3 * math.pi / 2, 9)
