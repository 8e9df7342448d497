"""ST_TriangulatePolygon (ear clipping + hole bridging), ST_Snap,
ST_SharedPaths."""

import math

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, triangulate as tg, wkb


def G(w):
    return wkb.from_wkt(w)


def tri_stats(gc):
    n = len(gc.coords)
    a = sum(algos.area(t) for t in gc.coords)
    return n, a


class TestTriangulate:
    def test_box(self):
        n, a = tri_stats(tg.triangulate_polygon(
            G("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")))
        assert n == 2 and a == pytest.approx(8.0)

    def test_concave(self):
        p = G("POLYGON ((0 0, 4 0, 4 1, 1 1, 1 3, 0 3, 0 0))")
        n, a = tri_stats(tg.triangulate_polygon(p))
        assert n == 4 and a == pytest.approx(algos.area(p))

    def test_holed_count_and_area(self):
        p = G("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0), "
              "(1 0.5, 1 1.5, 2 1.5, 2 0.5, 1 0.5))")
        n, a = tri_stats(tg.triangulate_polygon(p))
        # n_shell + n_hole + 2h - 2 = 4 + 4 + 2 - 2 = 8
        assert n == 8 and a == pytest.approx(7.0)

    def test_two_holes(self):
        p = G("POLYGON ((0 0, 10 0, 10 4, 0 4, 0 0), "
              "(1 1, 1 2, 2 2, 2 1, 1 1), (6 1, 6 3, 8 3, 8 1, 6 1))")
        n, a = tri_stats(tg.triangulate_polygon(p))
        assert n == 4 + 4 + 4 + 2 * 2 - 2
        assert a == pytest.approx(40.0 - 1.0 - 4.0)

    def test_triangles_inside(self):
        p = G("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0), "
              "(1 0.5, 1 1.5, 2 1.5, 2 0.5, 1 0.5))")
        for t in tg.triangulate_polygon(p).coords:
            c = algos.centroid(t).coords[0]
            assert algos.locate_points_in_polygon(
                np.array([c[0]]), np.array([c[1]]), p)[0] == 2

    def test_orientation_insensitive(self):
        a = tri_stats(tg.triangulate_polygon(
            G("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")))
        b = tri_stats(tg.triangulate_polygon(
            G("POLYGON ((0 0, 0 2, 4 2, 4 0, 0 0))")))
        assert a == b

    def test_multipolygon(self):
        n, a = tri_stats(tg.triangulate_polygon(
            G("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
              "((5 5, 7 5, 6 7, 5 5)))")))
        assert n == 3 and a == pytest.approx(3.0)

    def test_non_areal_raises(self):
        with pytest.raises(ValueError):
            tg.triangulate_polygon(G("LINESTRING (0 0, 1 1)"))


class TestSnap:
    def test_vertex_snap(self):
        out = tg.snap(G("LINESTRING (0.05 0.05, 3 3)"), G("POINT (0 0)"), 0.1)
        assert out.coords[0].tolist() == [0.0, 0.0]

    def test_no_snap_outside_tol(self):
        out = tg.snap(G("LINESTRING (0.5 0.5, 3 3)"), G("POINT (0 0)"), 0.1)
        assert out.coords[0].tolist() == [0.5, 0.5]

    def test_segment_insert(self):
        out = tg.snap(G("LINESTRING (0 0, 10 0)"), G("POINT (5 0.05)"), 0.1)
        assert out.coords.tolist() == [[0, 0], [5, 0.05], [10, 0]]

    def test_polygon_ring_closure(self):
        out = tg.snap(G("POLYGON ((0.02 0, 4 0, 4 2, 0 2, 0.02 0))"),
                      G("POINT (0 0)"), 0.1)
        r = out.coords[0]
        assert r[0].tolist() == [0.0, 0.0]
        assert bool(np.all(r[0] == r[-1]))

    def test_insert_order_along_segment(self):
        out = tg.snap(G("LINESTRING (0 0, 10 0)"),
                      G("MULTIPOINT ((7 0.05), (3 0.05))"), 0.1)
        assert [v[0] for v in out.coords.tolist()] == [0, 3, 7, 10]


class TestSharedPaths:
    def test_same_and_opposite(self):
        sp = tg.shared_paths(
            G("LINESTRING (0 0, 10 0)"),
            G("MULTILINESTRING ((2 0, 5 0), (8 0, 6 0))"))
        same, opp = sp.coords
        assert algos.length(same) == pytest.approx(3.0)
        assert algos.length(opp) == pytest.approx(2.0)

    def test_no_overlap_empty(self):
        sp = tg.shared_paths(G("LINESTRING (0 0, 1 0)"),
                             G("LINESTRING (0 1, 1 1)"))
        assert algos.length(sp) == 0.0

    def test_crossing_not_shared(self):
        sp = tg.shared_paths(G("LINESTRING (0 0, 2 2)"),
                             G("LINESTRING (0 2, 2 0)"))
        assert algos.length(sp) == 0.0

    def test_diagonal_overlap(self):
        sp = tg.shared_paths(G("LINESTRING (0 0, 4 4)"),
                             G("LINESTRING (1 1, 3 3)"))
        same, opp = sp.coords
        assert algos.length(same) == pytest.approx(2 * math.sqrt(2))
        assert algos.length(opp) == 0.0

    def test_areal_raises(self):
        with pytest.raises(ValueError):
            tg.shared_paths(G("LINESTRING (0 0, 1 0)"),
                            G("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))


@pytest.mark.usefixtures("spark")
class TestSQL:
    def test_sql_surface(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_NumGeometries(ST_TriangulatePolygon("
            "  ST_MakeEnvelope(0.0D, 0.0D, 4.0D, 2.0D))) AS n, "
            "ST_AsText(ST_Snap(ST_GeomFromText('LINESTRING (0 0, 10 0)'), "
            "  ST_Point(5.0D, 0.05D), 0.1D)) AS sn, "
            "ST_Length(ST_GeometryN(ST_SharedPaths("
            "  ST_GeomFromText('LINESTRING (0 0, 10 0)'), "
            "  ST_GeomFromText('LINESTRING (2 0, 5 0)')), 1)) AS sp"
        ).collect()[0]
        assert row.n == 2
        assert row.sn == "LINESTRING (0 0, 5 0.05, 10 0)"
        assert row.sp == pytest.approx(3.0)
