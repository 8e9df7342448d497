"""Orientation + normal-form family (ST_ForcePolygonCW/CCW, ST_Normalize,
ST_Multi, ST_RemoveRepeatedPoints, ST_Expand, ST_BoundingDiagonal,
ST_OrderingEquals, ST_PointOnSurface, ST_SimplifyVW, ST_GeometricMedian)."""

import math

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, normform as nf, wkb
from sedona_db_spark.geometry.wkb import (
    LINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)


def box(x0, y0, x1, y1):
    return wkb.parse(bytes(wkb.encode_boxes(
        np.array([float(x0)]), np.array([float(y0)]),
        np.array([float(x1)]), np.array([float(y1)]))[0]))


def poly(*rings):
    return Geometry(POLYGON, [np.asarray(r, dtype=np.float64) for r in rings])


HOLED = poly(
    [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],          # CCW shell
    [[2, 2], [2, 4], [4, 4], [4, 2], [2, 2]],               # CW hole
)


# ---------------------------------------------------------------------------
# orientation
# ---------------------------------------------------------------------------

class TestOrientation:
    def test_force_cw_flips_shell_and_hole(self):
        cw = nf.force_polygon_cw(HOLED)
        assert not nf._ring_is_ccw(cw.coords[0])
        assert nf._ring_is_ccw(cw.coords[1])
        assert nf.is_polygon_cw(cw) and not nf.is_polygon_ccw(cw)
        assert algos.area(cw) == pytest.approx(algos.area(HOLED))

    def test_force_ccw(self):
        ccw = nf.force_polygon_ccw(nf.force_polygon_cw(HOLED))
        assert nf.is_polygon_ccw(ccw)
        assert nf._ring_is_ccw(ccw.coords[0])
        assert not nf._ring_is_ccw(ccw.coords[1])

    def test_non_polygonal_true_and_passthrough(self):
        ln = Geometry(LINESTRING, np.array([[0.0, 0.0], [1.0, 1.0]]))
        assert nf.is_polygon_cw(ln) is True
        assert nf.is_polygon_ccw(ln) is True
        assert nf.ordering_equals(nf.force_polygon_cw(ln), ln)

    def test_multipolygon_recurses(self):
        mp = Geometry(MULTIPOLYGON, [HOLED, box(20, 20, 21, 21)])
        cw = nf.force_polygon_cw(mp)
        assert nf.is_polygon_cw(cw)
        assert algos.area(cw) == pytest.approx(algos.area(mp))


# ---------------------------------------------------------------------------
# normalize / multi / ordering-equals
# ---------------------------------------------------------------------------

class TestNormalForms:
    def test_normalize_ring_min_first_cw(self):
        n = nf.normalize(box(1, 2, 5, 7))
        ring = n.coords[0]
        assert ring[0].tolist() == [1.0, 2.0]
        assert ring[1].tolist() == [1.0, 7.0]          # CW from min corner
        assert not nf._ring_is_ccw(ring)
        assert bool(np.all(ring[0] == ring[-1]))

    def test_normalize_is_canonical_under_part_order(self):
        a = Geometry(MULTIPOLYGON, [box(0, 0, 1, 1), box(5, 5, 6, 6)])
        b = Geometry(MULTIPOLYGON, [box(5, 5, 6, 6), box(0, 0, 1, 1)])
        assert wkb.encode(nf.normalize(a)) == wkb.encode(nf.normalize(b))
        assert not nf.ordering_equals(a, b)
        assert nf.ordering_equals(nf.normalize(a), nf.normalize(b))

    def test_normalize_idempotent(self):
        g = nf.force_polygon_ccw(HOLED)
        once = nf.normalize(g)
        assert wkb.encode(nf.normalize(once)) == wkb.encode(once)

    def test_multi_wraps_and_passes_through(self):
        m = nf.multi(box(0, 0, 1, 1))
        assert m.type_id == MULTIPOLYGON and len(m.coords) == 1
        assert wkb.encode(nf.multi(m)) == wkb.encode(m)
        p = nf.multi(Geometry(POINT, np.array([[3.0, 4.0]])))
        assert p.type_id == MULTIPOINT and len(p.coords) == 1


# ---------------------------------------------------------------------------
# repeated points / expand / diagonal
# ---------------------------------------------------------------------------

class TestEditors:
    def test_remove_repeated_line(self):
        ln = Geometry(LINESTRING, np.array(
            [[0.0, 0.0], [0.0, 0.0], [1.0, 1.0], [1.0, 1.0], [2.0, 2.0]]))
        out = nf.remove_repeated_points(ln)
        assert out.coords.tolist() == [[0, 0], [1, 1], [2, 2]]

    def test_remove_repeated_tolerance(self):
        ln = Geometry(LINESTRING, np.array(
            [[0.0, 0.0], [0.05, 0.0], [1.0, 0.0]]))
        assert len(nf.remove_repeated_points(ln, 0.1).coords) == 2
        assert len(nf.remove_repeated_points(ln, 0.01).coords) == 3

    def test_remove_repeated_ring_guard(self):
        # every vertex within tol of its predecessor: the ring refuses
        # to collapse below a valid 4-point ring
        r = poly([[0, 0], [0.01, 0], [0.01, 0.01], [0, 0.01], [0, 0]])
        out = nf.remove_repeated_points(r, 1.0)
        assert len(out.coords[0]) >= 4

    def test_remove_repeated_multipoint_dedups_globally(self):
        mp = Geometry(MULTIPOINT, [
            Geometry(POINT, np.array([[0.0, 0.0]])),
            Geometry(POINT, np.array([[1.0, 1.0]])),
            Geometry(POINT, np.array([[0.0, 0.0]])),
        ])
        assert len(nf.remove_repeated_points(mp).coords) == 2

    def test_expand(self):
        e = nf.expand(box(0, 0, 4, 2), 1.0)
        assert algos.area(e) == pytest.approx(24.0)
        e2 = nf.expand(box(0, 0, 4, 2), 1.0, 2.0)
        assert algos.area(e2) == pytest.approx(36.0)
        with pytest.raises(ValueError):
            nf.expand(box(0, 0, 4, 2), -3.0)

    def test_bounding_diagonal(self):
        d = nf.bounding_diagonal(HOLED)
        assert d.type_id == LINESTRING
        assert d.coords.tolist() == [[0, 0], [10, 10]]
        assert algos.length(d) == pytest.approx(math.hypot(10, 10))


# ---------------------------------------------------------------------------
# point on surface
# ---------------------------------------------------------------------------

class TestPointOnSurface:
    def test_box_center(self):
        p = nf.point_on_surface(box(2, 3, 6, 5))
        assert p.coords[0].tolist() == [4.0, 4.0]

    def test_l_shape_inside(self):
        L = poly([[0, 0], [4, 0], [4, 1], [1, 1], [1, 3], [0, 3], [0, 0]])
        p = nf.point_on_surface(L)
        x, y = p.coords[0]
        assert algos.locate_points_in_polygon(
            np.array([x]), np.array([y]), L)[0] == 2

    def test_holed_avoids_hole(self):
        # hole spans the full middle band: the widest interval at the
        # bisector is beside the hole, never inside it
        g = poly([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                 [[2, 2], [2, 8], [8, 8], [8, 2], [2, 2]])
        p = nf.point_on_surface(g)
        x, y = p.coords[0]
        assert algos.locate_points_in_polygon(
            np.array([x]), np.array([y]), g)[0] == 2

    def test_line_vertex(self):
        ln = Geometry(LINESTRING, np.array([[0.0, 0.0], [10.0, 0.0]]))
        p = nf.point_on_surface(ln)
        assert p.coords[0].tolist() in ([0.0, 0.0], [10.0, 0.0])

    def test_point_identity_and_none(self):
        p = nf.point_on_surface(Geometry(POINT, np.array([[7.0, 8.0]])))
        assert p.coords[0].tolist() == [7.0, 8.0]
        assert nf.point_on_surface(None) is None


# ---------------------------------------------------------------------------
# simplify VW
# ---------------------------------------------------------------------------

class TestSimplifyVW:
    def test_drops_small_triangle(self):
        ln = Geometry(LINESTRING, np.array(
            [[0.0, 0.0], [2.0, 0.25], [4.0, 0.0]]))
        out = nf.simplify_vw(ln, 1.0)
        assert len(out.coords) == 2
        assert algos.length(out) == pytest.approx(4.0)

    def test_keeps_large_triangle(self):
        ln = Geometry(LINESTRING, np.array(
            [[0.0, 0.0], [2.0, 3.0], [4.0, 0.0]]))
        out = nf.simplify_vw(ln, 1.0)
        assert len(out.coords) == 3

    def test_ring_floor_is_triangle(self):
        out = nf.simplify_vw(box(0, 0, 1, 1), 1e9)
        r = out.coords[0]
        assert len(r) == 4 and bool(np.all(r[0] == r[-1]))


# ---------------------------------------------------------------------------
# geometric median
# ---------------------------------------------------------------------------

class TestGeometricMedian:
    def test_rectangle_center(self):
        g = nf.geometric_median(box(0, 0, 4, 2))
        assert g.coords[0].tolist() == pytest.approx([2.0, 1.0])

    def test_gradient_vanishes(self):
        pts = np.array([[0.0, 0.0], [5.0, 0.0], [1.0, 4.0], [7.0, 3.0]])
        mp = Geometry(MULTIPOINT, [Geometry(POINT, p[None, :]) for p in pts])
        m = nf.geometric_median(mp).coords[0]
        d = np.hypot(pts[:, 0] - m[0], pts[:, 1] - m[1])
        grad = ((pts - m) / d[:, None]).sum(axis=0)
        assert float(np.hypot(*grad)) < 1e-6

    def test_collinear_is_middle(self):
        mp = Geometry(MULTIPOINT, [
            Geometry(POINT, np.array([[0.0, 0.0]])),
            Geometry(POINT, np.array([[1.0, 0.0]])),
            Geometry(POINT, np.array([[10.0, 0.0]])),
        ])
        m = nf.geometric_median(mp).coords[0]
        assert m.tolist() == pytest.approx([1.0, 0.0], abs=1e-6)

    def test_vertex_hit_stays(self):
        # coincident pair dominates: median is the duplicated vertex
        mp = Geometry(MULTIPOINT, [
            Geometry(POINT, np.array([[0.0, 0.0]])),
            Geometry(POINT, np.array([[0.0, 0.0]])),
            Geometry(POINT, np.array([[1.0, 0.0]])),
        ])
        # (duplicates collapse in the vertex set; the unique-point median
        # of {(0,0),(1,0)} is anywhere on the segment — Weiszfeld from the
        # mean lands mid-segment; just require a finite on-segment answer)
        m = nf.geometric_median(mp).coords[0]
        assert 0.0 <= m[0] <= 1.0 and abs(m[1]) < 1e-9


# ---------------------------------------------------------------------------
# SQL surface
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("spark")
class TestSQL:
    def test_sql_names(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_IsPolygonCW(ST_ForcePolygonCW(g)) AS cw, "
            "       ST_AsText(ST_PointOnSurface(g)) AS pos, "
            "       ST_Area(ST_Expand(g, CAST(1.0 AS DOUBLE))) AS ea, "
            "       ST_AsText(ST_BoundingDiagonal(g)) AS bd, "
            "       ST_NumGeometries(ST_Multi(g)) AS nm, "
            "       ST_NPoints(ST_RemoveRepeatedPoints("
            "           ST_GeomFromText('LINESTRING(0 0, 0 0, 1 1)'), "
            "           CAST(0.0 AS DOUBLE))) AS rrp, "
            "       ST_OrderingEquals(g, g) AS oeq, "
            "       ST_AsText(ST_GeometricMedian(g)) AS gm "
            "FROM (SELECT ST_MakeEnvelope(0.0D, 0.0D, 4.0D, 2.0D) AS g)"
        ).collect()[0]
        assert row.cw and row.oeq
        assert row.pos == "POINT (2 1)"
        assert row.ea == pytest.approx(24.0)
        assert row.bd == "LINESTRING (0 0, 4 2)"
        assert row.nm == 1 and row.rrp == 2
        assert row.gm == "POINT (2 1)"

    def test_sql_simplify_vw(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_NPoints(ST_SimplifyVW("
            "  ST_GeomFromText('LINESTRING(0 0, 2 0.25, 4 0)'), "
            "  CAST(1.0 AS DOUBLE))) AS n, "
            "  ST_AsText(ST_Normalize(ST_MakeEnvelope(1.0D,2.0D,5.0D,7.0D))) AS nrm"
        ).collect()[0]
        assert row.n == 2
        assert row.nrm.startswith("POLYGON ((1 2, 1 7")


# ---------------------------------------------------------------------------
# longitude wrapping
# ---------------------------------------------------------------------------

class TestLongitude:
    def test_shift_involution(self):
        g = wkb.from_wkt("POINT (-170 10)")
        s = nf.shift_longitude(g)
        assert s.coords[0].tolist() == [190.0, 10.0]
        assert nf.shift_longitude(s).coords[0].tolist() == [-170.0, 10.0]

    def test_shift_line(self):
        g = wkb.from_wkt("LINESTRING (179 0, -179 1)")
        s = nf.shift_longitude(g)
        assert s.coords[:, 0].tolist() == [179.0, 181.0]

    def test_wrapx_moves_left_components(self):
        g = wkb.from_wkt("MULTIPOINT ((-170 0), (170 0))")
        out = nf.wrap_x(g, 0.0, 360.0)
        xs = sorted(p.coords[0, 0] for p in out.coords)
        assert xs == [170.0, 190.0]

    def test_wrapx_negative_move(self):
        g = wkb.from_wkt("MULTIPOINT ((-170 0), (170 0))")
        out = nf.wrap_x(g, 0.0, -360.0)
        xs = sorted(p.coords[0, 0] for p in out.coords)
        assert xs == [-190.0, -170.0]

    def test_wrapx_crossing_component_stays(self):
        g = wkb.from_wkt("LINESTRING (-10 0, 10 0)")
        out = nf.wrap_x(g, 0.0, 360.0)
        assert out.coords[:, 0].tolist() == [-10.0, 10.0]

    def test_sql(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_X(ST_ShiftLongitude(ST_Point(-170.0D, 0.0D))) AS sx, "
            "ST_X(ST_WrapX(ST_Point(-170.0D, 0.0D), 0.0D, 360.0D)) AS wx"
        ).collect()[0]
        assert row.sx == 190.0 and row.wx == 190.0


# ---------------------------------------------------------------------------
# minimum clearance
# ---------------------------------------------------------------------------

class TestMinimumClearance:
    def test_box_is_short_side(self):
        assert nf.minimum_clearance(box(0, 0, 4, 2)) == 2.0

    def test_vertex_to_segment(self):
        g = wkb.from_wkt("LINESTRING (0 0, 10 0, 10 10, 1 0.5)")
        assert nf.minimum_clearance(g) == pytest.approx(0.5)

    def test_line_realizes_it(self):
        ln = nf.minimum_clearance(box(0, 0, 4, 2), want_line=True)
        assert algos.length(ln) == pytest.approx(2.0)

    def test_degenerate_infinite(self):
        assert nf.minimum_clearance(wkb.from_wkt("POINT (1 1)")) == math.inf

    def test_sql(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_MinimumClearance(ST_MakeEnvelope(0D,0D,4D,2D)) AS c, "
            "ST_Length(ST_MinimumClearanceLine("
            "  ST_MakeEnvelope(0D,0D,4D,2D))) AS l"
        ).collect()[0]
        assert row.c == 2.0 and row.l == 2.0
