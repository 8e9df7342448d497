"""Geography scalar breadth (round-2 VERDICT "Next round" items 4 and 10):
exact great-circle kernels for all 18 s2 scalar names
(/root/reference/c/sedona-s2geography/src/register.rs:21-48), including
exact edge-to-edge distance (replacing vertex sampling), true centroid,
max distance, closest point / shortest line, geography overlay via gnomonic
projection, line referencing, and >hemisphere polygons via winding parity."""

import numpy as np
import pytest

from sedona_db_spark.functions import geography as gg
from sedona_db_spark.geometry import sphere, wkb

R = gg.EARTH_RADIUS_M
DEG_M = np.pi / 180.0 * R  # meters per great-circle degree


def W(s):
    return wkb.from_wkt(s)


# ---------------------------------------------------------------------------
# exact distance
# ---------------------------------------------------------------------------


class TestExactDistance:
    def test_perpendicular_foot_beats_vertices(self):
        # point (5,1) vs equator arc lon 0..10: exact distance is 1 degree;
        # the old vertex-sampled min would report ~5.1 degrees
        d = gg.geog_distance_m(W("POINT(5 1)"), W("LINESTRING(0 0, 10 0)"))
        assert d == pytest.approx(1.0 * DEG_M, rel=1e-9)

    def test_endpoint_when_foot_outside_arc(self):
        d = gg.geog_distance_m(W("POINT(15 0)"), W("LINESTRING(0 0, 10 0)"))
        assert d == pytest.approx(5.0 * DEG_M, rel=1e-9)

    def test_crossing_arcs_zero(self):
        d = gg.geog_distance_m(
            W("LINESTRING(0 0, 10 0)"), W("LINESTRING(5 -5, 5 5)")
        )
        assert d == pytest.approx(0.0, abs=1e-6)

    def test_point_inside_polygon_zero(self):
        poly = W("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
        assert gg.geog_distance_m(W("POINT(5 5)"), poly) == pytest.approx(0.0)
        # and outside: distance to nearest edge, not nearest vertex
        d = gg.geog_distance_m(W("POINT(5 -2)"), poly)
        assert d == pytest.approx(2.0 * DEG_M, rel=1e-6)

    def test_point_point_matches_haversine(self):
        from sedona_db_spark.geometry import algos

        d = gg.geog_distance_m(W("POINT(3 7)"), W("POINT(-4 52)"))
        assert d == pytest.approx(
            float(algos.haversine_m(3.0, 7.0, -4.0, 52.0, R)), rel=0, abs=0
        )

    def test_nonpoint_beats_old_vertex_sampling(self):
        # two parallel meridian segments: exact distance is along the
        # equator between them (5 deg), vertex sampling would agree here;
        # but shifted segments expose the difference
        a = W("LINESTRING(0 -30, 0 30)")
        b = W("POINT(5 0)")
        assert gg.geog_distance_m(b, a) == pytest.approx(5.0 * DEG_M, rel=1e-9)


class TestMaxDistance:
    def test_point_vs_arc_through_antipode(self):
        # arc (170,0)→(-170,0) passes through (180,0), the antipode of (0,0)
        d = gg._geog_max_distance(W("POINT(0 0)"), W("LINESTRING(170 0, -170 0)"))
        assert d == pytest.approx(180.0 * DEG_M, rel=1e-12)

    def test_vertex_attained(self):
        d = gg._geog_max_distance(W("POINT(0 0)"), W("LINESTRING(10 0, 20 0)"))
        assert d == pytest.approx(20.0 * DEG_M, rel=1e-9)


# ---------------------------------------------------------------------------
# centroid
# ---------------------------------------------------------------------------


class TestCentroid:
    def test_octant_triangle(self):
        c = gg._geog_centroid(W("POLYGON((0 0, 90 0, 0 90, 0 0))"))
        lon, lat = c.coords[0]
        assert lon == pytest.approx(45.0, abs=1e-9)
        assert lat == pytest.approx(np.degrees(np.arctan(1 / np.sqrt(2))), abs=1e-9)

    def test_orientation_invariant(self):
        a = gg._geog_centroid(W("POLYGON((0 0, 90 0, 0 90, 0 0))"))
        b = gg._geog_centroid(W("POLYGON((0 0, 0 90, 90 0, 0 0))"))
        assert np.allclose(a.coords, b.coords, atol=1e-9)

    def test_line_centroid_on_meridian(self):
        c = gg._geog_centroid(W("LINESTRING(0 -10, 0 30)"))
        lon, lat = c.coords[0]
        assert lon == pytest.approx(0.0, abs=1e-9)
        assert lat == pytest.approx(10.0, abs=1e-9)

    def test_points_mean_direction(self):
        c = gg._geog_centroid(W("MULTIPOINT(10 0, -10 0)"))
        lon, lat = c.coords[0]
        assert lon == pytest.approx(0.0, abs=1e-9)
        assert lat == pytest.approx(0.0, abs=1e-9)

    def test_hole_shifts_centroid_away(self):
        solid = gg._geog_centroid(W("POLYGON((0 0, 20 0, 20 20, 0 20, 0 0))"))
        holed = gg._geog_centroid(W(
            "POLYGON((0 0, 20 0, 20 20, 0 20, 0 0),"
            "(12 8, 18 8, 18 12, 12 12, 12 8))"
        ))
        # hole sits on the +lon side → centroid moves to smaller lon
        assert holed.coords[0][0] < solid.coords[0][0]


# ---------------------------------------------------------------------------
# closest point / shortest line / line referencing
# ---------------------------------------------------------------------------


class TestClosestAndLineRef:
    def test_closest_point_is_foot(self):
        p = gg._geog_closest_point(W("LINESTRING(0 0, 10 0)"), W("POINT(5 3)"))
        assert p.coords[0][0] == pytest.approx(5.0, abs=1e-9)
        assert p.coords[0][1] == pytest.approx(0.0, abs=1e-9)

    def test_shortest_line_endpoints(self):
        ln = gg._geog_shortest_line(W("POINT(5 3)"), W("LINESTRING(0 0, 10 0)"))
        assert ln.coords[0][0] == pytest.approx(5.0, abs=1e-9)
        assert ln.coords[0][1] == pytest.approx(3.0, abs=1e-9)
        assert ln.coords[1][1] == pytest.approx(0.0, abs=1e-9)

    def test_interpolate_midpoint_of_long_arc(self):
        # great-circle midpoint of (0,0)→(90,0) is (45,0)
        p = gg._geog_line_interpolate(W("LINESTRING(0 0, 90 0)"), 0.5)
        assert p.coords[0][0] == pytest.approx(45.0, abs=1e-9)
        # multi-segment with unequal lengths
        p = gg._geog_line_interpolate(W("LINESTRING(0 0, 0 10, 0 30)"), 0.5)
        assert p.coords[0][1] == pytest.approx(15.0, abs=1e-9)

    def test_locate_fraction(self):
        f = gg._geog_line_locate(W("LINESTRING(0 0, 90 0)"), W("POINT(30 5)"))
        assert f == pytest.approx(1.0 / 3.0, abs=1e-9)
        assert gg._geog_line_locate(W("LINESTRING(0 0, 90 0)"), W("POINT(-10 0)")) == 0.0


# ---------------------------------------------------------------------------
# overlay + predicates
# ---------------------------------------------------------------------------


class TestOverlayAndPredicates:
    A = "POLYGON((10 10, 14 10, 14 14, 10 14, 10 10))"
    B = "POLYGON((12 12, 16 12, 16 16, 12 16, 12 12))"

    def test_intersection_union_area_identity(self):
        a, b = W(self.A), W(self.B)
        ai = gg.geog_area_m2(sphere.overlay(a, b, "intersection"))
        au = gg.geog_area_m2(sphere.overlay(a, b, "union"))
        aa, ab = gg.geog_area_m2(a), gg.geog_area_m2(b)
        # tolerance: geog_area_m2 is the Chamberlain-Duquette sum, which
        # changes slightly when overlay noding adds vertices along an edge
        # (~7e-5 rel for 4-degree edges); the identity holds to that order
        assert au == pytest.approx(aa + ab - ai, rel=5e-4)
        asym = gg.geog_area_m2(sphere.overlay(a, b, "symdifference"))
        assert asym == pytest.approx(au - ai, rel=5e-4)

    def test_self_intersection_is_identity_area(self):
        a = W(self.A)
        ai = gg.geog_area_m2(sphere.overlay(a, a, "intersection"))
        assert ai == pytest.approx(gg.geog_area_m2(a), rel=1e-9)

    def test_equals_contains_intersects(self):
        a, b = W(self.A), W(self.B)
        assert gg.geog_equals(a, W(self.A))
        assert not gg.geog_equals(a, b)
        assert gg.geog_intersects(a, b)
        assert not gg.geog_intersects(a, W("POLYGON((40 40, 41 40, 41 41, 40 40))"))
        assert gg.geog_contains(a, W("POINT(11 11)"))
        assert not gg.geog_contains(a, W("POINT(15 15)"))
        assert gg.geog_contains(a, W("LINESTRING(11 11, 13 13)"))
        assert not gg.geog_contains(a, W("LINESTRING(11 11, 15 15)"))

    def test_convex_hull_spherical(self):
        h = gg._geog_convex_hull(W("MULTIPOINT(0 0, 10 0, 10 10, 0 10, 5 5)"))
        assert h.type_id == wkb.POLYGON
        # hull of the corner points contains the interior point
        assert gg.geog_contains(h, W("POINT(5 5)"))


# ---------------------------------------------------------------------------
# > hemisphere polygons (winding parity, s2 interior-on-the-left)
# ---------------------------------------------------------------------------


class TestBeyondHemisphere:
    def _ring(self, lat, step, east=True):
        lons = range(-180, 181, step) if east else range(180, -181, -step)
        return "POLYGON((" + ",".join(f"{lon} {lat}" for lon in lons) + "))"

    def test_polar_cap_winding_orientation(self):
        # s2 interior-on-the-left: ring at lat -60 traversed EAST keeps the
        # northern 5/6 of the sphere on its left → interior includes the
        # north pole (winding kernel; the gnomonic path, when a containing
        # hemisphere exists, instead picks the hemisphere side)
        g = W(self._ring(-60, 30, east=True))
        loc = sphere.locate_points_winding(
            np.array([0.0, 0.0, 0.0]), np.array([90.0, 0.0, -90.0]), g
        )
        assert list(loc) == [2, 2, 0]

    def test_opposite_orientation_flips_interior(self):
        g = W(self._ring(-60, 30, east=False))
        loc = sphere.locate_points_winding(
            np.array([0.0, 0.0]), np.array([90.0, -90.0]), g
        )
        assert list(loc) == [0, 2]

    def test_antimeridian_band_winding(self):
        # > hemisphere ring centred on the antimeridian at lat 20
        g = W(self._ring(20, 20, east=True))
        loc = sphere.locate_points_winding(
            np.array([180.0, 180.0]), np.array([60.0, -60.0]), g
        )
        assert list(loc) == [2, 0]

    def test_boundary_detection(self):
        g = W(self._ring(-60, 30, east=True))
        loc_v = sphere.locate_points_winding(
            np.array([30.0]), np.array([-60.0]), g
        )
        assert loc_v[0] == 1

    def test_no_hemisphere_ring_falls_back_to_winding(self):
        # a ring at lat 10 with a tongue dipping to lat -80: no hemisphere
        # around the vertex mean contains it, so the gnomonic path
        # (locate_points_in_spherical_polygon) must dispatch to the winding
        # kernel instead of raising (round-2 VERDICT item 10)
        pts = [(lon, 10) for lon in range(-180, -30 + 1, 30)]
        pts += [(-20, -80), (20, -80)]
        pts += [(lon, 10) for lon in range(30, 180 + 1, 30)]
        pts.append(pts[0])
        g = W("POLYGON((" + ",".join(f"{a} {b}" for a, b in pts) + "))")
        loc = gg.locate_points_in_spherical_polygon(
            np.array([0.0, 0.0, 100.0, 0.0, 180.0]),
            np.array([90.0, -70.0, -50.0, -90.0, -60.0]),
            g,
        )
        # north pole in; the tongue interior (0,-70) in; south of the band
        # and outside the tongue out; south pole out
        assert list(loc) == [2, 2, 0, 0, 0]


# ---------------------------------------------------------------------------
# edges dispatch + Spark surface
# ---------------------------------------------------------------------------


S2_NAMES = [
    "st_area", "st_centroid", "st_closestpoint", "st_contains",
    "st_convexhull", "st_difference", "st_distance", "st_equals",
    "st_intersection", "st_intersects", "st_lineinterpolatepoint",
    "st_linelocatepoint", "st_length", "st_symdifference",
    "st_maxdistance", "st_perimeter", "st_shortestline", "st_union",
]


def test_fn_for_edges_covers_all_s2_names(spark):
    from sedona_db_spark.types import SPHERICAL, with_geom_meta

    df = spark.createDataFrame(
        [(bytes(wkb.encode(wkb.point(1.0, 2.0))),)], "geometry BINARY"
    )
    geo = with_geom_meta(df, "geometry", edges=SPHERICAL)
    for name in S2_NAMES:
        fn_g = gg.fn_for_edges(geo, "geometry", name)
        fn_p = gg.fn_for_edges(df, "geometry", name)
        assert fn_g is not None and fn_p is not None
        assert fn_g is not fn_p, name


def test_spherical_kernels_through_spark(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rows = [
        (1, bytes(wkb.encode(W("LINESTRING(0 0, 10 0)"))),
         bytes(wkb.encode(W("POINT(5 3)")))),
    ]
    df = spark.createDataFrame(rows, "id INT, g1 BINARY, g2 BINARY")
    out = df.select(
        gg.ST_Distance_Spherical("g1", "g2").alias("d"),
        gg.ST_ClosestPoint_Spherical("g1", "g2").alias("cp"),
        gg.ST_Centroid_Spherical("g1").alias("cen"),
        gg.ST_MaxDistance_Spherical("g1", "g2").alias("md"),
        gg.ST_LineInterpolatePoint_Spherical("g1", F.lit(0.5)).alias("ip"),
        gg.ST_LineLocatePoint_Spherical("g1", "g2").alias("loc"),
    ).collect()[0]
    assert out["d"] == pytest.approx(3.0 * DEG_M, rel=1e-9)
    cp = wkb.parse(bytes(out["cp"]))
    assert cp.coords[0][0] == pytest.approx(5.0, abs=1e-9)
    cen = wkb.parse(bytes(out["cen"]))
    assert cen.coords[0][0] == pytest.approx(5.0, abs=1e-6)
    assert out["md"] > out["d"]
    ip = wkb.parse(bytes(out["ip"]))
    assert ip.coords[0][0] == pytest.approx(5.0, abs=1e-9)
    assert out["loc"] == pytest.approx(0.5, abs=1e-9)
