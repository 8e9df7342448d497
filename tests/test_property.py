"""Property-based tests (hypothesis) over the pure-Python geometry kernels.

The differential suites pin exact reference cases; these pin *laws* that
must hold for every input: codec round-trips, overlay area algebra,
predicate implications, and projection inverses. All kernels are
driver-side numpy — no SparkSession needed, so the suite runs in seconds.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st, HealthCheck

from sedona_db_spark.geometry import algos, overlay, proj, wkb

FINITE = st.floats(
    min_value=-1000.0, max_value=1000.0, allow_nan=False, allow_infinity=False
)


def _point(x, y):
    return wkb.Geometry(wkb.POINT, np.array([[x, y]], dtype=np.float64))


def _linestring(coords):
    return wkb.Geometry(wkb.LINESTRING, np.asarray(coords, dtype=np.float64))


def _polygon(rings):
    return wkb.Geometry(
        wkb.POLYGON, [np.asarray(r, dtype=np.float64) for r in rings]
    )


def _ring_is_simple(ring):
    from sedona_db_spark.functions.st import _ring_simple

    return _ring_simple(np.asarray(ring, dtype=np.float64))


def _rings_cross(ra, rb):
    """True if any closed segment of ring `ra` intersects any of `rb`
    (brute force — tiny rings only; independent of the engine kernels)."""
    for i in range(len(ra) - 1):
        p1, p2 = ra[i], ra[i + 1]
        d1 = p2 - p1
        for j in range(len(rb) - 1):
            p3, p4 = rb[j], rb[j + 1]
            d2 = p4 - p3
            den = d1[0] * d2[1] - d1[1] * d2[0]
            if den == 0.0:
                continue
            t = ((p3[0] - p1[0]) * d2[1] - (p3[1] - p1[1]) * d2[0]) / den
            u = ((p3[0] - p1[0]) * d1[1] - (p3[1] - p1[1]) * d1[0]) / den
            if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                return True
    return False


@st.composite
def star_polygon(draw, quantize=None):
    """A random simple ('star-shaped') polygon: quantize vertices FIRST,
    then sort by angle around their centroid (quantizing after the sort
    can reorder vertices and self-intersect — hypothesis found that), and
    finally assert simplicity with the engine's exact validity kernel."""
    from hypothesis import assume

    n = draw(st.integers(min_value=3, max_value=9))
    cx = draw(st.floats(min_value=-50, max_value=50))
    cy = draw(st.floats(min_value=-50, max_value=50))
    angles = draw(
        st.lists(
            st.floats(min_value=0.0, max_value=2 * math.pi - 1e-6),
            min_size=n, max_size=n, unique=True,
        )
    )
    radii = draw(
        st.lists(st.floats(min_value=1.0, max_value=20.0), min_size=n, max_size=n)
    )
    pts = []
    for a, r in zip(angles, radii):
        x, y = cx + r * math.cos(a), cy + r * math.sin(a)
        if quantize:
            x, y = round(x / quantize) * quantize, round(y / quantize) * quantize
        if (x, y) not in pts:
            pts.append((x, y))
    assume(len(pts) >= 3)
    qx = sum(p[0] for p in pts) / len(pts)
    qy = sum(p[1] for p in pts) / len(pts)
    ring = sorted(pts, key=lambda p: math.atan2(p[1] - qy, p[0] - qx))
    ring.append(ring[0])
    poly = _polygon([ring])
    assume(algos.area(poly) > 1.0)  # reject near-degenerate slivers
    assume(_ring_is_simple(ring))  # angle sort around centroid can still
    # self-touch for concave radius patterns; keep only truly valid rings
    return poly


class TestWkbRoundTrip:
    @given(st.lists(st.tuples(FINITE, FINITE), min_size=1, max_size=20))
    @settings(max_examples=100, deadline=None)
    def test_linestring_wkb(self, coords):
        g = _linestring(coords)
        back = wkb.parse(wkb.encode(g))
        assert back.type_id == wkb.LINESTRING
        np.testing.assert_array_equal(back.coords, g.coords)

    @given(FINITE, FINITE)
    @settings(max_examples=100, deadline=None)
    def test_point_wkb_and_wkt(self, x, y):
        g = _point(x, y)
        back = wkb.parse(wkb.encode(g))
        np.testing.assert_array_equal(back.coords, g.coords)
        # _fmt_num uses repr() for non-integers: float64-exact round trip
        back2 = wkb.from_wkt(wkb.to_wkt(g))
        np.testing.assert_array_equal(back2.coords, g.coords)

    @given(star_polygon())
    @settings(max_examples=60, deadline=None,
              suppress_health_check=[HealthCheck.filter_too_much])
    def test_polygon_wkb_and_wkt(self, poly):
        back = wkb.parse(wkb.encode(poly))
        assert back.type_id == wkb.POLYGON
        np.testing.assert_array_equal(back.coords[0], poly.coords[0])
        back2 = wkb.from_wkt(wkb.to_wkt(poly))
        np.testing.assert_array_equal(back2.coords[0], poly.coords[0])


class TestOverlayAlgebra:
    """Area laws every boolean overlay must satisfy. Coordinates are
    quantized to 1/4 so snap-rounding error is zero relative to the law
    tolerance (the engine snaps to a much finer quantum)."""

    @given(star_polygon(quantize=0.25), star_polygon(quantize=0.25))
    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.filter_too_much, HealthCheck.too_slow])
    def test_inclusion_exclusion(self, a, b):
        ai = algos.area(a)
        bi = algos.area(b)
        inter = algos.area(overlay.polygon_overlay(a, b, "intersection"))
        uni = algos.area(overlay.polygon_overlay(a, b, "union"))
        diff = algos.area(overlay.polygon_overlay(a, b, "difference"))
        sym = algos.area(overlay.polygon_overlay(a, b, "symdifference"))
        tol = 1e-6 * max(1.0, ai + bi)
        assert uni == pytest.approx(ai + bi - inter, abs=tol)
        assert diff == pytest.approx(ai - inter, abs=tol)
        assert sym == pytest.approx(ai + bi - 2 * inter, abs=tol)
        assert 0.0 <= inter <= min(ai, bi) + tol
        assert max(ai, bi) - tol <= uni <= ai + bi + tol

    @given(star_polygon(quantize=0.25))
    @settings(max_examples=30, deadline=None,
              suppress_health_check=[HealthCheck.filter_too_much])
    def test_self_overlay_identities(self, a):
        ai = algos.area(a)
        tol = 1e-6 * max(1.0, ai)
        assert algos.area(overlay.polygon_overlay(a, a, "intersection")) == pytest.approx(ai, abs=tol)
        assert algos.area(overlay.polygon_overlay(a, a, "union")) == pytest.approx(ai, abs=tol)
        assert algos.area(overlay.polygon_overlay(a, a, "difference")) == pytest.approx(0.0, abs=tol)


class TestPredicateLaws:
    @given(star_polygon(), FINITE, FINITE)
    @settings(max_examples=80, deadline=None,
              suppress_health_check=[HealthCheck.filter_too_much])
    def test_point_polygon_consistency(self, poly, x, y):
        p = _point(x, y)
        inter = algos.intersects(poly, p)
        cont = algos.contains(poly, p)
        disj = algos.disjoint(poly, p)
        assert disj == (not inter)
        if cont:
            assert inter
        assert algos.within(p, poly) == cont
        assert algos.intersects(p, poly) == inter  # symmetry

    @given(star_polygon(quantize=0.5), star_polygon(quantize=0.5))
    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.filter_too_much, HealthCheck.too_slow])
    def test_polygon_polygon_consistency(self, a, b):
        inter = algos.intersects(a, b)
        assert algos.intersects(b, a) == inter
        assert algos.disjoint(a, b) == (not inter)
        if algos.contains(a, b):
            assert inter
            assert algos.within(b, a)
            assert algos.covers(a, b)
        # overlay agrees with the predicate up to snap tolerance: a
        # positive intersection area implies intersects
        area_i = algos.area(overlay.polygon_overlay(a, b, "intersection"))
        if area_i > 1e-6:
            assert inter


class TestProjectionInverses:
    @given(st.floats(min_value=-179.9, max_value=179.9),
           st.floats(min_value=-84.0, max_value=84.0))
    @settings(max_examples=100, deadline=None)
    def test_mercator_roundtrip(self, lon, lat):
        E, N = proj.merc_forward(lon, lat)
        lon2, lat2 = proj.merc_inverse(E, N)
        assert float(lon2) == pytest.approx(lon, abs=1e-9)
        assert float(lat2) == pytest.approx(lat, abs=1e-9)

    @given(st.integers(min_value=1, max_value=60), st.booleans(),
           st.floats(min_value=-2.9, max_value=2.9),
           st.floats(min_value=-79.0, max_value=79.0))
    @settings(max_examples=80, deadline=None)
    def test_utm_roundtrip(self, zone, north, dlon, lat):
        from hypothesis import assume

        assume((lat >= 0) == north or abs(lat) < 1e-6)
        lon = proj.utm_zone_central_meridian(zone) + dlon
        E, N = proj.utm_forward(lon, lat, zone, north)
        lon2, lat2 = proj.utm_inverse(E, N, zone, north)
        assert float(lon2) == pytest.approx(lon, abs=1e-8)
        assert float(lat2) == pytest.approx(lat, abs=1e-8)

    @given(st.floats(min_value=-179.9, max_value=179.9),
           st.floats(min_value=-88.0, max_value=-45.0))
    @settings(max_examples=80, deadline=None)
    def test_antarctic_ps_roundtrip(self, lon, lat):
        p = proj.PS_CRS["EPSG:3031"]
        E, N = proj.ps_forward(lon, lat, *p)
        lon2, lat2 = proj.ps_inverse(E, N, *p)
        assert float(lon2) == pytest.approx(lon, abs=1e-9)
        assert float(lat2) == pytest.approx(lat, abs=1e-9)


class TestDistanceLaws:
    @given(st.tuples(FINITE, FINITE), st.tuples(FINITE, FINITE))
    @settings(max_examples=100, deadline=None)
    def test_symmetry_nonneg(self, p, q):
        a, b = _point(*p), _point(*q)
        d1 = algos.distance(a, b)
        d2 = algos.distance(b, a)
        assert d1 == d2 >= 0.0
        if p == q:
            assert d1 == 0.0


class TestParserTotality:
    """Corrupt inputs must raise ValueError (one catchable type), never a
    raw struct/index error — a 10^12-row corpus WILL contain bad blobs."""

    @given(st.binary(min_size=0, max_size=64))
    @settings(max_examples=300, deadline=None)
    def test_wkb_parse_total(self, buf):
        try:
            g = wkb.parse(buf)
        except (ValueError, NotImplementedError):
            return
        assert g is None or isinstance(g, wkb.Geometry)

    @given(st.binary(min_size=0, max_size=48))
    @settings(max_examples=200, deadline=None)
    def test_wkb_parse_total_prefixed(self, tail):
        # bias toward almost-valid headers (little-endian point/polygon)
        for head in (b"\x01\x01\x00\x00\x00", b"\x01\x03\x00\x00\x00",
                     b"\x01\x07\x00\x00\x00"):
            try:
                g = wkb.parse(head + tail)
            except (ValueError, NotImplementedError):
                continue
            assert g is None or isinstance(g, wkb.Geometry)

    @given(st.text(alphabet="POINTLYGEMURSC( )0123456789.,-ZM", max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_wkt_parse_total(self, s):
        try:
            g = wkb.from_wkt(s)
        except (ValueError, NotImplementedError):
            return
        assert g is None or isinstance(g, wkb.Geometry)


@st.composite
def holed_polygon(draw):
    """A quantized star shell with a small square hole around an interior
    point — exercises the overlay engine's hole plumbing under fuzz."""
    from hypothesis import assume

    shell_poly = draw(star_polygon(quantize=0.25))
    shell = [tuple(p) for p in shell_poly.coords[0]]
    ring = np.asarray(shell, dtype=np.float64)
    cx = float(np.mean(ring[:-1, 0]))
    cy = float(np.mean(ring[:-1, 1]))
    cx, cy = round(cx * 4) / 4, round(cy * 4) / 4
    h = draw(st.sampled_from([0.25, 0.5]))
    hole = [(cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h),
            (cx - h, cy + h), (cx - h, cy - h)]
    # the hole (all corners + center) must be strictly inside the shell
    hx = np.array([p[0] for p in hole] + [cx])
    hy = np.array([p[1] for p in hole] + [cy])
    ins, onb = algos.locate_points_in_ring(hx, hy, ring)
    assume(bool(np.all(ins & ~onb)))
    # ... and NO shell edge may cross the hole square: corners-inside is
    # not containment (hypothesis found a concave shell whose edge chain
    # dipped through the square between two corners — an INVALID polygon,
    # on which overlay semantics are undefined)
    assume(not _rings_cross(ring, np.asarray(hole, dtype=np.float64)))
    return _polygon([shell, hole]), shell_poly, 4 * h * h


class TestOverlayWithHoles:
    @given(holed_polygon())
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.filter_too_much, HealthCheck.too_slow])
    def test_holed_area(self, data):
        holed, shell, hole_area = data
        assert algos.area(holed) == pytest.approx(
            algos.area(shell) - hole_area, abs=1e-9
        )

    @given(holed_polygon(), star_polygon(quantize=0.25))
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.filter_too_much, HealthCheck.too_slow])
    def test_holed_overlay_laws(self, data, other):
        holed, _shell, _ha = data
        ai, bi = algos.area(holed), algos.area(other)
        inter = algos.area(overlay.polygon_overlay(holed, other, "intersection"))
        uni = algos.area(overlay.polygon_overlay(holed, other, "union"))
        diff = algos.area(overlay.polygon_overlay(holed, other, "difference"))
        tol = 1e-6 * max(1.0, ai + bi)
        assert uni == pytest.approx(ai + bi - inter, abs=tol)
        assert diff == pytest.approx(ai - inter, abs=tol)
        assert 0.0 - tol <= inter <= min(ai, bi) + tol

    @given(holed_polygon())
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.filter_too_much, HealthCheck.too_slow])
    def test_hole_is_outside(self, data):
        """The hole's center is NOT inside the holed polygon, and
        intersecting the holed polygon with itself preserves the hole."""
        holed, _shell, hole_area = data
        ring = np.asarray(holed.coords[1], dtype=np.float64)
        cx = float(np.mean(ring[:-1, 0]))
        cy = float(np.mean(ring[:-1, 1]))
        p = _point(cx, cy)
        assert not algos.contains(holed, p)
        self_i = overlay.polygon_overlay(holed, holed, "intersection")
        assert algos.area(self_i) == pytest.approx(algos.area(holed), abs=1e-6)
