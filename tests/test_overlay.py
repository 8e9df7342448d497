"""General polygon boolean overlay (geometry/overlay.py) — the from-scratch
replacement for the reference's GEOS overlay kernels
(`c/sedona-geos/src/overlay.rs` in /root/reference), exercised the way the
reference's overlay tests exercise GEOS
(`python/sedonadb/tests/functions/test_functions.py` intersection/union/
difference cases): concave shapes, holes, shared edges, degenerate contact.
"""

import numpy as np
import pytest

from sedona_db_spark.functions.st import (
    _difference,
    _intersection,
    _is_valid,
    _symdifference,
    _union,
)
from sedona_db_spark.geometry import algos, overlay, wkb

P = wkb.from_wkt


def sq(x0, y0, x1, y1):
    return P(f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")


L_SHAPE = P("POLYGON ((0 0, 4 0, 4 1, 1 1, 1 4, 0 4, 0 0))")


class TestPolygonOverlay:
    def test_overlapping_squares(self):
        a, b = sq(0, 0, 4, 4), sq(2, 2, 6, 6)
        assert algos.area(overlay.polygon_overlay(a, b, "intersection")) == 4.0
        assert algos.area(overlay.polygon_overlay(a, b, "union")) == 28.0
        assert algos.area(overlay.polygon_overlay(a, b, "difference")) == 12.0
        assert algos.area(overlay.polygon_overlay(a, b, "symdifference")) == 24.0

    def test_concave_intersection(self):
        box = sq(0.5, 0.5, 3, 3)
        out = overlay.polygon_overlay(L_SHAPE, box, "intersection")
        # vertical arm 0.5x2.5 + horizontal arm 2.0x0.5
        assert algos.area(out) == pytest.approx(2.25, abs=1e-9)

    def test_hole_preserved_in_difference(self):
        a, b = sq(0, 0, 10, 10), sq(3, 3, 7, 7)
        out = overlay.polygon_overlay(a, b, "difference")
        assert out.type_id == wkb.POLYGON
        assert len(out.coords) == 2  # shell + hole
        assert algos.area(out) == 84.0

    def test_union_fills_hole_partially(self):
        donut = P(
            "POLYGON ((0 0,10 0,10 10,0 10,0 0),(3 3,3 7,7 7,7 3,3 3))"
        )
        out = overlay.polygon_overlay(donut, sq(4, 4, 6, 6), "union")
        assert algos.area(out) == 88.0

    def test_intersection_through_hole(self):
        donut = P(
            "POLYGON ((0 0,10 0,10 10,0 10,0 0),(4 4,4 8,8 8,8 4,4 4))"
        )
        out = overlay.polygon_overlay(donut, sq(6, 6, 12, 12), "intersection")
        assert algos.area(out) == 12.0  # [6,10]^2 minus hole part [6,8]^2

    def test_identical_inputs(self):
        a = sq(0, 0, 10, 10)
        assert algos.area(overlay.polygon_overlay(a, a, "intersection")) == 100.0
        assert algos.area(overlay.polygon_overlay(a, a, "union")) == 100.0
        assert overlay.polygon_overlay(a, a, "difference").is_empty

    def test_shared_edge_degenerates_to_line(self):
        out = overlay.polygon_overlay(sq(0, 0, 10, 10), sq(10, 0, 20, 10), "intersection")
        assert out.type_id == wkb.LINESTRING
        assert algos.length(out) == 10.0

    def test_point_touch_degenerates_to_point(self):
        out = overlay.polygon_overlay(sq(0, 0, 2, 2), sq(2, 2, 4, 4), "intersection")
        assert out.type_id == wkb.POINT

    def test_disjoint_union_is_multipolygon(self):
        out = overlay.polygon_overlay(sq(0, 0, 1, 1), sq(5, 5, 6, 6), "union")
        assert out.type_id == wkb.MULTIPOLYGON
        assert algos.area(out) == 2.0

    def test_multipolygon_inputs(self):
        mp = wkb.Geometry(
            wkb.MULTIPOLYGON, [sq(0, 0, 2, 2), sq(5, 5, 7, 7)]
        )
        big = sq(1, 1, 6, 6)
        assert algos.area(overlay.polygon_overlay(mp, big, "intersection")) == 2.0
        assert algos.area(overlay.polygon_overlay(mp, big, "union")) == 31.0

    def test_fractional_coords_consistency(self):
        a = sq(0.1, 0.1, 4.7, 4.7)
        b = P("POLYGON ((2.3 0.0, 6.1 1.7, 3.3 5.9, 2.3 0.0))")
        ia = algos.area(overlay.polygon_overlay(a, b, "intersection"))
        ua = algos.area(overlay.polygon_overlay(a, b, "union"))
        da = algos.area(overlay.polygon_overlay(a, b, "difference"))
        A, B = algos.area(a), algos.area(b)
        assert ua == pytest.approx(A + B - ia, abs=1e-8)
        assert da == pytest.approx(A - ia, abs=1e-8)

    def test_triangle_clip(self):
        t = P("POLYGON ((0 0, 8 0, 0 8, 0 0))")
        assert algos.area(overlay.polygon_overlay(t, sq(2, 2, 6, 6), "intersection")) == pytest.approx(8.0)


class TestUnionAll:
    def test_chain_dissolve(self):
        gs = [sq(i, 0, i + 2, 2) for i in range(8)]
        assert algos.area(overlay.union_all(gs)) == 18.0

    def test_grid_dissolve_exact_rectangle(self):
        gs = [sq(i, j, i + 1, j + 1) for i in range(4) for j in range(3)]
        out = overlay.union_all(gs)
        assert algos.area(out) == 12.0
        assert algos.bounds(out) == (0.0, 0.0, 4.0, 3.0)


class TestStDispatch:
    def test_intersection_concave(self):
        out = _intersection(L_SHAPE, sq(0.5, 0.5, 3, 3))
        assert algos.area(out) == pytest.approx(2.25, abs=1e-9)

    def test_union_dissolves(self):
        out = _union(sq(0, 0, 2, 2), sq(1, 1, 3, 3))
        assert out.type_id == wkb.POLYGON
        assert algos.area(out) == 7.0

    def test_difference_general(self):
        out = _difference(L_SHAPE, sq(0, 0, 1, 1))
        assert algos.area(out) == pytest.approx(algos.area(L_SHAPE) - 1.0)

    def test_symdifference_general(self):
        out = _symdifference(sq(0, 0, 2, 2), sq(1, 1, 3, 3))
        assert algos.area(out) == 6.0

    def test_line_clip_by_polygon(self):
        out = _intersection(P("LINESTRING (-1 0.5, 5 0.5)"), sq(0.5, 0.5, 3, 3))
        assert wkb.to_wkt(out) == "LINESTRING (0.5 0.5, 3 0.5)"
        diff = _difference(P("LINESTRING (-1 0.5, 5 0.5)"), sq(0.5, 0.5, 3, 3))
        assert algos.length(diff) == pytest.approx(1.5 + 2.0)

    def test_line_line(self):
        a = P("LINESTRING (-1 0.5, 5 0.5)")
        assert wkb.to_wkt(_intersection(a, P("LINESTRING (2 -1, 2 2)"))) == "POINT (2 0.5)"
        shared = _intersection(a, P("LINESTRING (0 0.5, 2 0.5)"))
        assert algos.length(shared) == 2.0


class TestValidity:
    def test_large_bowtie_detected(self):
        # 99-vertex ring with two swapped vertices — the round-1 build's
        # 64-segment cutoff silently passed this (VERDICT.md item 3)
        theta = np.linspace(0, 2 * np.pi, 99, endpoint=False)
        ring = np.column_stack([np.cos(theta), np.sin(theta)])
        good = wkb.Geometry(wkb.POLYGON, [np.vstack([ring, ring[:1]])])
        assert _is_valid(good)
        bow = ring.copy()
        bow[[10, 60]] = bow[[60, 10]]
        bad = wkb.Geometry(wkb.POLYGON, [np.vstack([bow, bow[:1]])])
        assert not _is_valid(bad)

    def test_hole_outside_shell_invalid(self):
        bad = P(
            "POLYGON ((0 0,10 0,10 10,0 10,0 0),(20 20,21 20,21 21,20 21,20 20))"
        )
        assert not _is_valid(bad)


class TestBuffer:
    def test_line_buffer_area(self):
        out = overlay.buffer_geometry(P("LINESTRING (0 0, 10 0)"), 1.0)
        # 20 (rect) + pi (two half-circle caps, n-gon approx slightly under)
        assert 20 + 2.8 < algos.area(out) < 20 + np.pi + 1e-9

    def test_polygon_negative_buffer(self):
        out = overlay.buffer_geometry(sq(0, 0, 10, 10), -1.0)
        assert algos.area(out) == pytest.approx(64.0, abs=1e-9)

    def test_polygon_positive_buffer(self):
        out = overlay.buffer_geometry(sq(0, 0, 10, 10), 1.0)
        assert 100 + 40 + 2.8 < algos.area(out) < 100 + 40 + np.pi + 1e-9

    def test_bent_line_buffer_covers_vertices(self):
        line = P("LINESTRING (0 0, 5 0, 5 5)")
        out = overlay.buffer_geometry(line, 0.5)
        for x, y in [(0, 0), (5, 0), (5, 5), (2.5, 0.2)]:
            loc = algos.locate_points_in_geometry(np.array([x]), np.array([y]), out)
            assert loc[0] != algos.OUTSIDE
