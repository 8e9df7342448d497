"""Property-based fuzz for the round-4g kernels (hypothesis): star
polygons exercise triangulation/interior-point/normal forms on arbitrary
simple shapes; random trajectories pin CPA laws."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st_

from sedona_db_spark.geometry import (
    algos,
    normform as nf,
    trajectory as tj,
    triangulate as tg,
    wkb,
)
from sedona_db_spark.geometry.wkb import LINESTRING, POLYGON, Geometry


def star_polygon(radii, cx=0.0, cy=0.0):
    """Simple polygon from per-spoke radii (star-shaped about the
    center, hence always non-self-intersecting)."""
    n = len(radii)
    ang = np.linspace(0.0, 2 * math.pi, n, endpoint=False)
    xs = cx + np.asarray(radii) * np.cos(ang)
    ys = cy + np.asarray(radii) * np.sin(ang)
    ring = np.column_stack([xs, ys])
    ring = np.vstack([ring, ring[:1]])
    return Geometry(POLYGON, [ring])


radii_st = st_.lists(st_.floats(0.5, 10.0), min_size=4, max_size=24)


class TestTriangulateFuzz:
    @settings(max_examples=40, deadline=None)
    @given(radii_st)
    def test_count_and_area(self, radii):
        p = star_polygon(radii)
        tris = tg.triangulate_polygon(p)
        assert len(tris.coords) == len(radii) - 2
        assert sum(algos.area(t) for t in tris.coords) == pytest.approx(
            algos.area(p), rel=1e-9)

    @settings(max_examples=25, deadline=None)
    @given(radii_st)
    def test_centroids_inside(self, radii):
        p = star_polygon(radii)
        for t in tg.triangulate_polygon(p).coords:
            c = algos.centroid(t).coords[0]
            assert algos.locate_points_in_polygon(
                np.array([c[0]]), np.array([c[1]]), p)[0] != 0


class TestNormalFormFuzz:
    @settings(max_examples=40, deadline=None)
    @given(radii_st)
    def test_normalize_idempotent_and_area(self, radii):
        p = star_polygon(radii)
        n1 = nf.normalize(p)
        assert wkb.encode(nf.normalize(n1)) == wkb.encode(n1)
        assert algos.area(n1) == pytest.approx(algos.area(p))
        assert nf.is_polygon_cw(n1)

    @settings(max_examples=40, deadline=None)
    @given(radii_st)
    def test_point_on_surface_inside(self, radii):
        p = star_polygon(radii)
        pos = nf.point_on_surface(p)
        x, y = pos.coords[0]
        assert algos.locate_points_in_polygon(
            np.array([x]), np.array([y]), p)[0] != 0

    @settings(max_examples=40, deadline=None)
    @given(radii_st)
    def test_minimum_clearance_positive_bounded(self, radii):
        p = star_polygon(radii)
        c = nf.minimum_clearance(p)
        ring = p.coords[0]
        min_edge = float(np.min(np.hypot(np.diff(ring[:, 0]),
                                         np.diff(ring[:, 1]))))
        assert 0 < c <= min_edge + 1e-9

    @settings(max_examples=30, deadline=None)
    @given(radii_st, st_.floats(0.01, 50.0))
    def test_vw_shrinks_or_keeps(self, radii, tol):
        p = star_polygon(radii)
        out = nf.simplify_vw(p, tol)
        assert len(out.coords[0]) <= len(p.coords[0])
        assert algos.area(out) <= algos.area(p) * 1.5 + tol * len(radii)


class TestCPAFuzz:
    traj_st = st_.tuples(
        st_.floats(-50, 50), st_.floats(-50, 50),
        st_.floats(-50, 50), st_.floats(-50, 50),
    )

    @settings(max_examples=40, deadline=None)
    @given(traj_st, traj_st)
    def test_symmetry_and_lower_bound(self, a4, b4):
        a = Geometry(LINESTRING, np.array(
            [[a4[0], a4[1], 0.0], [a4[2], a4[3], 10.0]]), has_m=True)
        b = Geometry(LINESTRING, np.array(
            [[b4[0], b4[1], 0.0], [b4[2], b4[3], 10.0]]), has_m=True)
        dab = tj.distance_cpa(a, b)
        dba = tj.distance_cpa(b, a)
        assert dab == pytest.approx(dba)
        # CPA distance can never beat the static min distance
        assert dab >= algos.distance(
            Geometry(LINESTRING, np.array([[a4[0], a4[1]], [a4[2], a4[3]]])),
            Geometry(LINESTRING, np.array([[b4[0], b4[1]], [b4[2], b4[3]]])),
        ) - 1e-9
        assert tj.cpa_within(a, b, dab + 1e-6) is True

    @settings(max_examples=40, deadline=None)
    @given(traj_st)
    def test_self_cpa_zero(self, a4):
        a = Geometry(LINESTRING, np.array(
            [[a4[0], a4[1], 0.0], [a4[2], a4[3], 10.0]]), has_m=True)
        assert tj.distance_cpa(a, a) == 0.0


class TestSnapFuzz:
    @settings(max_examples=30, deadline=None)
    @given(radii_st, st_.floats(0.0, 0.2))
    def test_snap_to_self_identity(self, radii, tol):
        p = star_polygon(radii)
        out = tg.snap(p, p, tol)
        # snapping a geometry to ITSELF never moves anything
        assert algos.area(out) == pytest.approx(algos.area(p))
