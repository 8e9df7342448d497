"""Adaptive mixed-level covering + skew-robust PIP join tests."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark import tiling
from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.operators.adaptive_join import adaptive_pip_join


def _cover_cells_points(ids):
    """Map each covering cell to its own-level env for assertions."""
    envs = []
    for cid in ids:
        lvl = int(tiling.cell_level(np.array([cid]))[0])
        g = tiling.Grid(lvl)
        x0, y0, x1, y1 = g.cell_env(np.array([cid]))
        envs.append((float(x0[0]), float(y0[0]), float(x1[0]), float(y1[0])))
    return envs


def test_hierarchy_roundtrip():
    g = tiling.Grid(6)
    ids = g.cell_of_points(np.array([10.0, -120.0]), np.array([40.0, -33.0]))
    kids = tiling.cell_children(ids)
    assert len(kids) == 8
    back = tiling.cell_parent(kids)
    assert set(back.tolist()) == set(ids.tolist())
    gp = tiling.cell_parent(ids, 3)
    assert (tiling.cell_level(gp) == 3).all()
    g3 = tiling.Grid(3)
    assert set(gp.tolist()) == set(
        g3.cell_of_points(np.array([10.0, -120.0]), np.array([40.0, -33.0])).tolist()
    )


def test_adaptive_cover_disjoint_and_covers():
    rng = np.random.default_rng(7)
    for _ in range(20):
        x0, y0 = rng.uniform(-170, 100), rng.uniform(-80, 40)
        w, h = rng.uniform(0.5, 60), rng.uniform(0.5, 40)
        ids, full = tiling.adaptive_cover_env(x0, y0, x0 + w, y0 + h,
                                             max_level=10, max_cells=256)
        assert len(ids) <= 260
        envs = _cover_cells_points(ids)
        # full cells strictly inside, partial cells overlap the boundary
        for (cx0, cy0, cx1, cy1), f in zip(envs, full):
            assert cx0 <= x0 + w and cx1 >= x0 and cy0 <= y0 + h and cy1 >= y0
            if f:
                assert cx0 > x0 and cx1 < x0 + w and cy0 > y0 and cy1 < y0 + h
        # disjoint: random points fall in at most one covering cell
        pxs = rng.uniform(x0 - 1, x0 + w + 1, 300)
        pys = rng.uniform(y0 - 1, y0 + h + 1, 300)
        hit = np.zeros(300, dtype=int)
        for cid in ids:
            lvl = int(tiling.cell_level(np.array([cid]))[0])
            hit += tiling.Grid(lvl).cell_of_points(pxs, pys) == cid
        assert hit.max() <= 1
        # coverage: every point strictly inside the bbox hits exactly one
        inside = (pxs > x0) & (pxs < x0 + w) & (pys > y0) & (pys < y0 + h)
        assert (hit[inside] == 1).all()


def test_adaptive_cover_big_box_is_compact():
    # a near-hemisphere box at max_level 12 would be ~4M fine cells;
    # adaptive covering stays under the cap with coarse interior cells
    ids, full = tiling.adaptive_cover_env(-170, -80, 10, 80,
                                          max_level=12, max_cells=256)
    assert len(ids) <= 260
    assert full.any()
    lvls = tiling.cell_level(ids)
    assert lvls.min() < lvls.max()  # genuinely mixed-level


@pytest.fixture(scope="module")
def skewed(spark):
    """25 rects spanning a 128x size range + 400 probe points."""
    rng = np.random.default_rng(3)
    rects = []
    for k in range(25):
        cx = -180.0 + (k % 5) * 72.0 + 36.0
        cy = -90.0 + (k // 5) * 36.0 + 18.0
        w = 0.2 * (2.0 ** (k % 8))
        rects.append((k, bytes(wkb.encode_boxes(
            np.array([cx - w]), np.array([cy - w / 2]),
            np.array([cx + w]), np.array([cy + w / 2]))[0])))
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(-179, 179, 400), rng.uniform(-89, 89, 400)))]
    R = spark.createDataFrame(rects, "rid INT, geom BINARY")
    L = spark.createDataFrame(pts, "pid INT, x DOUBLE, y DOUBLE")
    return L, R, rects, pts


def test_adaptive_join_matches_bruteforce_rects(skewed):
    L, R, rects, pts = skewed
    out = adaptive_pip_join(L, R, predicate="within", left_xy=("x", "y"),
                            right_geom="geom", max_level=10, max_cells=64)
    got = {(r["pid"], r["rid"]) for r in out.collect()}
    want = set()
    for pid, x, y in pts:
        for rid, buf in rects:
            g = wkb.parse(buf)
            if algos.locate_points_in_geometry(
                    np.array([x]), np.array([y]), g)[0] == algos.INTERIOR:
                want.add((pid, rid))
    assert got == want
    assert len(want) > 25  # non-trivial


def test_adaptive_join_general_polygon_refines(spark):
    # concave V-polygon: envelope-full shortcut must NOT apply
    ring = np.array([[0.0, 0.0], [40.0, 0.0], [40.0, 30.0], [20.0, 10.0],
                     [0.0, 30.0], [0.0, 0.0]])
    poly = bytes(wkb.encode(wkb.Geometry(wkb.POLYGON, [ring])))
    R = spark.createDataFrame([(1, poly)], "rid INT, geom BINARY")
    pts = [(0, 20.0, 25.0),   # in envelope, in the notch -> outside
           (1, 5.0, 5.0),     # inside
           (2, 20.0, 5.0)]    # inside (below the notch)
    L = spark.createDataFrame(pts, "pid INT, x DOUBLE, y DOUBLE")
    out = adaptive_pip_join(L, R, predicate="within", left_xy=("x", "y"),
                            max_level=8, max_cells=64)
    assert {r["pid"] for r in out.collect()} == {1, 2}


def test_adaptive_join_wkb_probe_side(spark):
    # no xy columns: point WKB decoded by the vectorized helper
    pts = wkb.encode_points_xy(np.array([5.0, 100.0]), np.array([5.0, 5.0]))
    L = spark.createDataFrame(
        [(0, bytes(pts[0])), (1, bytes(pts[1]))], "pid INT, geom BINARY")
    box = bytes(wkb.encode_boxes(np.array([0.0]), np.array([0.0]),
                                 np.array([10.0]), np.array([10.0]))[0])
    R = spark.createDataFrame([(7, box)], "rid INT, g BINARY")
    out = adaptive_pip_join(L, R, predicate="within", left_geom="geom",
                            right_geom="g")
    rows = out.collect()
    assert [(r["pid"], r["rid"]) for r in rows] == [(0, 7)]
