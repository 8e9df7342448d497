"""Regression tests for the round-4 broadcast-side planner restructure:
when the right side is broadcast, ONE driver collect supplies the grid
stats, the rect/areal/point full-coverage confirms and the PIP refine
map.  These pin the safety semantics of that driver-side confirm —
exactly the silent-drop family the distributed confirms existed for."""

import struct

import numpy as np

from sedona_db_spark.geometry import wkb
from sedona_db_spark.operators.spatial_join import spatial_join


def _pts(spark, xy, prefix="p"):
    rows = [
        (i, float(x), float(y), wkb.encode(wkb.point(float(x), float(y))))
        for i, (x, y) in enumerate(xy)
    ]
    return spark.createDataFrame(rows, f"{prefix}id INT, lon DOUBLE, lat DOUBLE, geom BINARY")


def test_null_geom_disqualifies_rect_path_under_broadcast(spark):
    """A NULL geometry in a broadcast rect layer must force the generic
    route (the distributed confirm counted NULLs as offenders; the
    driver-side confirm must too) — and results stay correct."""
    pts = _pts(spark, [(1.0, 1.0), (5.0, 5.0), (9.0, 9.0)])
    rects = spark.createDataFrame(
        [
            (0, wkb.encode(wkb.box(0.0, 0.0, 4.0, 4.0))),
            (1, wkb.encode(wkb.box(4.0, 4.0, 8.0, 8.0))),
            (2, None),
        ],
        "bid INT, geometry BINARY",
    )
    got = sorted(
        (r.pid, r.bid)
        for r in spatial_join(
            pts, rects, "within", "geom", "geometry", broadcast_right=True
        ).collect()
    )
    assert got == [(0, 0), (1, 1)]


def test_mixed_rect_polygon_broadcast_layer_takes_exact_refine(spark):
    """200+ rects followed by one genuine (non-rect) polygon: the sample
    DECIDES rect, the driver-side full confirm must VETO it, and the
    non-rect polygon must still match exactly."""
    pts = _pts(spark, [(0.5, 0.5), (250.0 + 0.25, 0.25)])
    rows = [
        (i, wkb.encode(wkb.box(float(i), 0.0, float(i) + 0.9, 0.9)))
        for i in range(250)
    ]
    # triangle at x=250 — bbox would claim (250.85, 0.85); exact must not
    tri = wkb.Geometry(
        wkb.POLYGON,
        [np.array([[250.0, 0.0], [250.9, 0.0], [250.0, 0.9], [250.0, 0.0]])],
    )
    rows.append((250, wkb.encode(tri)))
    polys = spark.createDataFrame(rows, "bid INT, geometry BINARY")
    got = sorted(
        (r.pid, r.bid)
        for r in spatial_join(
            pts, polys, "within", "geom", "geometry", broadcast_right=True
        ).collect()
    )
    # point (250.25, 0.25) is inside the triangle; (0.5, 0.5) in rect 0
    assert got == [(0, 0), (1, 250)]
    # bbox-corner probe: inside the triangle's bbox but OUTSIDE the triangle
    probe2 = _pts(spark, [(250.85, 0.85)])
    got2 = spatial_join(
        probe2, polys, "within", "geom", "geometry", broadcast_right=True
    ).collect()
    assert got2 == []


def test_dwithin_bigendian_point_build_under_broadcast(spark):
    """BE-encoded build points under the broadcast dwithin route: the
    driver-side confirm accepts them (decode_points_xy's generic fallback
    handles BE in the refine) and distances stay exact."""
    pts = _pts(spark, [(0.0, 0.0), (10.0, 0.0)])
    be_pt = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 0.0)
    build = spark.createDataFrame(
        [(0, be_pt), (1, wkb.encode(wkb.point(10.0, 4.0)))],
        "bid INT, geometry BINARY",
    )
    got = sorted(
        (r.pid, r.bid)
        for r in spatial_join(
            pts, build, "dwithin", "geom", "geometry",
            distance=4.5, broadcast_right=True,
        ).collect()
    )
    assert got == [(0, 0), (1, 1)]


def test_broadcast_decision_none_still_caps_and_matches(spark):
    """broadcast_right=None: the byte-cap decision runs first and the
    result matches the explicitly-shuffled join."""
    rng = np.random.default_rng(5)
    xy = rng.uniform(0, 100, (300, 2))
    pts = _pts(spark, [(float(a), float(b)) for a, b in xy])
    rects = spark.createDataFrame(
        [
            (i, wkb.encode(wkb.box(float(10 * (i % 10)), float(10 * (i // 10)),
                                   float(10 * (i % 10) + 10), float(10 * (i // 10) + 10))))
            for i in range(100)
        ],
        "bid INT, geometry BINARY",
    )
    auto = sorted(
        (r.pid, r.bid)
        for r in spatial_join(pts, rects, "within", "geom", "geometry").collect()
    )
    shuffled = sorted(
        (r.pid, r.bid)
        for r in spatial_join(
            pts, rects, "within", "geom", "geometry", broadcast_right=False
        ).collect()
    )
    assert auto == shuffled and len(auto) > 0
