"""ST_Affine / ST_Rotate / ST_Scale / ST_SnapToGrid /
ST_MinimumBoundingCircle|Radius (functions/st.py, geometry/algos.py).

PostGIS-named affine family — pure coordinate math, so every case here
is checked against a closed-form recompute.  The MBC kernel (Welzl,
deterministic move-to-front) is pinned on shapes whose smallest
enclosing circle is known exactly: a rectangle (half-diagonal), a
segment (midpoint), an obtuse triangle (longest side's diametral
circle), and an acute triangle (circumcircle).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sedona_db_spark.geometry import algos, wkb


def _g(wkt):
    return wkb.from_wkt(wkt)


def _coords(g):
    return [tuple(p) for p in g.all_coords()[:, :2].tolist()]


# --------------------------------------------------------------------------
# kernel: affine / rotate / scale
# --------------------------------------------------------------------------

def test_affine_identity_and_translate():
    g = _g("LINESTRING (1 2, 3 4)")
    out = algos.affine_2d(g, 1, 0, 0, 1, 10.0, -5.0)
    assert _coords(out) == [(11.0, -3.0), (13.0, -1.0)]


def test_rotate_quarter_turn():
    g = _g("POINT (1 0)")
    out = algos.rotate(g, math.pi / 2)
    x, y = _coords(out)[0]
    assert abs(x) < 1e-12 and abs(y - 1.0) < 1e-12


def test_rotate_preserves_area_and_perimeter():
    g = _g("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")
    out = algos.rotate(g, 0.7)
    assert abs(algos.area(out) - 8.0) < 1e-9
    assert abs(algos.perimeter(out) - 12.0) < 1e-9


def test_scale_area_law():
    g = _g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    out = algos.scale(g, 3.0, 0.5)
    assert abs(algos.area(out) - 4.0 * 1.5) < 1e-12


def test_affine_preserves_zm():
    g = _g("POINT ZM (1 2 7 9)")
    out = algos.affine_2d(g, 0, -1, 1, 0, 0, 0)
    arr = out.all_coords()
    assert out.has_z and out.has_m
    assert arr[0].tolist() == [-2.0, 1.0, 7.0, 9.0]


# --------------------------------------------------------------------------
# kernel: snap_to_grid
# --------------------------------------------------------------------------

def test_snap_point_and_line_dedup():
    g = _g("LINESTRING (0.1 0.1, 0.2 0.2, 1.04 0.98)")
    out = algos.snap_to_grid(g, 0.5)
    # first two vertices snap to the same grid node -> deduped
    assert _coords(out) == [(0.0, 0.0), (1.0, 1.0)]


def test_snap_collapsed_line_is_empty():
    out = algos.snap_to_grid(_g("LINESTRING (0.1 0.1, 0.2 0.2)"), 1.0)
    assert out.type_id == wkb.LINESTRING and len(out.coords) == 0


def test_snap_polygon_keeps_ring_closed():
    g = _g("POLYGON ((0.1 0.1, 3.9 0.1, 3.9 2.1, 0.1 2.1, 0.1 0.1))")
    out = algos.snap_to_grid(g, 1.0)
    ring = [tuple(p) for p in out.coords[0][:, :2].tolist()]
    assert ring[0] == ring[-1]
    assert abs(algos.area(out) - 8.0) < 1e-12


def test_snap_collapsed_ring_is_empty_polygon():
    g = _g("POLYGON ((0.1 0.1, 0.4 0.1, 0.4 0.4, 0.1 0.4, 0.1 0.1))")
    out = algos.snap_to_grid(g, 10.0)
    assert out.type_id == wkb.POLYGON and len(out.coords) == 0


def test_snap_rejects_nonpositive_size():
    with pytest.raises(ValueError):
        algos.snap_to_grid(_g("POINT (1 1)"), 0.0)


# --------------------------------------------------------------------------
# kernel: minimum bounding circle
# --------------------------------------------------------------------------

def _mbc(wkt):
    return algos.minimum_bounding_circle(_g(wkt))


def test_mbc_rectangle_half_diagonal():
    cx, cy, r = _mbc("POLYGON ((0 0, 6 0, 6 8, 0 8, 0 0))")
    assert abs(cx - 3.0) < 1e-9 and abs(cy - 4.0) < 1e-9
    assert abs(r - 5.0) < 1e-9


def test_mbc_segment_midpoint():
    cx, cy, r = _mbc("LINESTRING (0 0, 10 0)")
    assert (cx, cy) == (5.0, 0.0) and abs(r - 5.0) < 1e-12


def test_mbc_single_point_zero_radius():
    cx, cy, r = _mbc("POINT (3 4)")
    assert (cx, cy, r) == (3.0, 4.0, 0.0)


def test_mbc_obtuse_triangle_diametral():
    # (0,0) (10,0) (5,1): obtuse at the apex -> circle on the long side
    cx, cy, r = _mbc("POLYGON ((0 0, 10 0, 5 1, 0 0))")
    assert abs(cx - 5.0) < 1e-9 and abs(cy) < 1e-9 and abs(r - 5.0) < 1e-9


def test_mbc_acute_triangle_circumcircle():
    # equilateral-ish: circumcircle through all three vertices
    pts = [(0.0, 0.0), (4.0, 0.0), (2.0, 2.0 * math.sqrt(3))]
    wkt = "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in pts + [pts[0]]) + "))"
    cx, cy, r = _mbc(wkt)
    for x, y in pts:
        assert abs(math.hypot(x - cx, y - cy) - r) < 1e-9


def test_mbc_contains_all_vertices_fuzz():
    import numpy as np

    rng = np.random.default_rng(42)
    for _ in range(50):
        pts = rng.uniform(-100, 100, size=(rng.integers(2, 40), 2))
        wkt = "MULTIPOINT (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
        cx, cy, r = _mbc(wkt)
        d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        assert (d <= r * (1 + 1e-9) + 1e-9).all()
        # minimality: some vertex ON the circle
        assert d.max() >= r * (1 - 1e-6) - 1e-9


# --------------------------------------------------------------------------
# Spark SQL surface
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sql(spark):
    from sedona_db_spark.functions.st import register_all

    register_all(spark)
    return spark


def test_sql_rotate_scale_affine(sql):
    row = sql.sql(
        "SELECT ST_AsText(ST_Rotate(ST_Point(1.0D, 0.0D), CAST(pi()/2 AS DOUBLE))) AS rot, "
        "       ST_Area(ST_Scale(ST_MakeEnvelope(0.0D,0.0D,2.0D,2.0D), 3.0D, 0.5D)) AS a, "
        "       ST_AsText(ST_Affine(ST_Point(1.0D, 2.0D), 1.0D, 0.0D, 0.0D, 1.0D, 10.0D, 20.0D)) AS tr"
    ).collect()[0]
    assert row["rot"].startswith("POINT")
    assert abs(row["a"] - 6.0) < 1e-9
    assert row["tr"] == "POINT (11 22)"


def test_sql_snap_and_mbr(sql):
    row = sql.sql(
        "SELECT ST_AsText(ST_SnapToGrid(ST_Point(1.26D, 3.74D), 0.5D)) AS snapped, "
        "       ST_MinimumBoundingRadius(ST_MakeEnvelope(0.0D,0.0D,6.0D,8.0D)) AS mbr"
    ).collect()[0]
    assert row["snapped"] == "POINT (1.5 3.5)"
    c = wkb.parse(bytes(row["mbr"]["center"]))
    assert c.coords[0].tolist()[:2] == [3.0, 4.0]
    assert abs(row["mbr"]["radius"] - 5.0) < 1e-9


def test_sql_mbc_circle_area_converges(sql):
    # 48-gon area of radius-5 circle: (1/2) n r^2 sin(2*pi/n)
    row = sql.sql(
        "SELECT ST_Area(ST_MinimumBoundingCircle(ST_MakeEnvelope(0.0D,0.0D,6.0D,8.0D))) AS a"
    ).collect()[0]
    n = 48
    expect = 0.5 * n * 25.0 * math.sin(2 * math.pi / n)
    assert abs(row["a"] - expect) < 1e-6


def test_sql_nulls_propagate(sql):
    row = sql.sql(
        "SELECT ST_Rotate(CAST(NULL AS BINARY), 1.0D) AS r, "
        "       ST_SnapToGrid(CAST(NULL AS BINARY), 1.0D) AS s, "
        "       ST_MinimumBoundingCircle(CAST(NULL AS BINARY)) AS c"
    ).collect()[0]
    assert row["r"] is None and row["s"] is None and row["c"] is None
