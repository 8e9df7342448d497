"""Delaunay / Voronoi / concave hull (geometry/delaunay.py +
functions/st.py wrappers): empty-circumcircle law, triangle-count and
area-partition invariants, Voronoi grid squares, chi-shape behavior."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.geometry.delaunay import (
    chi_concave_hull,
    delaunay,
    voronoi_cells,
)


def _hull_points(pts):
    P = sorted(set(map(tuple, pts)))

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower, upper = [], []
    for p in P:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    for p in reversed(P):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def _hull_area(pts):
    h = _hull_points(pts)
    return abs(sum(h[i][0] * h[(i + 1) % len(h)][1]
                   - h[(i + 1) % len(h)][0] * h[i][1]
                   for i in range(len(h)))) / 2


def _tri_area(pts, t):
    a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
    return abs((b[0] - a[0]) * (c[1] - a[1])
               - (b[1] - a[1]) * (c[0] - a[0])) / 2


@pytest.mark.parametrize("seed,n", [(3, 50), (7, 200), (11, 500)])
def test_delaunay_invariants(seed, n):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 100, (n, 2))
    tris = delaunay(pts)
    h = len(_hull_points(pts))
    assert len(tris) == 2 * (n - h) + h - 2
    # area partition
    assert abs(sum(_tri_area(pts, t) for t in tris)
               - _hull_area(pts)) < 1e-6
    # empty circumcircle (brute force, relative tolerance)
    for t in tris[:60]:
        ax, ay = pts[t[0]]
        bx, by = pts[t[1]]
        cx, cy = pts[t[2]]
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
              + (cx * cx + cy * cy) * (ay - by)) / d
        uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
              + (cx * cx + cy * cy) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        assert (d2 >= r2 * (1 - 1e-9)).all()


def test_delaunay_degenerate():
    assert delaunay(np.array([[0.0, 0.0], [1.0, 1.0]])) == []
    # all collinear
    assert delaunay(np.array([[float(i), float(i)] for i in range(10)])) == []
    # duplicates collapse
    pts = np.array([[0, 0], [1, 0], [0, 1], [0, 0], [1, 0]], dtype=float)
    assert len(delaunay(pts)) == 1


def test_voronoi_grid_is_unit_squares():
    gx, gy = np.meshgrid(np.arange(5.0), np.arange(5.0))
    grid = np.column_stack([gx.ravel(), gy.ravel()])
    cells = voronoi_cells(grid, envelope=(-0.5, -0.5, 4.5, 4.5))
    assert len(cells) == 25
    for site, cell in zip(grid, cells):
        xs = [p[0] for p in cell]
        ys = [p[1] for p in cell]
        a = abs(sum(xs[i] * ys[(i + 1) % len(cell)]
                    - xs[(i + 1) % len(cell)] * ys[i]
                    for i in range(len(cell)))) / 2
        assert abs(a - 1.0) < 1e-9
        assert abs(min(xs) - (site[0] - 0.5)) < 1e-9
        assert abs(max(ys) - (site[1] + 0.5)) < 1e-9


def test_voronoi_cells_partition_envelope():
    rng = np.random.default_rng(13)
    pts = rng.uniform(0, 10, (40, 2))
    env = (-2.0, -2.0, 12.0, 12.0)
    cells = voronoi_cells(pts, envelope=env)
    total = 0.0
    for c in cells:
        xs = [p[0] for p in c]
        ys = [p[1] for p in c]
        total += abs(sum(xs[i] * ys[(i + 1) % len(c)]
                         - xs[(i + 1) % len(c)] * ys[i]
                         for i in range(len(c)))) / 2
    assert abs(total - 14.0 * 14.0) < 1e-6


def test_chi_hull_convex_limit_and_concavity():
    theta = np.linspace(0, 1.5 * math.pi, 40)
    pts = np.vstack([
        np.column_stack([np.cos(theta) * 10, np.sin(theta) * 10]),
        np.column_stack([np.cos(theta) * 6, np.sin(theta) * 6]),
    ])
    cvx = chi_concave_hull(pts, 1.0)
    assert len(cvx) == len(_hull_points(pts))
    chi = chi_concave_hull(pts, 0.2)
    # the chi shape hugs the C: strictly more vertices, smaller area
    def ring_area(r):
        return abs(sum(r[i][0] * r[(i + 1) % len(r)][1]
                       - r[(i + 1) % len(r)][0] * r[i][1]
                       for i in range(len(r)))) / 2
    assert len(chi) > len(cvx)
    assert ring_area(chi) < ring_area(cvx)
    with pytest.raises(ValueError):
        chi_concave_hull(pts, 0.0)


def _mp(pts):
    return wkb.encode(wkb.Geometry(
        wkb.MULTIPOINT, [wkb.point(float(x), float(y)) for x, y in pts]))


def test_spark_functions(spark):
    from sedona_db_spark.functions import st

    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 50, (60, 2)).round(3)
    df = spark.createDataFrame([(1, _mp(pts))], "id long, geom binary")
    row = df.select(
        st.ST_DelaunayTriangles(F.col("geom")).alias("tri"),
        st.ST_VoronoiPolygons(F.col("geom")).alias("vor"),
        st.ST_ConcaveHull(F.col("geom"), F.lit(1.0)).alias("hull"),
    ).first()
    tri = wkb.parse(bytes(row["tri"]))
    assert tri.type_id == wkb.GEOMETRYCOLLECTION
    n, h = len(pts), len(_hull_points(pts))
    assert len(tri.coords) == 2 * (n - h) + h - 2
    tri_area = sum(algos.area(p) for p in tri.coords)
    hull = wkb.parse(bytes(row["hull"]))
    assert hull.type_id == wkb.POLYGON
    assert abs(algos.area(hull) - tri_area) < 1e-6  # both = convex hull area
    vor = wkb.parse(bytes(row["vor"]))
    assert vor.type_id == wkb.GEOMETRYCOLLECTION
    assert len(vor.coords) == len(pts)

    # SQL registration
    st.register_all(spark)
    df.createOrReplaceTempView("_dl_t")
    got = spark.sql(
        "SELECT ST_NumGeometries(ST_DelaunayTriangles(geom)) AS k "
        "FROM _dl_t").first()["k"]
    assert got == 2 * (n - h) + h - 2
