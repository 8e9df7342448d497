"""tile_cut: per-tile clipping laws — areas partition the geometry,
pieces stay inside their tile, boxes clip exactly, touching tiles drop."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.operators.tiles import tile_cut
from sedona_db_spark.tiling import Grid

LEVEL = 4  # 16x16 world grid, 22.5 x 11.25 degree tiles


def _poly_df(spark, geoms):
    rows = [(i, wkb.encode(g)) for i, g in enumerate(geoms)]
    return spark.createDataFrame(rows, "gid int, geom binary")


def test_box_partition_exact(spark):
    """Axis boxes: clip areas sum EXACTLY (min/max fast path reuses the
    input doubles) and each piece is inside its tile."""
    boxes = [wkb.box(-100.0, -50.0, 30.0, 40.0),
             wkb.box(10.0, 5.0, 12.0, 6.0),          # inside one tile
             wkb.box(-180.0, -90.0, 180.0, 90.0)]    # whole world
    df = _poly_df(spark, boxes)
    out = tile_cut(df, "geom", LEVEL, id_cols=["gid"]).collect()
    g = Grid(LEVEL)
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["gid"], []).append(r)
        piece = wkb.parse(bytes(r["clip"]))
        xmin, ymin, xmax, ymax = algos.bounds(piece)
        cx0, cy0, cx1, cy1 = (g.bounds[0] + r["ix"] * g.cw,
                              g.bounds[1] + r["iy"] * g.ch,
                              g.bounds[0] + (r["ix"] + 1) * g.cw,
                              g.bounds[1] + (r["iy"] + 1) * g.ch)
        assert cx0 <= xmin and xmax <= cx1 and cy0 <= ymin and ymax <= cy1
        assert r["clip_area"] == pytest.approx(algos.area(piece), abs=0.0)
    for i, b in enumerate(boxes):
        total = sum(r["clip_area"] for r in by_gid[i])
        assert total == pytest.approx(algos.area(b), abs=1e-9)
    assert len(by_gid[1]) == 1  # small box: exactly one tile
    assert len(by_gid[2]) == 256  # whole world: every tile


def test_concave_partition_law(spark):
    """General polygons (concave, with a hole) go through the overlay
    engine; clip areas must still sum to the polygon area."""
    concave = wkb.Geometry(wkb.POLYGON, [np.array(
        [[-50.0, -30.0], [40.0, -25.0], [35.0, 20.0], [0.0, -5.0],
         [-20.0, 30.0], [-50.0, -30.0]])])
    holed = wkb.Geometry(wkb.POLYGON, [
        np.array([[-30.0, -20.0], [60.0, -20.0], [60.0, 35.0],
                  [-30.0, 35.0], [-30.0, -20.0]]),
        np.array([[0.0, 0.0], [20.0, 0.0], [20.0, 10.0], [0.0, 10.0],
                  [0.0, 0.0]]),
    ])
    df = _poly_df(spark, [concave, holed])
    out = tile_cut(df, "geom", LEVEL, id_cols=["gid"]).collect()
    sums = {}
    for r in out:
        sums[r["gid"]] = sums.get(r["gid"], 0.0) + r["clip_area"]
    assert sums[0] == pytest.approx(algos.area(concave), rel=1e-9)
    assert sums[1] == pytest.approx(algos.area(holed), rel=1e-9)


def test_boundary_touch_drops(spark):
    """A box whose edge lies exactly on a tile boundary emits no
    zero-area sliver for the touched neighbor tile."""
    g = Grid(LEVEL)
    # tile (8, 8) spans exactly [0, 22.5] x [0, 11.25]
    b = wkb.box(0.0, 0.0, g.cw, g.ch)
    df = _poly_df(spark, [b])
    rows = tile_cut(df, "geom", LEVEL, id_cols=["gid"]).collect()
    assert len(rows) == 1
    assert (rows[0]["ix"], rows[0]["iy"]) == (8, 8)
    assert rows[0]["clip_area"] == pytest.approx(g.cw * g.ch, abs=0.0)


def test_null_and_keep_clip_false(spark):
    df = spark.createDataFrame(
        [(0, wkb.encode(wkb.box(0.0, 0.0, 1.0, 1.0))), (1, None)],
        "gid int, geom binary")
    out = tile_cut(df, "geom", LEVEL, id_cols=["gid"], keep_clip=False)
    rows = out.collect()
    assert [r["gid"] for r in rows] == [0]
    assert "clip" not in out.columns and "clip_area" in out.columns


def test_partitioning_invariance(spark):
    boxes = [wkb.box(-100.0 + i, -50.0, 30.0, 40.0 - i) for i in range(6)]
    df = _poly_df(spark, boxes)
    a = sorted(map(tuple, tile_cut(df.repartition(5), "geom", LEVEL,
                                   id_cols=["gid"], keep_clip=False).collect()))
    b = sorted(map(tuple, tile_cut(df.coalesce(1), "geom", LEVEL,
                                   id_cols=["gid"], keep_clip=False).collect()))
    assert a == b


def test_non_areal_raises(spark):
    """Lineal/point input must fail loud, not silently vanish (the
    overlay engine returns EMPTY for non-areal operands)."""
    ls = wkb.Geometry(wkb.LINESTRING,
                      np.array([[0.0, 0.0], [30.0, 20.0]]))
    df = _poly_df(spark, [ls])
    with pytest.raises(Exception, match="areal"):
        tile_cut(df, "geom", LEVEL, id_cols=["gid"]).collect()
