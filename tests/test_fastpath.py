"""All-JVM fast-path tests: cell_expr codegen parity with Grid.pack, and
the left_xy + rectangle-layer spatial join producing a plan with zero
Python evaluation."""

import numpy as np

from pyspark.sql import functions as F

from sedona_db_spark.geometry import wkb
from sedona_db_spark.operators.spatial_join import spatial_join
from sedona_db_spark.tiling import Grid, cell_expr


def test_cell_expr_matches_grid_pack(spark):
    rng = np.random.default_rng(3)
    x = rng.uniform(-180, 180, 500)
    y = rng.uniform(-90, 90, 500)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x DOUBLE, y DOUBLE"
    )
    for level in (2, 7, 12):
        grid = Grid(level)
        got = [r["c"] for r in df.select(cell_expr(grid, F.col("x"), F.col("y")).alias("c")).collect()]
        want = grid.cell_of_points(x, y)
        assert got == [int(v) for v in want], f"level {level}"


def _mk_tables(spark, n=500):
    rng = np.random.default_rng(8)
    x = rng.uniform(-179, 179, n)
    y = rng.uniform(-89, 89, n)
    pts = spark.createDataFrame(
        [
            (int(i), float(a), float(b), bytes(w))
            for i, (a, b, w) in enumerate(zip(x, y, wkb.encode_points_xy(x, y)))
        ],
        "pid LONG, lon DOUBLE, lat DOUBLE, geom BINARY",
    )
    boxes = []
    for i in range(25):
        x0 = -180.0 + (i % 5) * 72.0
        y0 = -90.0 + (i // 5) * 36.0
        boxes.append((i, wkb.encode(wkb.box(x0, y0, x0 + 72.0, y0 + 36.0))))
    admin = spark.createDataFrame(boxes, "bid INT, geometry BINARY")
    return pts, admin


def test_left_xy_rect_path_agrees_with_udf_path(spark):
    pts, admin = _mk_tables(spark)
    fast = spatial_join(
        pts.select("pid", "lon", "lat"), admin, predicate="within",
        left_geom="geom", right_geom="geometry", left_xy=("lon", "lat"),
        grid_level=4,
    )
    slow = spatial_join(
        pts.select("pid", "geom"), admin, predicate="within",
        left_geom="geom", right_geom="geometry", grid_level=4,
    )
    got_f = {(r["pid"], r["bid"]) for r in fast.select("pid", "bid").collect()}
    got_s = {(r["pid"], r["bid"]) for r in slow.select("pid", "bid").collect()}
    assert got_f == got_s
    assert len(got_f) == 500  # partition of the plane


def test_left_xy_rect_path_has_no_python_in_plan(spark):
    pts, admin = _mk_tables(spark)
    fast = spatial_join(
        pts.select("pid", "lon", "lat"), admin, predicate="within",
        left_geom="geom", right_geom="geometry", left_xy=("lon", "lat"),
        grid_level=4,
    ).groupBy("bid").count()
    plan = fast._jdf.queryExecution().executedPlan().toString()
    # the probe-side pipeline must be pure JVM: the only python UDF allowed
    # is the one-off bounds computation on the 25-row rectangle layer
    probe_side = plan.split("BroadcastExchange")[0]
    assert "ArrowEvalPython" not in probe_side and "BatchEvalPython" not in probe_side


def test_rect_touches_semantics(spark):
    # point exactly on a shared box edge: touches both boxes, within neither
    pts = spark.createDataFrame(
        [(0, -108.0, 0.0)], "pid LONG, lon DOUBLE, lat DOUBLE"
    )
    boxes = []
    for i in range(25):
        x0 = -180.0 + (i % 5) * 72.0
        y0 = -90.0 + (i // 5) * 36.0
        boxes.append((i, wkb.encode(wkb.box(x0, y0, x0 + 72.0, y0 + 36.0))))
    admin = spark.createDataFrame(boxes, "bid INT, geometry BINARY")
    touches = spatial_join(pts, admin, predicate="touches", left_geom="geom",
                           right_geom="geometry", left_xy=("lon", "lat"), grid_level=4)
    within = spatial_join(pts, admin, predicate="within", left_geom="geom",
                          right_geom="geometry", left_xy=("lon", "lat"), grid_level=4)
    t = {r["bid"] for r in touches.collect()}
    assert len(t) >= 1 and within.count() == 0
