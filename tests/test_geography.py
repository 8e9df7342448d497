"""Geography join tests — the antimeridian case from the reference's
test_sjoin.py geography suite (FIXTURES.md §4): two point sets straddling
the antimeridian join on the sphere but not on the plane."""

import numpy as np

from sedona_db_spark.geometry import wkb
from sedona_db_spark.operators.spatial_join import geography_dwithin_join, spatial_join


def _pts(spark, xs, ys, name):
    rows = [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(np.array(xs), np.array(ys)))]
    return spark.createDataFrame(rows, f"{name} LONG, geometry BINARY")


def test_antimeridian_geography_join(spark):
    # west of the antimeridian expressed as lon < -180 vs east side ~ +175
    A = _pts(spark, [-185.0, -179.0, -175.5], [0.0, 5.0, -5.0], "aid")
    B = _pts(spark, [175.0, 181.0, 184.5], [0.0, 5.0, -5.0], "bid")
    geo = geography_dwithin_join(A, B, distance_m=100_000.0)
    rows = {(r["aid"], r["bid"]) for r in geo.collect()}
    # -185 == 175 on the sphere; -179 ~ 181; -175.5 ~ 184.5
    assert rows == {(0, 0), (1, 1), (2, 2)}

    # the planar join at the same tolerance-in-degrees finds nothing
    planar = spatial_join(A, B, predicate="dwithin", distance=1.0)
    assert planar.count() == 0


def test_geography_close_pairs_only(spark):
    A = _pts(spark, [0.0, 10.0], [0.0, 10.0], "aid")
    B = _pts(spark, [0.1, 120.0], [0.0, 40.0], "bid")
    geo = geography_dwithin_join(A, B, distance_m=50_000.0)
    rows = {(r["aid"], r["bid"]) for r in geo.collect()}
    assert rows == {(0, 0)}  # ~11 km apart; everything else is far
