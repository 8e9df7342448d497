"""Distributed CPA join vs brute-force ground truth."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.geometry import trajectory as tj, wkb
from sedona_db_spark.operators.cpa_join import cpa_join


def make_traj(x0, y0, x1, y1, t0, t1):
    return bytes(wkb.encode(wkb.from_wkt(
        f"LINESTRING M ({x0} {y0} {t0}, {x1} {y1} {t1})")))


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.RandomState(7)
    lrows, rrows = [], []
    for i in range(40):
        x, y = rng.uniform(0, 60), rng.uniform(0, 60)
        lrows.append((i, make_traj(x, y, x + 10, y, 0, 10)))
    for j in range(40):
        x, y = rng.uniform(0, 60), rng.uniform(0, 60)
        # half the builds live in a disjoint time window
        t0 = 0 if j % 2 == 0 else 20
        rrows.append((j, make_traj(x + 5, y, x - 5, y, t0, t0 + 10)))
    left = spark.createDataFrame(lrows, "lid int, traj binary")
    right = spark.createDataFrame(rrows, "rid int, traj binary")
    return left, right, lrows, rrows


class TestCPAJoin:
    def test_matches_bruteforce(self, spark, frames):
        left, right, lrows, rrows = frames
        d = 3.0
        got = {(r.lid, r.rid)
               for r in cpa_join(left, right, d).select("lid", "rid").collect()}
        want = set()
        for i, lb in lrows:
            for j, rb in rrows:
                a, b = wkb.parse(lb), wkb.parse(rb)
                if tj.cpa_within(a, b, d):
                    want.add((i, j))
        assert got == want
        assert want  # non-degenerate fixture
        # and the time prefilter is doing real work: some statically-close
        # pairs are NOT co-temporal
        static_only = 0
        from sedona_db_spark.geometry import algos
        for i, lb in lrows:
            for j, rb in rrows:
                if (i, j) in want:
                    continue
                if algos.dwithin(wkb.parse(lb), wkb.parse(rb), d):
                    static_only += 1
        assert static_only > 0

    def test_column_distance(self, spark, frames):
        left, right, lrows, rrows = frames
        got = cpa_join(left, right, F.lit(1.0)).count()
        want = sum(1 for _, lb in lrows for _, rb in rrows
                   if tj.cpa_within(wkb.parse(lb), wkb.parse(rb), 1.0))
        assert got == want

    def test_same_name_disambiguation(self, spark, frames):
        left, right, *_ = frames
        out = cpa_join(left, right, 3.0)
        assert "traj" in out.columns and "traj_r" in out.columns

    def test_invalid_trajectory_raises(self, spark):
        left = spark.createDataFrame(
            [(1, bytes(wkb.encode(wkb.from_wkt("LINESTRING (0 0, 1 1)"))))],
            "lid int, traj binary")
        right = spark.createDataFrame(
            [(2, make_traj(0, 0, 1, 1, 0, 10))], "rid int, traj binary")
        with pytest.raises(Exception):
            cpa_join(left, right, 1.0).collect()


class TestPlanShape:
    def test_no_cartesian_product(self, spark, frames):
        left, right, *_ = frames
        plan = (cpa_join(left, right, 3.0)
                ._jdf.queryExecution().executedPlan().toString())
        # the candidate generator must be the grid equi-join, never a
        # cartesian/NL product — the property that survives 100x scale
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSQLSurface:
    def test_join_on_cpawithin_routes(self, spark, frames):
        from sedona_db_spark.context import SedonaContext

        left, right, lrows, rrows = frames
        con = SedonaContext(spark)
        left.createOrReplaceTempView("lanes_a")
        right.withColumnRenamed("traj", "traj_b") \
             .createOrReplaceTempView("lanes_b")
        out = con.sql(
            "SELECT a.lid, b.rid FROM lanes_a a JOIN lanes_b b "
            "ON ST_CPAWithin(a.traj, b.traj_b, 3.0)")
        got = {(r.lid, r.rid) for r in out.collect()}
        from sedona_db_spark.geometry import trajectory as tj
        want = {(i, j) for i, lb in lrows for j, rb in rrows
                if tj.cpa_within(wkb.parse(lb), wkb.parse(rb), 3.0)}
        assert got == want
        # and the plan came from the banded prefilter, not a cartesian
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


def test_seg_seg_distance_matches_scalar():
    """Vectorized segment x segment kernel (round 5) vs the scalar
    distance() decomposition: random pairs + adversarial shapes
    (crossing, touching, collinear overlap, degenerate points)."""
    import numpy as np

    from sedona_db_spark.geometry import algos, wkb

    rng = np.random.default_rng(7)
    a4 = rng.uniform(-50, 50, (300, 4))
    b4 = rng.uniform(-50, 50, (300, 4))
    # adversarial rows
    sp = [
        ([0.0, 0.0, 10.0, 0.0], [5.0, -5.0, 5.0, 5.0]),    # proper cross
        ([0.0, 0.0, 10.0, 0.0], [10.0, 0.0, 20.0, 5.0]),   # endpoint touch
        ([0.0, 0.0, 10.0, 0.0], [5.0, 0.0, 15.0, 0.0]),    # collinear overlap
        ([0.0, 0.0, 10.0, 0.0], [12.0, 0.0, 20.0, 0.0]),   # collinear gap
        ([1.0, 2.0, 1.0, 2.0], [4.0, 6.0, 4.0, 6.0]),      # point x point
        ([1.0, 2.0, 1.0, 2.0], [0.0, 0.0, 10.0, 0.0]),     # point x seg
        ([0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]),      # identical pts
    ]
    a4 = np.vstack([a4] + [np.array([p[0]]) for p in sp])
    b4 = np.vstack([b4] + [np.array([p[1]]) for p in sp])
    got = algos.seg_seg_distance(a4, b4)
    for i in range(len(a4)):
        ga = wkb.from_wkt(
            f"LINESTRING ({a4[i,0]} {a4[i,1]}, {a4[i,2]} {a4[i,3]})")
        gb = wkb.from_wkt(
            f"LINESTRING ({b4[i,0]} {b4[i,1]}, {b4[i,2]} {b4[i,3]})")
        want = algos.distance(ga, gb)
        assert got[i] == pytest.approx(want, abs=1e-12), i


def test_decode_seg4_layouts():
    import numpy as np

    from sedona_db_spark.geometry import wkb

    bufs = [
        wkb.encode(wkb.from_wkt("LINESTRING (1 2, 3 4)")),
        wkb.encode(wkb.from_wkt("LINESTRING M (1 2 0, 3 4 10)")),
        wkb.encode(wkb.from_wkt("POINT (7 8)")),
        wkb.encode(wkb.from_wkt("LINESTRING (0 0, 1 1, 2 2)")),  # 3 pts
        wkb.encode(wkb.from_wkt("LINESTRING Z (1 2 5, 3 4 6)")),  # Z layout
        None,
    ]
    out, rec = wkb.decode_seg4(bufs)
    assert rec.tolist() == [True, True, True, False, False, False]
    assert out[0].tolist() == [1.0, 2.0, 3.0, 4.0]
    assert out[1].tolist() == [1.0, 2.0, 3.0, 4.0]
    assert out[2].tolist() == [7.0, 8.0, 7.0, 8.0]
