"""Tile-pyramid rollup vs the numpy cell_parent ground truth."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark import tiling
from sedona_db_spark.operators.tiles import pyramid_rollup


@pytest.fixture(scope="module")
def leaf_cells(spark):
    rng = np.random.RandomState(11)
    grid = tiling.Grid(6)
    x = rng.uniform(-180, 180, 400)
    y = rng.uniform(-90, 90, 400)
    cells = grid.cell_of_points(x, y)
    vals = rng.randint(1, 10, 400).astype(float)
    # pre-aggregate to one row per leaf cell
    agg = {}
    for c, v in zip(cells, vals):
        agg[int(c)] = agg.get(int(c), 0.0) + v
    df = spark.createDataFrame(
        [(int(c), float(v)) for c, v in agg.items()],
        "cell_id long, value double")
    return df, agg


class TestPyramidRollup:
    def test_matches_numpy(self, spark, leaf_cells):
        df, agg = leaf_cells
        got = {(r.level, r.cell_id): (r.value, r.n_children)
               for r in pyramid_rollup(df, to_level=0).collect()}
        # numpy ground truth: roll up level by level
        want = {}
        for c, v in agg.items():
            for d in range(0, 7):
                p = int(tiling.cell_parent(np.array([c]), d)[0]) if d else c
                key = (6 - d, p)
                s, n = want.get(key, (0.0, 0))
                want[key] = (s + v, n + 1)
        assert got == {k: (pytest.approx(v[0]), v[1])
                       for k, v in want.items()}

    def test_value_conserved_per_level(self, spark, leaf_cells):
        df, agg = leaf_cells
        total = sum(agg.values())
        per_level = (pyramid_rollup(df).groupBy("level")
                     .agg(F.sum("value").alias("s")).collect())
        assert len(per_level) == 7
        for r in per_level:
            assert r.s == pytest.approx(total)

    def test_root_is_single_cell(self, spark, leaf_cells):
        df, agg = leaf_cells
        roots = [r for r in pyramid_rollup(df).collect() if r.level == 0]
        assert len(roots) == 1
        assert roots[0].n_children == len(agg)

    def test_mixed_levels_raise(self, spark, leaf_cells):
        df, _ = leaf_cells
        mixed = df.union(spark.createDataFrame(
            [(int((5 << 58) | 7), 1.0)], "cell_id long, value double"))
        with pytest.raises(ValueError):
            pyramid_rollup(mixed)

    def test_one_shuffle_plan(self, spark, leaf_cells):
        df, _ = leaf_cells
        plan = (pyramid_rollup(df)
                ._jdf.queryExecution().executedPlan().toString())
        # one exchange for the ancestor groupBy (plus AQE reads) — never a
        # per-level chain of exchanges
        assert plan.count("Exchange hashpartitioning") <= 1
