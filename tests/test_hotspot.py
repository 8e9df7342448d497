"""Getis-Ord Gi* hotspot operator vs a NumPy reference implementation."""

import numpy as np
import pytest

from sedona_db_spark.operators.hotspot import getis_ord_gstar


def reference_gstar(cells):
    """cells: dict (cx, cy) -> v. Returns dict cell -> gi*."""
    keys = list(cells)
    vals = np.array([cells[k] for k in keys], dtype=float)
    n = len(vals)
    xbar = vals.mean()
    s = np.sqrt((vals ** 2).mean() - xbar ** 2)
    out = {}
    for (cx, cy) in keys:
        nb = [cells[(cx + dx, cy + dy)]
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              if (cx + dx, cy + dy) in cells]
        si, ni = sum(nb), len(nb)
        denom = s * np.sqrt((n * ni - ni * ni) / (n - 1))
        out[(cx, cy)] = (si - xbar * ni) / denom
    return out


@pytest.fixture(scope="module")
def lattice(spark):
    rng = np.random.RandomState(3)
    cells = {}
    for cx in range(12):
        for cy in range(10):
            if rng.rand() < 0.85:           # holes: missing cells are no-data
                cells[(cx, cy)] = float(rng.poisson(5))
    # plant one hot blob
    for dx in (0, 1):
        for dy in (0, 1):
            cells[(3 + dx, 3 + dy)] = 60.0
    df = spark.createDataFrame(
        [(cx, cy, v) for (cx, cy), v in cells.items()],
        "cx long, cy long, value double")
    return df, cells


class TestGiStar:
    def test_matches_reference(self, spark, lattice):
        df, cells = lattice
        got = {(r.cx, r.cy): r.gi_star
               for r in getis_ord_gstar(df).collect()}
        want = reference_gstar(cells)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-9), k

    def test_hot_blob_is_hottest(self, spark, lattice):
        df, cells = lattice
        rows = getis_ord_gstar(df).collect()
        top = max(rows, key=lambda r: r.gi_star)
        assert (top.cx, top.cy) in {(3, 3), (3, 4), (4, 3), (4, 4)}
        assert top.gi_star > 3.0            # significant at any alpha

    def test_n_i_counts_observed_only(self, spark, lattice):
        df, cells = lattice
        got = {(r.cx, r.cy): r.n_i for r in getis_ord_gstar(df).collect()}
        for (cx, cy), ni in got.items():
            want = sum((cx + dx, cy + dy) in cells
                       for dx in (-1, 0, 1) for dy in (-1, 0, 1))
            assert ni == want

    def test_plan_has_no_cartesian(self, spark, lattice):
        df, _ = lattice
        plan = (getis_ord_gstar(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
