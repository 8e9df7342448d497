"""Getis-Ord Gi* hotspot operator vs a NumPy reference implementation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

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


def reference_morans(cells):
    keys = list(cells)
    vals = np.array([cells[k] for k in keys], dtype=float)
    n = len(vals)
    xbar = vals.mean()
    z = {k: cells[k] - xbar for k in keys}
    cross = ss = w = 0.0
    for (cx, cy) in keys:
        nb = [(cx + dx, cy + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
              if (dx, dy) != (0, 0) and (cx + dx, cy + dy) in cells]
        cross += z[(cx, cy)] * sum(z[k] for k in nb)
        ss += z[(cx, cy)] ** 2
        w += len(nb)
    return (n / w) * cross / ss


class TestMoransI:
    def test_matches_reference(self, spark, lattice):
        df, cells = lattice
        from sedona_db_spark.operators.hotspot import morans_i

        row = morans_i(df).collect()[0]
        assert row.i == pytest.approx(reference_morans(cells), rel=1e-9)
        assert row.e_i == pytest.approx(-1.0 / (len(cells) - 1))

    def test_stripes_negative(self, spark):
        # vertical stripes: 6 of 8 queen neighbors are the opposite color
        # (a checkerboard is ~0 under QUEEN weights — diagonals match)
        from sedona_db_spark.operators.hotspot import morans_i

        rows = [(cx, cy, float(cx % 2))
                for cx in range(10) for cy in range(10)]
        df = spark.createDataFrame(rows, "cx long, cy long, value double")
        assert morans_i(df).collect()[0].i < -0.3

    def test_blob_positive(self, spark, lattice):
        df, _ = lattice
        from sedona_db_spark.operators.hotspot import morans_i

        assert morans_i(df).collect()[0].i > 0.05


class TestLocalMorans:
    def test_quadrants_and_values(self, spark, lattice):
        df, cells = lattice
        from sedona_db_spark.operators.hotspot import local_morans_i

        got = {(r.cx, r.cy): r for r in local_morans_i(df).collect()}
        vals = np.array(list(cells.values()))
        n = len(vals)
        xbar = vals.mean()
        m2 = (vals ** 2).mean() - xbar ** 2
        for (cx, cy), r in got.items():
            nb = [cells[k] - xbar for k in
                  [(cx + dx, cy + dy) for dx in (-1, 0, 1)
                   for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
                  if k in cells]
            zi = cells[(cx, cy)] - xbar
            want = zi / m2 * (sum(nb) / len(nb))
            assert r.i_i == pytest.approx(want, rel=1e-9)
        # the hot blob is an HH island
        assert got[(3, 3)].quadrant == "HH" and got[(3, 3)].i_i > 0


class TestRipleysK:
    def test_matches_bruteforce(self, spark):
        from sedona_db_spark.operators.hotspot import ripleys_k

        rng = np.random.RandomState(2)
        pts = rng.uniform(0, 100, (300, 2))
        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in pts], "x double, y double")
        out = {r.r: (r.n_pairs, r.k)
               for r in ripleys_k(df, radii=(2.0, 5.0, 10.0)).collect()}
        d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        A = ((pts[:, 0].max() - pts[:, 0].min())
             * (pts[:, 1].max() - pts[:, 1].min()))
        for r in (2.0, 5.0, 10.0):
            n_pairs = int((d <= r).sum())
            assert out[r][0] == n_pairs
            assert out[r][1] == pytest.approx(n_pairs * A / 300 ** 2)

    def test_duplicate_points_and_recompute_stability(self, spark):
        # Duplicate coordinates: pair counting must treat coincident rows
        # as distinct points (cu*(cu-1) self-location ordered pairs) — and
        # the plan must be deterministic under recomputation even off a
        # NON-DETERMINISTIC unpersisted upstream (the old
        # monotonically_increasing_id exclusion was not).
        from sedona_db_spark.operators.hotspot import ripleys_k

        rng = np.random.RandomState(7)
        base = rng.uniform(0, 50, (120, 2)).round(0)  # rounding forces dups
        rows = [(float(x), float(y)) for x, y in base]
        df = (spark.createDataFrame(rows, "x double, y double")
              .where(F.rand(seed=11) >= -1.0))  # non-deterministic lineage
        out = ripleys_k(df, radii=(3.0, 8.0), area=50.0 * 50.0)
        got1 = {r.r: r.n_pairs for r in out.collect()}
        got2 = {r.r: r.n_pairs for r in out.collect()}  # re-evaluate lineage
        assert got1 == got2
        pts = np.array(rows)
        d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        for r in (3.0, 8.0):
            assert got1[r] == int((d <= r).sum())

    def test_clustered_beats_csr(self, spark):
        from sedona_db_spark.operators.hotspot import ripleys_k

        rng = np.random.RandomState(4)
        # 10 tight clusters: K(r) far above pi r^2 at small r
        centers = rng.uniform(10, 90, (10, 2))
        pts = np.vstack([c + rng.normal(0, 0.5, (30, 2)) for c in centers])
        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in pts], "x double, y double")
        row = {r.r: r.k for r in ripleys_k(df, radii=(2.0,),
                                           area=80.0 * 80.0).collect()}
        assert row[2.0] > 3 * np.pi * 4.0
