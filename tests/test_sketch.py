"""HyperLogLog sketch: accuracy, merge semantics, null handling.

The construction is deterministic (md5-derived registers), so the merge
test asserts EXACT register-table equality, not just estimate closeness.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sedona_db_spark.operators.sketch import (
    hll_count_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _vals(spark, n, prefix="v", dup=1):
    rows = [(f"{prefix}{i % n}",) for i in range(n * dup)]
    return spark.createDataFrame(rows, "v string")


def test_estimate_within_expected_error(spark):
    # standard HLL error is ~1.04/sqrt(m); allow 4 sigma
    n, p = 2000, 10
    df = _vals(spark, n, dup=3)  # duplicates must not change the estimate
    est = hll_count_distinct(df, "v", p=p).collect()[0]["hll_est"]
    tol = 4 * 1.04 / math.sqrt(1 << p)
    assert abs(est - n) / n < tol


def test_small_range_linear_counting(spark):
    # 30 distinct values in m=256 registers -> linear-counting branch,
    # which is near-exact at this fill factor
    df = _vals(spark, 30)
    est = hll_count_distinct(df, "v", p=8).collect()[0]["hll_est"]
    assert abs(est - 30) < 3


def test_grouped_and_nulls_ignored(spark):
    rows = [("a", f"x{i}") for i in range(50)] + [
        ("b", f"y{i}") for i in range(10)
    ] + [("a", None), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {
        r["g"]: r["hll_est"]
        for r in hll_count_distinct(df, "v", ["g"], p=8).collect()
    }
    assert abs(out["a"] - 50) < 6 and abs(out["b"] - 10) < 3


def test_merge_equals_union_sketch(spark):
    a = _vals(spark, 500, prefix="a")
    b = _vals(spark, 500, prefix="b")
    merged = hll_merge(
        hll_sketch(a, "v", p=8), hll_sketch(b, "v", p=8)
    )
    direct = hll_sketch(a.unionByName(b), "v", p=8)
    # deterministic construction -> exact register equality
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    est = hll_estimate(merged, p=8).collect()[0]["hll_est"]
    assert abs(est - 1000) / 1000 < 4 * 1.04 / math.sqrt(256)


def test_register_table_bounded(spark):
    # the shuffle payload is at most m rows per group regardless of input
    df = _vals(spark, 5000)
    assert hll_sketch(df, "v", p=4).count() <= 16


def test_p_validation():
    with pytest.raises(ValueError):
        hll_sketch(None, "v", p=3)
    with pytest.raises(ValueError):
        hll_sketch(None, "v", p=13)


# --- count-min sketch --------------------------------------------------------

def test_cms_never_underestimates_and_tight_when_wide(spark):
    from pyspark.sql import functions as F

    from sedona_db_spark.operators.sketch import cms_estimate, cms_sketch

    # zipf-ish: key k appears ~ 1000/k times
    rows = [(f"dom{k}.com",) for k in range(1, 40) for _ in range(1000 // k)]
    df = spark.createDataFrame(rows, "d string")
    exact = {r["d"]: r["n"] for r in
             df.groupBy("d").agg(F.count("*").alias("n")).collect()}
    W, D = 1 << 12, 4
    sk = cms_sketch(df, "d", W, D)
    vals = df.select("d").distinct()
    est = {r["d"]: r["cms_est"] for r in
           cms_estimate(sk, vals, "d", W, D).collect()}
    n_total = sum(exact.values())
    for d, n in exact.items():
        assert est[d] >= n                       # never under
        assert est[d] - n <= 2.72 * n_total / W + 1  # eps*N bound

    # sketch row count is bounded by depth*width
    assert sk.count() <= W * D


def test_cms_merge_equals_whole(spark):
    from sedona_db_spark.operators.sketch import cms_merge, cms_sketch

    df = spark.createDataFrame([(f"k{i % 17}", i % 2) for i in range(500)],
                               "d string, half int")
    a = cms_sketch(df.where("half = 0"), "d", 256, 3)
    b = cms_sketch(df.where("half = 1"), "d", 256, 3)
    merged = sorted(map(tuple, cms_merge(a, b).collect()))
    whole = sorted(map(tuple, cms_sketch(df, "d", 256, 3).collect()))
    assert merged == whole


def test_cms_unseen_key_estimates_low(spark):
    from sedona_db_spark.operators.sketch import cms_estimate, cms_sketch

    df = spark.createDataFrame([(f"k{i}",) for i in range(50)], "d string")
    sk = cms_sketch(df, "d", 1 << 12, 4)
    probe = spark.createDataFrame([("never-seen-key-xyz",)], "d string")
    est = cms_estimate(sk, probe, "d", 1 << 12, 4).collect()[0]["cms_est"]
    assert 0 <= est <= 2  # collisions only


def test_cms_param_guards(spark):
    import pytest as _pytest

    from sedona_db_spark.operators.sketch import cms_sketch

    df = spark.createDataFrame([("a",)], "d string")
    with _pytest.raises(ValueError, match="width"):
        cms_sketch(df, "d", width=1, depth=4)
    with _pytest.raises(ValueError, match="depth"):
        cms_sketch(df, "d", width=256, depth=0)


def test_cms_estimate_plan_broadcasts_sketch(spark):
    from sedona_db_spark.operators.sketch import cms_estimate, cms_sketch

    df = spark.createDataFrame([(f"k{i % 17}",) for i in range(200)], "d string")
    sk = cms_sketch(df, "d", 256, 3)
    plan = cms_estimate(sk, df.distinct(), "d", 256, 3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_cms_weighted_turnstile(spark):
    from pyspark.sql import functions as F

    from sedona_db_spark.operators.sketch import cms_estimate, cms_sketch

    df = spark.createDataFrame(
        [(f"k{i % 9}", (i % 9) + 1) for i in range(270)], "d string, w long")
    sk = cms_sketch(df, "d", 1 << 12, 4, weight_col="w")
    exact = {r["d"]: r["s"] for r in
             df.groupBy("d").agg(F.sum("w").alias("s")).collect()}
    est = {r["d"]: r["cms_est"] for r in
           cms_estimate(sk, df.select("d").distinct(), "d", 1 << 12, 4).collect()}
    for d, s in exact.items():
        assert est[d] >= s  # never under, for non-negative weights
        assert est[d] - s <= 2.72 * sum(exact.values()) / (1 << 12) + 1
