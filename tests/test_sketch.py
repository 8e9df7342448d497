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


# ---------------------------------------------------------------------------
# HDR quantile sketch
# ---------------------------------------------------------------------------

import numpy as np

from sedona_db_spark.operators.sketch import (
    hdr_merge,
    hdr_quantiles,
    hdr_sketch,
)


def _rank_quantile(vals, q):
    """The sketch's rank rule on raw values: r = max(1, ceil(q*n))."""
    s = sorted(vals)
    r = max(1, math.ceil(q * len(s)))
    return s[r - 1]


def test_hdr_exact_below_subbucket_range(spark):
    # every value < 2^7 -> buckets are the values themselves: quantiles
    # match the exact rank rule with zero error
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 128, 500).tolist()
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    got = {r["q"]: r["est"]
           for r in hdr_quantiles(hdr_sketch(df, "v"), [0.5, 0.9, 0.99]).collect()}
    for q in (0.5, 0.9, 0.99):
        assert got[q] == _rank_quantile(vals, q)


def test_hdr_relative_error_bound(spark):
    # heavy-tailed values: decoded estimate within 2^(1-sbits) relative
    # error of the exact rank quantile, and never above it
    rng = np.random.default_rng(11)
    vals = np.exp(rng.uniform(0, 20, 2000)).astype(np.int64).tolist()
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    sk = hdr_sketch(df, "v", sbits=7)
    got = {r["q"]: r["est"] for r in hdr_quantiles(sk, [0.5, 0.9, 0.99],
                                                   sbits=7).collect()}
    for q in (0.5, 0.9, 0.99):
        exact = _rank_quantile(vals, q)
        assert got[q] <= exact
        assert got[q] >= exact * (1 - 2 ** (1 - 7)) - 1


def test_hdr_merge_equals_whole(spark):
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 1 << 30, 1000).tolist()
    df = spark.createDataFrame([(int(v), int(v) % 3) for v in vals],
                               "v long, shard int")
    whole = hdr_sketch(df, "v")
    shards = [hdr_sketch(df.where(F.col("shard") == i), "v")
              for i in range(3)]
    merged = hdr_merge(*shards)
    a = sorted((r["bucket"], r["cnt"]) for r in whole.collect())
    b = sorted((r["bucket"], r["cnt"]) for r in merged.collect())
    assert a == b


def test_hdr_grouped_and_bounded(spark):
    rng = np.random.default_rng(17)
    rows = [(int(v), ["a", "b"][i % 2])
            for i, v in enumerate(rng.integers(0, 1 << 40, 4000))]
    df = spark.createDataFrame(rows, "v long, g string")
    sk = hdr_sketch(df, "v", group_cols=["g"], sbits=5)
    # register table bounded by ~52 * 2^sbits per group
    per_g = {r["g"]: r["c"] for r in
             sk.groupBy("g").agg(F.count("*").alias("c")).collect()}
    assert all(c <= 52 * 32 for c in per_g.values())
    qs = hdr_quantiles(sk, [0.5], group_cols=["g"], sbits=5).collect()
    assert {r["g"] for r in qs} == {"a", "b"}
    for r in qs:
        grp = [v for v, g in rows if g == r["g"]]
        exact = _rank_quantile(grp, 0.5)
        assert exact * (1 - 2 ** (1 - 5)) - 1 <= r["est"] <= exact


def test_hdr_guards(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        hdr_sketch(df, "v", sbits=1)
    with pytest.raises(ValueError):
        hdr_quantiles(hdr_sketch(df, "v"), [0.0])
    big = spark.createDataFrame([(1 << 53,)], "v long")
    with pytest.raises(Exception, match="2\\^52"):
        hdr_sketch(big, "v").collect()
    # negatives and NULLs skipped, not crashed
    mixed = spark.createDataFrame([(-5,), (None,), (3,)], "v long")
    assert hdr_sketch(mixed, "v").count() == 1
