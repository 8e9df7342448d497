"""Bloom-filter membership: no false negatives, deterministic false
positives, SQL-exact hash arithmetic, packed-bitset == join formulation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sedona_db_spark.operators.bloom import (
    bloom_build,
    bloom_filter_out,
    bloom_positions,
    bloom_probe,
)

M, K = 1 << 12, 4


def _positions_py(value: str, m: int, k: int) -> list[int]:
    hx = hashlib.md5(value.encode("utf-8")).hexdigest()
    h1 = int(hx[0:8], 16) % m
    h2 = int(hx[8:18], 16) % (m - 1) + 1
    return [(h1 + j * h2) % m for j in range(k)]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"host{i % 97}.example{i % 7}.com") for i in range(600)]
    return spark.createDataFrame(rows, "id int, url string")


@pytest.fixture(scope="module")
def exclude(spark):
    rows = [(f"host{i % 97}.example{i % 7}.com",) for i in range(0, 600, 3)]
    return spark.createDataFrame(rows, "url string")


def test_positions_column_matches_python(spark):
    vals = ["a", "ab", "xyz", "host3.example1.com", "ünïcode"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["v"]: list(r["p"])
        for r in df.select("v", bloom_positions(F.col("v"), M, K).alias("p")).collect()
    }
    for v in vals:
        assert got[v] == _positions_py(v, M, K), v


def test_no_false_negatives(corpus, exclude):
    bits = bloom_build(exclude, "url", M, K)
    probed = bloom_probe(exclude.distinct(), "url", bits, M, K)
    rows = probed.collect()
    assert rows and all(r["maybe_in_set"] for r in rows)


def test_probe_matches_join_formulation(spark, corpus, exclude):
    """Packed-bitset probe == 'all k positions among the set bits' join."""
    bits = bloom_build(exclude, "url", M, K)
    probed = {
        r["id"]: r["maybe_in_set"]
        for r in bloom_probe(corpus, "url", bits, M, K).collect()
    }
    set_bits = {
        r["pos"]
        for r in exclude.select(
            F.explode(bloom_positions(F.col("url"), M, K)).alias("pos")
        ).collect()
    }
    for r in corpus.collect():
        expect = all(p in set_bits for p in _positions_py(r["url"], M, K))
        assert probed[r["id"]] == expect, r["url"]


def test_filter_out_drops_all_members(corpus, exclude):
    kept = bloom_filter_out(corpus, "url", exclude, "url", M, K)
    kept_urls = {r["url"] for r in kept.collect()}
    excl = {r["url"] for r in exclude.collect()}
    assert not (kept_urls & excl)
    # with m=4096, n~200 distinct, k=4 the FP rate is ~1e-3 — the kept set
    # must retain nearly all innocents (>= 90% leaves huge slack)
    innocents = {r["url"] for r in corpus.collect()} - excl
    assert len(kept_urls) >= 0.9 * len(innocents)


def test_null_probes_null(spark, exclude):
    bits = bloom_build(exclude, "url", M, K)
    df = spark.createDataFrame([(1, None), (2, "host0.example0.com")],
                               "id int, url string")
    got = {r["id"]: r["maybe_in_set"] for r in bloom_probe(df, "url", bits, M, K).collect()}
    assert got[1] is None and got[2] is True


def test_mergeable_across_shards(spark, exclude):
    a = exclude.where(F.length("url") % 2 == 0)
    b = exclude.where(F.length("url") % 2 == 1)
    merged = (
        bloom_build(a, "url", M, K)
        .unionByName(bloom_build(b, "url", M, K))
        .groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    whole = bloom_build(exclude, "url", M, K)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_build_bounded_rows(exclude):
    bits = bloom_build(exclude, "url", M, K)
    assert bits.count() <= M // 64


def test_partitioning_invariance(corpus, exclude):
    bits = bloom_build(exclude.repartition(7), "url", M, K)
    one = bloom_probe(corpus.repartition(5), "url", bits, M, K).collect()
    two = bloom_probe(corpus.coalesce(1), "url",
                      bloom_build(exclude.coalesce(1), "url", M, K), M, K).collect()
    assert sorted((r["id"], r["maybe_in_set"]) for r in one) == \
           sorted((r["id"], r["maybe_in_set"]) for r in two)


def test_param_guards(spark, exclude):
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(exclude, "url", m_bits=(1 << 31), k=4)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(exclude, "url", m_bits=100, k=4)
    with pytest.raises(ValueError, match="k must"):
        bloom_build(exclude, "url", m_bits=1 << 12, k=0)


def test_probe_plan_has_no_join(corpus, exclude):
    """The probe is a map-side bitset test: no join, no corpus shuffle."""
    bits = bloom_build(exclude, "url", M, K)
    plan = bloom_probe(corpus, "url", bits, M, K)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
