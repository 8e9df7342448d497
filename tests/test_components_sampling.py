"""connected_components / dedup_clusters / sampling operators.

Differential oracle: a driver-side union-find over the same edge list.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.operators.components import connected_components, dedup_clusters
from sedona_db_spark.operators.sampling import (
    domain_top_k,
    sample_bucket,
    stratified_sample,
)


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id per component
    return {x: find(x) for x in list(parent)}


@pytest.mark.parametrize("seed,n,m", [(1, 30, 25), (2, 60, 80), (3, 12, 6)])
def test_cc_random_graphs(spark, seed, n, m):
    rng = random.Random(seed)
    edges = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(m)})
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    exp = _union_find(n, edges)
    assert got == exp


def test_cc_long_chain(spark):
    # a path graph exercises multiple star rounds (diameter >> 1)
    edges = [(i, i + 1) for i in range(64)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(65)}


def test_cc_reversed_and_dup_edges(spark):
    edges = [(5, 2), (2, 5), (9, 5)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {2: 2, 5: 2, 9: 2}


def test_dedup_clusters_canonical(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(8)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 3), (3, 5), (6, 7)], "id_a long, id_b long")
    out = dedup_clusters(docs, pairs, "doc_id").collect()
    comp = {r["doc_id"]: r["component"] for r in out}
    canon = {r["doc_id"]: r["is_canonical"] for r in out}
    assert comp == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0, 6: 6, 7: 6}
    assert canon == {0: True, 1: True, 2: True, 3: False, 4: True, 5: False, 6: True, 7: False}
    # exactly one canonical per cluster
    kept = [r["doc_id"] for r in out if r["is_canonical"]]
    assert sorted(kept) == [0, 1, 2, 4, 6]


def test_stratified_sample_deterministic_and_exactable(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", {"en": 0.5, "de": 0.2}, "doc_id")
    got = sorted(r["doc_id"] for r in out.collect())
    # driver-side replica of the arithmetic
    def bucket(key, seed=1):
        return ((abs(key) % 2147483647) * 2654435761 + seed) % 2147483647 % 1000000
    exp = [i for i, lang in rows
           if bucket(i) < {"en": 500000, "de": 200000}.get(lang, 0)]
    assert got == exp
    # repartitioning must not change the kept set (determinism under retry)
    got2 = sorted(r["doc_id"] for r in
                  stratified_sample(df.repartition(7), "lang", {"en": 0.5, "de": 0.2}, "doc_id").collect())
    assert got2 == exp
    # rates in the right ballpark
    en = sum(1 for i in exp if i % 3 == 0)
    assert abs(en / 1000 - 0.5) < 0.06


def test_domain_top_k(spark):
    rows = [(i, f"dom{i % 4}", float((i * 37) % 100)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, quality double")
    out = domain_top_k(df, "domain", 5, [F.col("quality").desc()], tiebreak_col="doc_id")
    got = {(r["domain"], r["doc_id"]): r["rank_in_group"] for r in out.collect()}
    # brute force
    exp = {}
    for d in range(4):
        grp = sorted((r for r in rows if r[1] == f"dom{d}"), key=lambda r: (-r[2], r[0]))
        for rank, r in enumerate(grp[:5], 1):
            exp[(r[1], r[0])] = rank
    assert got == exp
    # salted variant returns the same kept set
    out2 = domain_top_k(df, "domain", 5, [F.col("quality").desc()],
                        tiebreak_col="doc_id", salt_replicas=4)
    got2 = {(r["domain"], r["doc_id"]): r["rank_in_group"] for r in out2.collect()}
    assert got2 == exp


def test_temperature_sample_proportions(spark):
    from sedona_db_spark.operators.sampling import temperature_sample

    # zipf-ish language mix: en 1600, de 400, fr 100, cy 25
    rows = []
    i = 0
    for lang, n in [("en", 1600), ("de", 400), ("fr", 100), ("cy", 25)]:
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, "lang", "doc_id", alpha=0.5,
                              keep_max_frac=1.0)
    by = {r["lang"]: r["n"] for r in
          kept.groupBy("lang").agg(__import__("pyspark").sql.functions
                                   .count("*").alias("n")).collect()}
    # p_g = min(1, sqrt(nmax/n)): en keeps 100%, de ~ sqrt(4)=2 -> 100%?
    # no: p_de = min(1, sqrt(1600/400)) = 1 -> everything kept when
    # keep_max_frac=1. Use keep_max_frac=0.25 for real downsampling.
    assert by["en"] == 1600 and by["cy"] == 25

    kept = temperature_sample(df, "lang", "doc_id", alpha=0.5,
                              keep_max_frac=0.25)
    by = {r["lang"]: r["n"] for r in
          kept.groupBy("lang").agg(__import__("pyspark").sql.functions
                                   .count("*").alias("n")).collect()}
    # expected kept ∝ sqrt(n): en 400, de 200, fr 100, cy 25 (p=1 capped)
    assert abs(by["en"] - 400) < 60          # hash-rule binomial noise
    assert abs(by["de"] - 200) < 40
    assert by["cy"] == 25                    # p = min(1, 0.25*8) = 1
    # flattening: en/cy kept ratio shrinks from 64x toward sqrt -> 16x
    assert by["en"] / by["cy"] < 64 / 2


def test_temperature_sample_deterministic(spark):
    from sedona_db_spark.operators.sampling import temperature_sample

    rows = [(i, "en" if i % 5 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = sorted(r["doc_id"] for r in temperature_sample(
        df.repartition(7), "lang", "doc_id", 0.5, 0.5).collect())
    b = sorted(r["doc_id"] for r in temperature_sample(
        df.coalesce(1), "lang", "doc_id", 0.5, 0.5).collect())
    assert a == b and 0 < len(a) < 1000


def test_temperature_sample_alpha_one_keeps_all(spark):
    from sedona_db_spark.operators.sampling import temperature_sample

    rows = [(i, "x" if i % 3 else "y") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    assert temperature_sample(df, "lang", "doc_id", alpha=1.0).count() == 300


def test_temperature_sample_param_guards(spark):
    import pytest as _pytest

    from sedona_db_spark.operators.sampling import temperature_sample

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with _pytest.raises(ValueError, match="alpha"):
        temperature_sample(df, "lang", "doc_id", alpha=1.5)
    with _pytest.raises(ValueError, match="keep_max_frac"):
        temperature_sample(df, "lang", "doc_id", keep_max_frac=-0.1)


def test_temperature_sample_plan_shape(spark):
    """Corpus side: ONE broadcast join of the tiny ppm table + a scalar
    filter — the corpus itself is never hash/range-exchanged."""
    from sedona_db_spark.operators.sampling import temperature_sample

    rows = [(i, "en" if i % 5 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    plan = temperature_sample(df, "lang", "doc_id", 0.5, 0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_temperature_sample_null_group_not_dropped(spark):
    """NULL-group rows are a real group (groupBy semantics) — the ppm
    join must be null-safe, not a silent filter."""
    from sedona_db_spark.operators.sampling import temperature_sample

    rows = [(i, "en") for i in range(400)] + [(1000 + i, None) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, "lang", "doc_id", alpha=0.5,
                              keep_max_frac=1.0)
    # keep_max_frac=1: en keeps all 400; null group (smaller) keeps all too
    assert kept.count() == 500
    assert kept.where("lang IS NULL").count() == 100
