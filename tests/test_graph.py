"""PageRank: numpy power-iteration differential + semantics pins."""

from __future__ import annotations

import numpy as np
import pytest

from sedona_db_spark.operators.graph import domain_link_graph, pagerank


def _np_pagerank(n, edge_list, iterations, d=0.85):
    """Reference implementation: identical semantics, dense numpy."""
    out = np.zeros(n)
    for s, _ in edge_list:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, t in edge_list:
            contrib[t] += r[s] / out[s]
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dang / n)
    return r


def test_pagerank_matches_numpy(spark):
    # 8 nodes incl. a dangling node (7) and a hub (0)
    edges = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 0), (4, 0),
             (5, 4), (6, 5), (4, 7), (5, 7)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, iterations=6).collect()}
    want = _np_pagerank(8, edges, 6)
    assert set(got) == set(range(8))
    for i in range(8):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_pagerank_mass_conserved(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 0)]  # plus node 3 has out-edge
    df = spark.createDataFrame(edges, "src int, dst int")
    ranks = pagerank(df, iterations=10).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_all_dangling(spark):
    # only destinations: every node dangles after one hop
    df = spark.createDataFrame([(0, 1)], "src int, dst int")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    want = _np_pagerank(2, [(0, 1)], 3)
    for i in (0, 1):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_pagerank_zero_iterations_uniform(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "src int, dst int")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=0).collect()}
    assert all(v == pytest.approx(1 / 3) for v in got.values())


def test_pagerank_partitioning_invariance(spark):
    edges = [(i % 11, (i * 7 + 3) % 11) for i in range(60)]
    edges = sorted(set(e for e in edges if e[0] != e[1]))
    df1 = spark.createDataFrame(edges, "src int, dst int").repartition(1)
    df8 = spark.createDataFrame(edges, "src int, dst int").repartition(8)
    r1 = {r["node"]: r["rank"] for r in pagerank(df1, iterations=5).collect()}
    r8 = {r["node"]: r["rank"] for r in pagerank(df8, iterations=5).collect()}
    assert set(r1) == set(r8)
    for k in r1:
        assert r1[k] == pytest.approx(r8[k], abs=1e-12)


def test_domain_link_graph_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e1 = sorted(map(tuple, domain_link_graph(docs).collect()))
    e2 = sorted(map(tuple, domain_link_graph(docs.repartition(7)).collect()))
    assert e1 == e2
    assert len(e1) > 0
    # simple graph, no self loops
    assert len(set(e1)) == len(e1)
    assert all(s != d for s, d in e1)
