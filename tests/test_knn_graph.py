"""kNN graph over embeddings: exactness at full probe, mutual filter."""

import numpy as np
import pytest

from sedona_db_spark.operators.similarity import knn_graph


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(5)
    rows = [(i, rng.randn(16).tolist()) for i in range(60)]
    return (spark.createDataFrame(rows, "vec_id int, embedding array<double>"),
            {i: np.array(v) for i, v in rows})


def brute(vectors, k):
    ids = sorted(vectors)
    want = {}
    for i in ids:
        vi = vectors[i]
        sims = sorted(
            ((float(vi @ vectors[j] /
                    (np.linalg.norm(vi) * np.linalg.norm(vectors[j]))), -j)
             for j in ids if j != i), reverse=True)
        want[i] = [-j for _, j in sims[:k]]
    return want


class TestKnnGraph:
    def test_exact_at_full_probe(self, spark, emb):
        df, vectors = emb
        g = knn_graph(df, k=3, nlists=8, nprobe=8, centroids="first_n")
        got = {}
        for r in g.collect():
            got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
        got = {q: [n for _, n in sorted(v)] for q, v in got.items()}
        assert got == brute(vectors, 3)

    def test_no_self_edges(self, spark, emb):
        df, _ = emb
        g = knn_graph(df, k=3, nlists=8, nprobe=8, centroids="first_n")
        assert g.where("query_id = neighbor_id").count() == 0

    def test_mutual_subset(self, spark, emb):
        df, vectors = emb
        full = knn_graph(df, k=3, nlists=8, nprobe=8, centroids="first_n")
        mut = knn_graph(df, k=3, nlists=8, nprobe=8, centroids="first_n",
                        mutual=True)
        fe = {(r.query_id, r.neighbor_id) for r in full.collect()}
        me = {(r.query_id, r.neighbor_id) for r in mut.collect()}
        assert me <= fe
        for (a, b) in me:
            assert (b, a) in fe      # both directions ranked
        assert 0 < len(me) < len(fe)

    def test_approx_recall(self, spark, emb):
        df, vectors = emb
        g = knn_graph(df, k=3, nlists=8, nprobe=4)
        got = {(r.query_id, r.neighbor_id) for r in g.collect()}
        want = {(q, n) for q, ns in brute(vectors, 3).items() for n in ns}
        recall = len(got & want) / len(want)
        assert recall >= 0.6           # nprobe/nlists = 0.5 of the corpus
