"""BM25: hand-computed reference values + semantics pins."""

from __future__ import annotations

import math

import pytest

from sedona_db_spark.operators.bm25 import bm25_scores, bm25_search


def _ref_bm25(corpus, query, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus.items()}
    toks = {i: t for i, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    q = sorted(set(w.lower() for w in query))
    df = {w: sum(1 for t in toks.values() if w in t) for w in q}
    out = {}
    for i, t in toks.items():
        s = 0.0
        for w in q:
            tf = t.count(w)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            out[i] = s
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "quick quick quick fox",
    3: "a lazy afternoon with no animals at all",
    4: "fox and dog and fox again",
    5: "",  # empty doc: excluded from N and avgdl
    6: "dog",
}


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id int, text string")
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(df, ["fox", "dog"]).collect()}
    want = _ref_bm25(CORPUS, ["fox", "dog"])
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_rare_term_outranks_common(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id int, text string")
    # "jumps" appears once in one doc; "quick" in two docs
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(df, ["jumps"]).collect()}
    assert set(got) == {1}
    assert got[1] > 0


def test_bm25_search_topk_order(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id int, text string")
    want = _ref_bm25(CORPUS, ["fox", "dog"])
    order = sorted(want, key=lambda i: (-want[i], i))[:2]
    got = bm25_search(df, ["fox", "dog"], k=2).collect()
    assert [r["doc_id"] for r in got] == order


def test_bm25_query_case_and_dupes(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id int, text string")
    a = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["FOX"]).collect()}
    c = {r["doc_id"]: r["bm25"]
         for r in bm25_scores(df, ["fox", "fox"]).collect()}
    assert a == c


def test_bm25_empty_query_raises(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id int, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, [])


def test_bm25_partitioning_invariance(spark):
    df = spark.createDataFrame(list(CORPUS.items()), "doc_id int, text string")
    a = {r["doc_id"]: r["bm25"]
         for r in bm25_scores(df.repartition(1), ["fox", "lazy"]).collect()}
    d = {r["doc_id"]: r["bm25"]
         for r in bm25_scores(df.repartition(5), ["fox", "lazy"]).collect()}
    assert set(a) == set(d)
    for i in a:
        assert a[i] == pytest.approx(d[i], abs=1e-14)
