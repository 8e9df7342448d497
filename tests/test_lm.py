"""Bigram-LM perplexity filtering (operators/lm.py) — CCNet-style stage.

Parity is asserted against an independent pure-Python recomputation of
the add-one bigram model; scale shape is asserted on the physical plan
(no Python eval nodes, broadcast vocab joins)."""

import math
from collections import Counter

import pytest

from sedona_db_spark.operators.lm import (
    UNK,
    perplexity_filter,
    score_perplexity,
    train_bigram_lm,
)

DOCS = [
    (1, "The cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cat dog cat dog zebra"),
    (4, "one"),
    (5, "   "),
    (6, "Qux zap qux zap qux"),
    (7, "the the the the the the"),
]


def _brute(docs, vocab_size):
    toks = {i: t.lower().split() for i, t in docs}
    uni = Counter(w for t in toks.values() for w in t)
    vocab = {w for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]}
    v = len(vocab)
    m = lambda w: w if w in vocab else UNK  # noqa: E731
    bg = Counter()
    for t in toks.values():
        for a, b in zip(t[:-1], t[1:]):
            bg[(m(a), m(b))] += 1
    ctx = Counter()
    for (a, _), c in bg.items():
        ctx[a] += c

    def score(t):
        lps = [math.log((bg[(m(a), m(b))] + 1) / (ctx[m(a)] + v + 1))
               for a, b in zip(t[:-1], t[1:])]
        return len(lps), sum(lps), math.exp(-sum(lps) / len(lps))

    return {i: score(t) for i, t in toks.items() if len(t) >= 2}, bg, ctx, v, m


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_self_scored_parity(df):
    lm = train_bigram_lm(df, vocab_size=5)
    got = {r.doc_id: (r.n_bigrams, r.logprob, r.ppl)
           for r in score_perplexity(df, lm).collect()}
    want, *_ = _brute(DOCS, 5)
    assert set(got) == set(want)
    for i, (n, lp, ppl) in want.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(lp, abs=1e-9)
        assert got[i][2] == pytest.approx(ppl, abs=1e-9)
    # the repeated-"the" doc is the most predictable under its own LM
    assert got[7][2] == min(g[2] for g in got.values())


def test_cross_corpus_unseen_context(spark, df):
    """Scoring a corpus with contexts never seen in training must use the
    uniform 1/(V+1) fallback, not crash or drop rows."""
    lm = train_bigram_lm(df, vocab_size=5)
    other = spark.createDataFrame(
        [(100, "wholly novel words here"), (101, "the cat sat")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in score_perplexity(other, lm).collect()}
    assert set(got) == {100, 101}
    _, bg, ctx, v, m = _brute(DOCS, 5)
    # every bigram of doc 100 is (<unk>,<unk>) with some training mass —
    # recompute exactly
    t = "wholly novel words here".split()
    lps = [math.log((bg[(m(a), m(b))] + 1) / (ctx[m(a)] + v + 1))
           for a, b in zip(t[:-1], t[1:])]
    assert got[100].ppl == pytest.approx(math.exp(-sum(lps) / len(lps)), abs=1e-9)


def test_filter_keeps_short_docs_and_thresholds(df):
    lm = train_bigram_lm(df, vocab_size=5)
    want, *_ = _brute(DOCS, 5)
    thr = sorted(w[2] for w in want.values())[1]  # keep 2 scored docs
    kept = sorted(r.doc_id for r in perplexity_filter(df, lm, max_ppl=thr).collect())
    scored_kept = sorted(i for i, w in want.items() if w[2] <= thr)
    assert kept == sorted(scored_kept + [4, 5])  # <2-token docs always kept
    # schema passthrough
    out = perplexity_filter(df, lm, max_ppl=thr)
    assert out.columns == ["doc_id", "text"]


def test_partitioning_invariance(df):
    lm1 = train_bigram_lm(df.repartition(1), vocab_size=5)
    lm8 = train_bigram_lm(df.repartition(8), vocab_size=5)
    a = {r.doc_id: r.ppl for r in score_perplexity(df.repartition(3), lm1).collect()}
    b = {r.doc_id: r.ppl for r in score_perplexity(df.repartition(7), lm8).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_plan_shape(df):
    """Zero Python in the plan; the vocab-mapping joins are broadcast."""
    lm = train_bigram_lm(df, vocab_size=5)
    plan = score_perplexity(df, lm)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
