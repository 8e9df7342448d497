"""Logistic-regression quality classifier (operators/classifier.py):
numpy reference differential, partitioning invariance, learning signal,
filter semantics, and plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest

from sedona_db_spark.operators.classifier import (
    LRModel,
    doc_bucket_features,
    quality_filter_lr,
    score_lr,
    train_lr_classifier,
)

DOCS = [
    (0, "good clean prose with many words here", 1),
    (1, "spam spam spam buy now buy now", 0),
    (2, "clean prose again with words", 1),
    (3, "buy buy spam now spam", 0),
    (4, "many good words of prose", 1),
    (5, "now now now buy spam buy", 0),
    (6, "prose words clean good many", 1),
    (7, "spam now buy", 0),
    (8, "", 1),           # empty: no features, never scored
    (9, "good spam prose buy", 1),  # mixed doc
]


def _mk(spark, n_parts=1):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, label int")
    return df.repartition(n_parts) if n_parts > 1 else df


def _bucket_py(word: str, buckets: int) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % buckets


def _feats_py(buckets):
    out = {}
    for did, text, y in DOCS:
        t = text.strip().lower().split()
        if not t:
            continue
        row = {}
        for w in t:
            k = _bucket_py(w, buckets)
            row[k] = row.get(k, 0) + 1
        out[did] = ({k: c / len(t) for k, c in row.items()}, y)
    return out


def _train_py(buckets, iterations, lr):
    """Reference trainer replicating the quantized update exactly."""
    feats = _feats_py(buckets)
    n = len(feats)
    w = [0.0] * buckets
    b = 0.0
    for _ in range(iterations):
        g = [0] * buckets
        bg = 0
        for did, (xs, y) in feats.items():
            s = sum(round(w[k] * x * 1e12) for k, x in xs.items()) / 1e12 + b
            p = round(1.0 / (1.0 + math.exp(-s)), 9)
            e = p - y
            for k, x in xs.items():
                g[k] += round(e * x * 1e12)
            bg += round(e * 1e12)
        for k in range(buckets):
            w[k] = round(w[k] - lr * (g[k] / 1e12) / n, 12)
        b = round(b - lr * (bg / 1e12) / n, 12)
    return w, b, n


def _score_py(w, b, buckets):
    feats = _feats_py(buckets)
    return {
        did: round(1.0 / (1.0 + math.exp(
            -(sum(round(w[k] * x * 1e12) for k, x in xs.items()) / 1e12 + b))), 9)
        for did, (xs, y) in feats.items()
    }


def test_features_match_reference(spark):
    got = {
        (r["doc_id"], r["bucket"]): r["x"]
        for r in doc_bucket_features(_mk(spark), buckets=32).collect()
    }
    want = {
        (did, k): x
        for did, (xs, _) in _feats_py(32).items()
        for k, x in xs.items()
    }
    assert got == want  # doubles from the same exact division: == is right


def test_train_matches_numpy_reference(spark):
    m = train_lr_classifier(_mk(spark), "label", buckets=32,
                            iterations=3, lr=1.0)
    w, b, n = _train_py(32, 3, 1.0)
    assert m.n_docs == n == 9
    assert m.bias == b
    assert list(m.weights) == w


def test_partitioning_invariance(spark):
    m1 = train_lr_classifier(_mk(spark, 1), "label", buckets=32, iterations=2)
    m8 = train_lr_classifier(_mk(spark, 8), "label", buckets=32, iterations=2)
    assert m1.weights == m8.weights and m1.bias == m8.bias


def test_learns_the_signal(spark):
    df = _mk(spark)
    m = train_lr_classifier(df, "label", buckets=64, iterations=10, lr=4.0)
    scores = {r["doc_id"]: r["score"] for r in score_lr(df, m).collect()}
    assert 8 not in scores  # empty doc never scored
    pos = [scores[d] for d in (0, 2, 4, 6)]
    neg = [scores[d] for d in (1, 3, 5, 7)]
    assert min(pos) > max(neg)
    got = _score_py(list(m.weights), m.bias, 64)
    assert scores == got


def test_filter_threshold(spark):
    df = _mk(spark)
    m = train_lr_classifier(df, "label", buckets=64, iterations=10, lr=4.0)
    kept = sorted(r["doc_id"] for r in
                  quality_filter_lr(df, m, threshold=0.5).collect())
    scores = {r["doc_id"]: r["score"] for r in score_lr(df, m).collect()}
    assert kept == sorted(d for d, s in scores.items() if s > 0.5)
    assert set(kept) >= {0, 2, 4, 6} and not set(kept) & {1, 3, 5, 7}


def test_scoring_plan_is_jvm_only(spark):
    """Apply path: no Python UDF stages, one broadcast weight join."""
    m = LRModel(weights=tuple([0.1] * 32), bias=0.0, buckets=32,
                n_docs=1, lr=1.0, iterations=1)
    plan = score_lr(_mk(spark), m)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_input_validation(spark):
    df = _mk(spark)
    with pytest.raises(ValueError):
        doc_bucket_features(df, buckets=1)
    with pytest.raises(ValueError):
        train_lr_classifier(df, "label", iterations=0)
    empty = spark.createDataFrame(
        [(1, "", 1)], "doc_id long, text string, label int")
    with pytest.raises(ValueError):
        train_lr_classifier(empty, "label")
