"""DSIR importance resampling (operators/dsir.py) — hashed-n-gram
log-likelihood-ratio weights + Gumbel top-k, verified against an
independent pure-Python recomputation."""

import hashlib
import math
from collections import Counter

import pytest

from sedona_db_spark.operators.dsir import (
    dsir_resample,
    dsir_weights,
    feature_distribution,
)

RAW = [
    (1, "the cat sat on the mat"),
    (2, "buy cheap pills online now"),
    (3, "the dog sat on the log"),
    (4, "click here for free money"),
    (5, "a quiet morning by the lake"),
    (6, ""),
]
TGT = [
    (100, "the cat sat quietly"),
    (101, "a calm morning by the lake"),
    (102, "the dog sat on the porch"),
]
B = 128


def _feats(t):
    w = t.lower().split()
    return w + [f"{a} {b}" for a, b in zip(w[:-1], w[1:])]


def _bucket(f):
    return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B


def _brute():
    rc = Counter(_bucket(f) for _, t in RAW for f in _feats(t))
    tc = Counter(_bucket(f) for _, t in TGT for f in _feats(t))
    rt, tt = sum(rc.values()), sum(tc.values())
    out = {}
    for i, t in RAW:
        fs = [_bucket(f) for f in _feats(t)]
        if not fs:
            continue
        lw = sum(math.log((tc[b] + 1) / (tt + B))
                 - math.log((rc[b] + 1) / (rt + B)) for b in fs)
        out[i] = (len(fs), lw)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    return (spark.createDataFrame(RAW, ["doc_id", "text"]),
            spark.createDataFrame(TGT, ["doc_id", "text"]))


def test_weights_match_brute_force(frames):
    raw, tgt = frames
    got = {r.doc_id: (r.n_feats, r.logweight)
           for r in dsir_weights(raw, tgt, buckets=B).collect()}
    want = _brute()
    assert set(got) == set(want)  # empty doc contributes no row
    for i, (n, lw) in want.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(lw, abs=1e-9)
    # target-like docs outrank spam under the ratio
    assert got[5][1] > got[4][1] and got[1][1] > got[2][1]


def test_resample_deterministic_and_sized(frames):
    raw, tgt = frames
    s1 = sorted(r.doc_id for r in dsir_resample(raw, tgt, k=3, buckets=B).collect())
    s2 = sorted(r.doc_id for r in
                dsir_resample(raw.repartition(7), tgt, k=3, buckets=B).collect())
    assert s1 == s2 and len(s1) == 3
    # schema passthrough
    out = dsir_resample(raw, tgt, k=2, buckets=B)
    assert out.columns == ["doc_id", "text"]
    # different seed -> (possibly) different sample, still deterministic
    s3 = sorted(r.doc_id for r in
                dsir_resample(raw, tgt, k=3, buckets=B, seed=99).collect())
    s4 = sorted(r.doc_id for r in
                dsir_resample(raw, tgt, k=3, buckets=B, seed=99).collect())
    assert s3 == s4


def test_distribution_counts(frames):
    raw, _ = frames
    got = {r.bucket: r.cnt for r in
           feature_distribution(raw, buckets=B).collect()}
    want = Counter(_bucket(f) for _, t in RAW for f in _feats(t))
    assert got == dict(want)


def test_plan_shape(frames):
    raw, tgt = frames
    plan = dsir_weights(raw, tgt, buckets=B)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
