"""BPE tokenizer induction tests — hand-verified merge sequences, apply
consistency, and partitioning invariance."""

import pytest

from sedona_db_spark.operators import bpe as B


def _docs(spark, texts, partitions=1):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    ).repartition(partitions)


def test_hand_verified_merges(spark):
    """corpus: 'abab' x3, 'ab' x2.
    iteration 1: pairs (a,b): 3*2+2 = 8 (best), (b,a): 3, (b,</w>): 5.
    merge (a,b) -> 'ab'. iteration 2: (ab,ab): 3, (ab,</w>): 5 (best).
    merge (ab,</w>). iteration 3: (ab,ab</w>): 3."""
    docs = _docs(spark, ["abab abab abab ab ab"])
    merges = B.train_bpe(docs, num_merges=3)
    assert merges == [("a", "b"), ("ab", "</w>"), ("ab", "ab</w>")]


def test_apply_matches_training_segmentation(spark):
    docs = _docs(spark, ["abab abab abab ab ab"])
    merges = B.train_bpe(docs, num_merges=3)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    assert B.segment_word("ab", ranks) == ["ab</w>"]
    assert B.segment_word("abab", ranks) == ["abab</w>"]
    # unseen word segments with the learned subwords, no crash
    assert B.segment_word("ababab", ranks) == ["ab", "abab</w>"]
    assert B.segment_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_distributed_apply(spark):
    docs = _docs(spark, ["abab ab", "abab abab", "ab xyz"], partitions=3)
    merges = B.train_bpe(docs, num_merges=2)
    out = {r["doc_id"]: r["bpe_tokens"] for r in B.bpe_segment(docs, merges).collect()}
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for i, t in [(0, "abab ab"), (1, "abab abab"), (2, "ab xyz")]:
        want = [s for w in t.split() for s in B.segment_word(w, ranks)]
        assert out[i] == want


def test_partitioning_invariance(spark):
    texts = ["the cat sat on the mat"] * 5 + ["a cat and a hat"] * 3
    m1 = B.train_bpe(_docs(spark, texts, partitions=1), num_merges=10)
    m2 = B.train_bpe(_docs(spark, texts, partitions=7), num_merges=10)
    assert m1 == m2


def test_merge_determinism_on_ties(spark):
    """equal-count pairs break lexicographically: 'xy' and 'yz' both occur
    once -> (x,y) merges first."""
    docs = _docs(spark, ["xy yz"])
    merges = B.train_bpe(docs, num_merges=1)
    assert merges == [("x", "y")]
