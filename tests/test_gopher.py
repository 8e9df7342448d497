"""Gopher §A1.1 quality rules (functions/text.py::gopher_stats/gopher_keep):
each rule pinned on a hand-built document that violates exactly that rule,
plus a clean document that passes everything."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sedona_db_spark.functions import text as T

# passes every rule at min_words=10: 12 alpha words, mean len in [3,10],
# no symbols/bullets/ellipses, contains 'the' and 'of'
CLEAN = "the quick brown fox jumps over the lazy dog because of habit"


def _stats(spark, txt):
    df = spark.createDataFrame([(txt,)], "text string")
    s = T.gopher_stats(F.col("text"))
    row = df.select(
        *[v.alias(k) for k, v in s.items()],
        T.gopher_keep(F.col("text"), min_words=10, min_stop_hits=1).alias("keep"),
    ).collect()[0]
    return row


def test_clean_doc_passes(spark):
    r = _stats(spark, CLEAN)
    assert r["keep"] is True
    assert r["n_words"] == 12
    assert r["stop_hits"] == 2  # 'the', 'of'
    assert r["alpha_word_frac"] == 1.0
    assert r["symbol_word_ratio"] == 0.0


def test_word_count_bound(spark):
    r = _stats(spark, "too few words here")
    assert r["n_words"] == 4 and r["keep"] is False


def test_mean_word_length_bound(spark):
    # 12 one-char words: mean length 1 < 3
    r = _stats(spark, "a b c d e f g h i j k the")
    assert r["mean_word_len"] < 3 and r["keep"] is False


def test_symbol_word_ratio(spark):
    body = CLEAN + " " + "#tag " * 5
    r = _stats(spark, body.strip())
    assert r["symbol_word_ratio"] > 0.1 and r["keep"] is False
    # '...' counts via its character count / 3
    r2 = _stats(spark, CLEAN + " wait... what... no... really... hmm...")
    assert r2["symbol_word_ratio"] == pytest.approx(5 / 17)


def test_bullet_line_fraction(spark):
    lines = [f"- {w} bullet item" for w in CLEAN.split()]
    r = _stats(spark, "\n".join(lines))
    assert r["bullet_line_frac"] == 1.0 and r["keep"] is False
    # unicode bullets count too
    r2 = _stats(spark, "• one\n‣ two\nthree four")
    assert r2["bullet_line_frac"] == pytest.approx(2 / 3)


def test_ellipsis_line_fraction(spark):
    r = _stats(spark, "\n".join([CLEAN + "...", CLEAN + "…", CLEAN, CLEAN]))
    assert r["ellipsis_line_frac"] == pytest.approx(0.5)
    assert r["keep"] is False


def test_alpha_word_fraction(spark):
    r = _stats(spark, CLEAN + " " + "123 456 789 000 111 222")
    assert r["alpha_word_frac"] == pytest.approx(12 / 18)
    assert r["keep"] is False


def test_stopword_hits(spark):
    r = _stats(spark, "zig zag flip flop bing bong tick tock wig wam foo bar")
    assert r["stop_hits"] == 0 and r["keep"] is False
    # default threshold is >=2 of the paper's 8 indicator words
    df = spark.createDataFrame([(CLEAN,)], "text string")
    assert df.select(T.gopher_keep(F.col("text"), min_words=10).alias("k")).collect()[0]["k"] is True


def test_empty_lines_excluded_from_line_stats(spark):
    r = _stats(spark, CLEAN + "\n\n\n" + CLEAN + "...")
    # 2 non-empty lines, one ends with ellipsis
    assert r["ellipsis_line_frac"] == pytest.approx(0.5)


def test_plan_is_pure_codegen(spark):
    """No BatchEvalPython / ArrowEvalPython in the plan — the whole gate
    must stay JVM-side."""
    df = spark.createDataFrame([(CLEAN,)], "text string")
    out = df.select(T.gopher_keep(F.col("text")).alias("k"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
