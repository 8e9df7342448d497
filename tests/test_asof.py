"""asof_join: differential vs pandas merge_asof — keyed, global,
exact matches, tolerance, duplicate-timestamp tiebreak."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sedona_db_spark.operators.asof import asof_join


def _frames(rng, n_left=300, n_right=200, keys=4):
    trades = pd.DataFrame({
        "tid": np.arange(n_left),
        "sym": rng.integers(0, keys, n_left).astype("int64"),
        "t": rng.integers(0, 10_000, n_left).astype("int64"),
    })
    quotes = pd.DataFrame({
        "sym": rng.integers(0, keys, n_right).astype("int64"),
        "t": rng.integers(0, 10_000, n_right).astype("int64"),
        "px": np.round(rng.uniform(1, 100, n_right), 3),
    }).drop_duplicates(["sym", "t"])
    return trades, quotes


def test_keyed_matches_pandas(spark):
    rng = np.random.default_rng(7)
    trades, quotes = _frames(rng)
    lt = spark.createDataFrame(trades)
    rt = spark.createDataFrame(quotes)
    got = asof_join(lt, rt, "t", by="sym").toPandas() \
        .sort_values("tid").reset_index(drop=True)
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", by="sym", direction="backward",
    ).sort_values("tid").reset_index(drop=True)
    assert list(got["tid"]) == list(want["tid"])
    for g, w in zip(got["px_asof"], want["px"]):
        assert (pd.isna(g) and pd.isna(w)) or g == w


def test_global_matches_pandas(spark):
    rng = np.random.default_rng(9)
    trades, quotes = _frames(rng, keys=1)
    trades, quotes = trades.drop(columns=["sym"]), quotes.drop(columns=["sym"])
    quotes = quotes.drop_duplicates(["t"])
    lt = spark.createDataFrame(trades).repartition(7)
    rt = spark.createDataFrame(quotes).repartition(5)
    got = asof_join(lt, rt, "t", num_buckets=8).toPandas() \
        .sort_values("tid").reset_index(drop=True)
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", direction="backward",
    ).sort_values("tid").reset_index(drop=True)
    for g, w in zip(got["px_asof"], want["px"]):
        assert (pd.isna(g) and pd.isna(w)) or g == w
    # matched timestamps too (the carry-in correctness signal)
    wt = pd.merge_asof(trades.sort_values("t"),
                       quotes.sort_values("t").assign(qt=lambda d: d["t"]),
                       on="t", direction="backward").sort_values("tid")
    for g, w in zip(got["t_asof"], wt["qt"]):
        assert (pd.isna(g) and pd.isna(w)) or g == w


def test_exact_match_included(spark):
    lt = spark.createDataFrame(pd.DataFrame({"tid": [0], "t": [100]}))
    rt = spark.createDataFrame(pd.DataFrame({"t": [100], "px": [5.0]}))
    r = asof_join(lt, rt, "t", num_buckets=2).collect()[0]
    assert r["px_asof"] == 5.0 and r["t_asof"] == 100


def test_tolerance(spark):
    lt = spark.createDataFrame(pd.DataFrame({"tid": [0, 1], "t": [100, 500]}))
    rt = spark.createDataFrame(pd.DataFrame({"t": [90, 90], "px": [5.0, 5.0]})
                               .drop_duplicates())
    rows = {r["tid"]: r["px_asof"]
            for r in asof_join(lt, rt, "t", tolerance=50,
                               num_buckets=2).collect()}
    assert rows[0] == 5.0 and rows[1] is None


def test_duplicate_ts_tiebreak(spark):
    lt = spark.createDataFrame(pd.DataFrame({"tid": [0], "t": [100]}))
    rt = spark.createDataFrame(pd.DataFrame(
        {"t": [100, 100, 50], "seq": [1, 2, 9], "px": [1.0, 2.0, 9.0]}))
    r = asof_join(lt, rt, "t", tiebreak_col="seq",
                  right_cols=["px"], num_buckets=2).collect()[0]
    assert r["px_asof"] == 2.0  # largest seq at the matched timestamp


def test_no_right_payload_raises(spark):
    lt = spark.createDataFrame(pd.DataFrame({"tid": [0], "t": [1]}))
    rt = spark.createDataFrame(pd.DataFrame({"t": [1]}))
    with pytest.raises(ValueError, match="payload"):
        asof_join(lt, rt, "t")


def test_forward_keyed_matches_pandas(spark):
    rng = np.random.default_rng(13)
    trades, quotes = _frames(rng)
    got = asof_join(spark.createDataFrame(trades),
                    spark.createDataFrame(quotes),
                    "t", by="sym", direction="forward").toPandas() \
        .sort_values("tid").reset_index(drop=True)
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", by="sym", direction="forward",
    ).sort_values("tid").reset_index(drop=True)
    for g, w in zip(got["px_asof"], want["px"]):
        assert (pd.isna(g) and pd.isna(w)) or g == w


def test_forward_global_and_tolerance(spark):
    rng = np.random.default_rng(17)
    trades, quotes = _frames(rng, keys=1)
    trades, quotes = trades.drop(columns=["sym"]), quotes.drop(columns=["sym"])
    quotes = quotes.drop_duplicates(["t"])
    got = asof_join(spark.createDataFrame(trades).repartition(6),
                    spark.createDataFrame(quotes).repartition(4),
                    "t", direction="forward", tolerance=100,
                    num_buckets=8).toPandas() \
        .sort_values("tid").reset_index(drop=True)
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", direction="forward", tolerance=100,
    ).sort_values("tid").reset_index(drop=True)
    for g, w in zip(got["px_asof"], want["px"]):
        assert (pd.isna(g) and pd.isna(w)) or g == w


def test_nearest_keyed_matches_pandas(spark):
    rng = np.random.default_rng(23)
    trades, quotes = _frames(rng)
    got = asof_join(spark.createDataFrame(trades),
                    spark.createDataFrame(quotes),
                    "t", by="sym", direction="nearest").toPandas() \
        .sort_values("tid").reset_index(drop=True)
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", by="sym", direction="nearest",
    ).sort_values("tid").reset_index(drop=True)
    for g, w in zip(got["px_asof"], want["px"]):
        assert (pd.isna(g) and pd.isna(w)) or g == w


def test_nearest_global_and_tolerance(spark):
    rng = np.random.default_rng(29)
    trades, quotes = _frames(rng, keys=1)
    trades, quotes = trades.drop(columns=["sym"]), quotes.drop(columns=["sym"])
    quotes = quotes.drop_duplicates(["t"])
    got = asof_join(spark.createDataFrame(trades).repartition(6),
                    spark.createDataFrame(quotes).repartition(4),
                    "t", direction="nearest", tolerance=60,
                    num_buckets=8).toPandas() \
        .sort_values("tid").reset_index(drop=True)
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"),
        on="t", direction="nearest", tolerance=60,
    ).sort_values("tid").reset_index(drop=True)
    for g, w in zip(got["px_asof"], want["px"]):
        assert (pd.isna(g) and pd.isna(w)) or g == w


def test_nearest_tie_prefers_backward(spark):
    # left at t=10, right rows equidistant at t=8 and t=12 -> backward
    lt = spark.createDataFrame(pd.DataFrame({"tid": [0], "t": [10]}))
    rt = spark.createDataFrame(
        pd.DataFrame({"t": [8, 12], "px": [1.0, 2.0]}))
    got = asof_join(lt, rt, "t", direction="nearest").collect()[0]
    assert got["px_asof"] == 1.0 and got["t_asof"] == 8
    # pandas agrees on the tie rule
    w = pd.merge_asof(pd.DataFrame({"t": [10]}),
                      pd.DataFrame({"t": [8, 12], "px": [1.0, 2.0]}),
                      on="t", direction="nearest")
    assert w["px"][0] == 1.0


def test_direction_guard(spark):
    lt = spark.createDataFrame(pd.DataFrame({"tid": [0], "t": [1]}))
    rt = spark.createDataFrame(pd.DataFrame({"t": [1], "px": [1.0]}))
    with pytest.raises(ValueError, match="direction"):
        asof_join(lt, rt, "t", direction="sideways")
