"""fan_out guard: fires only on big unsplittable local scans.

The guard protects 100-TB pipelines from single-row-group parquet files
(one unsplittable task feeding an otherwise shuffle-free pipeline), but
must stay a NO-OP on small inputs where per-task Python/Arrow overhead
outweighs the parallelism (measured ~3x slower at 10 MB scale).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.operators.fanout import fan_out


@pytest.fixture(scope="module")
def small_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("fanout") / "t.parquet")
    spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 7 % 97).alias("v")
    ).coalesce(1).write.parquet(p)
    return p


def test_noop_on_small_scan(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    n = df.rdd.getNumPartitions()
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == n  # byte gate: too small to fan


def test_fires_below_threshold_override(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = fan_out(df, min_bytes_per_partition=1)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # row identity preserved
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))


def test_noop_when_already_wide(spark, small_parquet):
    df = spark.read.parquet(small_parquet).repartition(
        spark.sparkContext.defaultParallelism + 3
    )
    out = fan_out(df, min_bytes_per_partition=1)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism + 3


def test_noop_on_memory_frame(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    out = fan_out(df, min_bytes_per_partition=1)  # no input files -> unknown
    assert out is df


def test_row_prong_fires_on_dense_small_bytes(spark, small_parquet):
    # dictionary-compressed parquet hides work from the byte gate: the
    # row prong must fire on its own (bytes gate left at 64 MB default)
    df = spark.read.parquet(small_parquet)
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = fan_out(df, min_rows_per_partition=500)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))


def test_row_prong_noop_below_row_threshold(spark, small_parquet):
    df = spark.read.parquet(small_parquet)
    n = df.rdd.getNumPartitions()
    # 1000 rows < default 16384/partition and < 64 MB: both prongs decline
    assert fan_out(df).rdd.getNumPartitions() == n
