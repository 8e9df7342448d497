"""Winnowing fingerprints (Schleimer-Wilkerson-Aiken 2003 / MOSS)."""

import pytest
from pyspark.sql import functions as F

from sedona_db_spark.functions.text import winnow_fingerprints


def fps_of(spark, *texts, k=5, w=4):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.f for r in
            df.select(winnow_fingerprints(F.col("text"), k, w).alias("f"))
            .collect()]


class TestWinnow:
    def test_shared_substring_guarantee(self, spark):
        # any shared run of >= k + w - 1 = 8 chars shares a fingerprint
        a, b = fps_of(spark, "XXXX common-run YYYY", "ZZZZ common-run WWWW")
        assert set(a) & set(b)

    def test_disjoint_texts_disjoint_prints(self, spark):
        a, b = fps_of(spark, "aaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbb")
        assert not (set(a) & set(b))

    def test_short_doc_empty(self, spark):
        (a,) = fps_of(spark, "1234567")          # len 7 < 8
        assert a == []

    def test_sorted_distinct(self, spark):
        (a,) = fps_of(spark, "do run run run, do run run")
        assert a == sorted(set(a))

    def test_density(self, spark):
        # expected density ~ 2/(w+1); repeated-free text stays well under 1
        (a,) = fps_of(spark, "abcdefghijklmnopqrstuvwxyz0123456789" * 3)
        n_grams = len("abcdefghijklmnopqrstuvwxyz0123456789" * 3) - 4
        assert 0 < len(a) < 0.8 * n_grams

    def test_null_and_unicode(self, spark):
        df = spark.createDataFrame([(None,), ("héllo wörld unicode!",)],
                                   "text string")
        rows = df.select(
            winnow_fingerprints(F.col("text")).alias("f")).collect()
        assert rows[0].f == [] and len(rows[1].f) > 0


class TestUdfParity:
    def test_udf_equals_column_kernel(self, spark):
        from sedona_db_spark.functions.text import winnow_fingerprints_udf

        texts = ["do run run run, do run run",
                 "héllo wörld unicode with a much longer tail " * 3,
                 "1234567", None]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        col_side = [r.f for r in df.select(
            winnow_fingerprints(F.col("text"), 5, 4).alias("f")).collect()]
        udf_side = [r.f for r in df.select(
            winnow_fingerprints_udf(5, 4)(F.col("text")).alias("f")).collect()]
        assert udf_side == col_side
