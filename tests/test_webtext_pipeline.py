"""End-to-end webtext curation pipeline: clean -> exact dedup -> near-dup
clusters -> decontamination, staged through checkpoint manifests."""

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.pipelines.webtext import clean_stage, curate_corpus


def _corpus(spark):
    good = ("This is a perfectly reasonable sentence of webtext prose.\n"
            "It carries several lines with proper punctuation marks.\n"
            "Each line holds more than five whitespace words total.")
    rows = [
        (0, good),
        (1, good),                                     # exact dup of 0
        (2, good.replace("webtext", "internet")),      # near dup of 0
        (3, "short."),                                 # fails C4 line gate
        (4, "word " * 80),                             # repetitive, no punct
        (5, good.replace("prose", "poetry").replace("marks", "signs")
             .replace("total", "overall")),            # near dup of 0 too
        (6, ("A wholly different document about spatial joins follows here.\n"
             "Grids and quadtrees partition the plane into nested cells.\n"
             "Each cell key equi-joins candidate geometry pairs together.")),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_clean_stage_filters(spark):
    out = clean_stage(_corpus(spark), min_quality=0.0)
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 3 not in ids and 4 not in ids
    assert {0, 1, 2, 6} <= ids


def test_full_pipeline_and_resume(spark, tmp_path):
    root = str(tmp_path / "curate")
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "Grids and quadtrees partition the plane into nested cells "
               "for spatial joins and more")],
        "doc_id LONG, text STRING",
    )
    out = curate_corpus(spark, root, docs, benchmark=bench,
                        min_quality=0.0, neardup_threshold=0.5, decontam_n=8)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 1 exact-dups 0; 2 and 5 near-dup 0; 6 is contaminated by the bench
    assert ids == [0]

    # resume: a second invocation must return the same rows from the
    # manifests without recomputing (same result, manifests intact)
    out2 = curate_corpus(spark, root, docs, benchmark=bench,
                         min_quality=0.0, neardup_threshold=0.5, decontam_n=8)
    assert sorted(r["doc_id"] for r in out2.select("doc_id").collect()) == [0]
    import os
    stages = set(os.listdir(root))
    assert {"clean", "exact", "neardup", "decontam"} <= {
        s.split(".")[0] for s in stages
    } or len(stages) >= 4


def test_pipeline_without_benchmark(spark, tmp_path):
    out = curate_corpus(spark, str(tmp_path / "c2"), _corpus(spark),
                        min_quality=0.0)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == [0, 6]
