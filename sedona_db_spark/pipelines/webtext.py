"""End-to-end webtext curation pipeline — the composition a training-data
team actually runs over a crawled corpus, staged through checkpoint
manifests so a 100-TB run resumes from the last good stage.

Stage graph (every stage = one `plans.manifests.run_stage` checkpoint with
per-partition lineage; re-running after a crash or an upstream change
recomputes only the invalidated suffix):

  clean       C4 line cleaning + page gate, Gopher repetition filters,
              quality score, language id — one full scan, pure Column
              algebra (zero Python in the plan)
  exact       exact dedup on the canonical-form fingerprint (one shuffle)
  neardup     MinHash LSH pairs -> alternating-star connected components
              -> keep each cluster's canonical doc
  decontam    n-gram decontamination against a benchmark corpus (optional)

Scale notes: each stage's shuffle is keyed independently (digest, band
key, component id), so no stage inherits a skewed partitioning from the
previous one; the text column is carried through parquet checkpoints, not
shuffles, except in the exact-dedup groupBy which keys on the 16-byte
digest only.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import text as T
from ..operators.components import dedup_clusters
from ..operators.dedup import exact_dedup, minhash_dedup, ngram_decontaminate
from ..plans import manifests as M


def clean_stage(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                min_quality: float = 0.3, langs: Optional[list] = None,
                rep_thresholds: tuple = (0.30, 0.20, 0.20)) -> DataFrame:
    """C4 + Gopher + quality + langid in ONE scan; returns the cleaned
    surviving docs with their curation metrics."""
    lined = F.col(text_col)
    cleaned = T.c4_clean(lined)
    rep = T.repetition_stats(lined)
    out = docs.select(
        F.col(id_col),
        cleaned.alias(text_col),
        T.c4_page_keep(lined).alias("c4_keep"),
        T.repetitive_flag(lined, *rep_thresholds).alias("repetitive"),
        T.quality_score(lined).alias("quality"),
        T.langid(lined).alias("lang"),
        rep["dup_word_frac"].alias("dup_word_frac"),
    )
    out = out.where(
        F.col("c4_keep") & ~F.col("repetitive") & (F.col("quality") >= min_quality)
    )
    if langs:
        out = out.where(F.col("lang").isin(list(langs)))
    return out


def curate_corpus(
    spark: SparkSession,
    root: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: Optional[DataFrame] = None,
    min_quality: float = 0.3,
    neardup_threshold: float = 0.5,
    langs: Optional[list] = None,
    decontam_n: int = 13,
    rep_thresholds: tuple = (0.30, 0.20, 0.20),
) -> DataFrame:
    """Run the staged curation pipeline under checkpoint root `root`.
    Returns the final curated corpus (id, text, curation metrics)."""

    clean = M.run_stage(
        spark, root, "clean",
        lambda s: clean_stage(docs, text_col, id_col, min_quality, langs,
                              rep_thresholds),
        inputs=[],
    )

    exact = M.run_stage(
        spark, root, "exact",
        lambda s: clean.join(
            exact_dedup(clean, text_col, id_col)
            .select(F.col("rep_id").alias(id_col)),
            id_col,
        ),
        inputs=["clean"],
    )

    def _neardup(s):
        pairs = minhash_dedup(exact, text_col, id_col,
                              threshold=neardup_threshold, scheme="poly31")
        clustered = dedup_clusters(exact, pairs, id_col)
        return clustered.where(F.col("is_canonical")).drop(
            "component", "is_canonical"
        )

    near = M.run_stage(spark, root, "neardup", _neardup, inputs=["exact"])

    if benchmark is None:
        return near

    def _decontam(s):
        flags = ngram_decontaminate(near, benchmark, text_col, id_col, n=decontam_n)
        return near.join(
            flags.where(~F.col("contaminated"))
            .select(F.col("doc_id").alias(id_col)),
            id_col,
        )

    return M.run_stage(spark, root, "decontam", _decontam, inputs=["neardup"])
