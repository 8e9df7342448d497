"""Distributed logistic-regression quality classifier over hashed
word features — the CCNet / GPT-3 "quality filter" curation stage
(Wenzek et al. 2020 train a fastText classifier against Wikipedia;
Brown et al. 2020 §A.1 use a logistic classifier over hashed features
to score Common-Crawl documents).  The reference engine has no trainer
(it is a single-node SQL engine); at 10^12 documents the *training*
step itself must be a distributed job, so this implements full-batch
gradient descent as pure DataFrame algebra:

* **features** — lowercase whitespace unigrams hashed into ``buckets``
  bins with the md5-prefix hash `operators/dsir.py` established
  (``conv(substr(md5(w),1,8),16,10) % B`` — Spark and DuckDB agree
  byte-for-byte, so the SQL oracle reproduces bucket ids exactly).
  One ``(doc_id, bucket, x)`` row per distinct bucket per doc with
  ``x = cnt / n_tokens`` (bag-of-words, length-normalized — the
  fastText input representation).  Built once, persisted, reused by
  every iteration.
* **iteration** — score every doc against the current weights
  (broadcast B-row weight table, one shuffle-free join + one
  groupBy(doc) partial-aggregated sum), sigmoid, then one
  groupBy(bucket) gradient aggregate (B rows out) and a driver-side
  weight update.  Two shuffles per iteration, both with map-side
  combine; nothing driver-side grows with the corpus — only with B.
* **bit-exactness** — floating sums over a shuffled corpus are
  order-DEPENDENT, which would make a value-hash oracle flaky.  Every
  per-row term is therefore quantized to a BIGINT
  (``round(v * 1e12)``) *before* any aggregation: integer sums are
  associative/commutative exactly, so Spark at any partitioning and
  the DuckDB oracle produce identical gradients bit-for-bit.  The only
  transcendental is the sigmoid's ``exp``; its cross-engine 1-ULP
  wobble is absorbed by rounding p to 9 dp (the same discipline
  `doc_ppl`'s ln/pow oracle relies on).  Weights are re-rounded to
  12 dp after each update so the chain stays engine-portable.

Apply (`score_lr`) is the same quantized dot product + sigmoid —
broadcast weights, zero corpus shuffle beyond the per-doc groupBy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = ["LRModel", "doc_bucket_features", "train_lr_classifier",
           "score_lr", "quality_filter_lr"]

_Q = 1e12  # per-term quantization: exact integer sums, |term| < 2^53/1e12


@dataclass(frozen=True)
class LRModel:
    """Trained classifier: one weight per hash bucket + bias."""

    weights: tuple  # length == buckets
    bias: float
    buckets: int
    n_docs: int
    lr: float
    iterations: int


def _bucket(col) -> F.Column:
    """md5-prefix bucket hash — bit-identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def doc_bucket_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        buckets: int = 256) -> DataFrame:
    """(doc_id, bucket, x) — length-normalized hashed bag of words.

    ``x = count(bucket) / n_tokens``; docs with zero tokens emit no
    rows (they cannot be scored and do not train).  One explode + one
    (doc, bucket) groupBy — a single shuffle keyed wide enough that
    token-frequency skew never concentrates on one reducer.
    """
    if not 2 <= buckets <= 65536:
        raise ValueError(f"buckets must be in [2, 65536], got {buckets}")
    t = F.trim(F.lower(F.col(text_col)))
    toks = df.where(F.length(t) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.split(t, r"\s+").alias("t"),
    )
    per_tok = toks.select(
        "doc_id", F.size("t").alias("tot"),
        F.explode("t").alias("w"),
    )
    return (
        per_tok.groupBy("doc_id", (_bucket(F.col("w")) % F.lit(buckets))
                        .alias("bucket"))
        .agg((F.count(F.lit(1)).cast("double") / F.first("tot")).alias("x"))
    )


def _doc_scores(feats: DataFrame, weights, bias: float,
                spark) -> DataFrame:
    """(doc_id, p) — sigmoid of the quantized dot product.

    The weight table is B rows, broadcast; each (doc,bucket) term is
    quantized to BIGINT before the per-doc sum so the result is
    independent of partitioning and engine.
    """
    wdf = F.broadcast(spark.createDataFrame(
        [(int(i), float(w)) for i, w in enumerate(weights)],
        "bucket long, w double"))
    terms = feats.join(wdf, "bucket", "left").select(
        "doc_id",
        F.round(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("x") * F.lit(_Q))
        .cast("bigint").alias("ti"),
    )
    s = terms.groupBy("doc_id").agg(
        (F.sum("ti").cast("double") / F.lit(_Q) + F.lit(bias)).alias("s"))
    return s.select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))), 9).alias("p"),
    )


def train_lr_classifier(df: DataFrame, label_col: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        buckets: int = 256, iterations: int = 2,
                        lr: float = 1.0) -> LRModel:
    """Full-batch gradient descent on logistic loss.

    ``label_col`` must be 0/1 (int or boolean).  Deterministic: zero
    init, quantized order-independent gradient sums, 12-dp weight
    rounding — retries, repartitioning, and the unrolled SQL oracle
    all reproduce the identical weight trajectory.
    """
    if not 1 <= iterations <= 50:
        raise ValueError(f"iterations must be in [1, 50], got {iterations}")
    spark = df.sparkSession
    feats = doc_bucket_features(df, text_col, id_col, buckets)
    labels = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).cast("int").cast("double").alias("y"),
    ).where(F.col("y").isNotNull())
    feats = feats.join(labels, "doc_id").persist()
    n = feats.select("doc_id").distinct().count()
    if n == 0:
        feats.unpersist()
        raise ValueError("no trainable documents (empty texts or null labels)")

    w = [0.0] * buckets
    b = 0.0
    try:
        for _ in range(iterations):
            p = _doc_scores(feats.select("doc_id", "bucket", "x"), w, b, spark)
            err = p.join(labels, "doc_id").select(
                "doc_id", (F.col("p") - F.col("y")).alias("e"))
            joined = feats.join(err, "doc_id")
            grows = joined.groupBy("bucket").agg(
                F.sum(F.round(F.col("e") * F.col("x") * F.lit(_Q))
                      .cast("bigint")).alias("gi")).collect()
            brow = err.agg(
                F.sum(F.round(F.col("e") * F.lit(_Q)).cast("bigint"))
            ).first()[0]
            for r in grows:
                i = int(r["bucket"])
                w[i] = round(w[i] - lr * (int(r["gi"]) / _Q) / n, 12)
            b = round(b - lr * (int(brow) / _Q) / n, 12)
    finally:
        feats.unpersist()
    return LRModel(weights=tuple(w), bias=b, buckets=buckets,
                   n_docs=n, lr=lr, iterations=iterations)


def score_lr(df: DataFrame, model: LRModel, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, score) for every doc with ≥ 1 token; score in (0, 1)."""
    feats = doc_bucket_features(df, text_col, id_col, model.buckets)
    return _doc_scores(feats, model.weights, model.bias,
                       df.sparkSession).withColumnRenamed("p", "score")


def quality_filter_lr(df: DataFrame, model: LRModel, threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Rows of ``df`` whose classifier score clears ``threshold``.

    The score join keys on the id column only — document text never
    enters the scoring shuffle.
    """
    keep = score_lr(df, model, text_col, id_col).where(
        F.col("score") > F.lit(threshold)).select("doc_id")
    return df.join(
        keep.withColumnRenamed("doc_id", "__keep_id"),
        F.col(id_col) == F.col("__keep_id"), "left_semi")
