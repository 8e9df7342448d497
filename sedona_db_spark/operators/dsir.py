"""DSIR-style data selection via importance resampling.

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023): featurize every document into a bag of
hashed n-grams, estimate feature distributions over the RAW (web) corpus
and a small TARGET (high-quality) corpus, weight each raw document by
its target/raw log-likelihood ratio, and sample the training subset with
Gumbel top-k.  This module is the Spark-first re-expression, built so a
SQL oracle can recompute every number:

* **features** — lower-cased whitespace word unigrams + adjacent
  bigrams, hashed into ``buckets`` bins with the first 8 hex chars of
  md5 (``conv(substr(md5(f),1,8),16,10) % B`` — Spark and DuckDB agree
  byte-for-byte on md5, so the oracle reproduces bucket ids exactly).
* **distributions** — one hash aggregation per corpus; probabilities
  are add-one smoothed over the ``buckets`` bins.
* **weights** — ``logweight(doc) = Σ_f  log p̂_target(bucket_f) −
  log p̂_raw(bucket_f)`` summed over the document's feature
  OCCURRENCES (the paper's unigram-model likelihood ratio).  One
  explode + two broadcast joins (the bucket tables are ≤ B ≤ 65,536
  rows by construction) + one groupBy(doc_id).
* **resampling** — Gumbel top-k without replacement:
  ``key = logweight/temperature + Gumbel(0,1)`` with the uniform drawn
  from a CONTENT-DERIVED md5 fraction, so the sample is deterministic
  under retries and repartitioning (the same retry-stability rule as
  operators/sampling.py).  ``ORDER BY key DESC LIMIT k`` compiles to
  TakeOrderedAndProject — no global sort shuffle.

Scale notes: the feature explode is map-side; both count tables are
bucket-capped and broadcast; nothing driver-side ever exceeds
``buckets`` rows.  Reference scope: SedonaDB has no selection stage —
this is part of the beyond-the-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_BUCKETS = 16_384


def _tokens(text_col) -> F.Column:
    t = F.trim(F.lower(text_col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def _doc_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, feat) — one row per word unigram AND adjacent bigram
    occurrence (bigrams are space-joined, matching the SQL oracle)."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     _tokens(F.col(text_col)).alias("t"))
    n = F.size("t")
    uni = base.where(n >= 1).select(
        "doc_id", F.explode("t").alias("feat"))
    bi = (
        base.where(n >= 2)
        .select("doc_id", F.explode(F.arrays_zip(
            F.slice("t", 1, n - 1).alias("a"),
            F.slice("t", 2, n - 1).alias("b"))).alias("p"))
        .select("doc_id",
                F.concat_ws(" ", F.col("p.a"), F.col("p.b")).alias("feat"))
    )
    return uni.unionByName(bi)


def _bucket(col) -> F.Column:
    """md5-prefix bucket hash — bit-identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def feature_distribution(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(bucket, cnt) hashed-feature counts for one corpus (one shuffle)."""
    feats = _doc_features(df, text_col, id_col)
    return (
        feats.select((_bucket(F.col("feat")) % F.lit(buckets)).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_weights(raw: DataFrame, target: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(doc_id, n_feats, logweight) for every raw document with ≥ 1 token.

    logweight > 0 ⇔ the document looks more like the target corpus than
    like the raw corpus under the hashed n-gram unigram model."""
    raw_dist = feature_distribution(raw, text_col, id_col, buckets)
    tgt_dist = feature_distribution(target, text_col, id_col, buckets)
    # add-one smoothed log probabilities; totals enter as literals so the
    # per-feature join stays a pure broadcast lookup
    raw_total = raw_dist.agg(F.sum("cnt")).first()[0] or 0
    tgt_total = tgt_dist.agg(F.sum("cnt")).first()[0] or 0
    lr = F.broadcast(raw_dist.select(
        "bucket",
        F.log((F.col("cnt") + F.lit(1.0))
              / F.lit(float(raw_total + buckets))).alias("lp_raw")))
    lt = F.broadcast(tgt_dist.select(
        "bucket",
        F.log((F.col("cnt") + F.lit(1.0))
              / F.lit(float(tgt_total + buckets))).alias("lp_tgt")))
    feats = _doc_features(raw, text_col, id_col).select(
        "doc_id", (_bucket(F.col("feat")) % F.lit(buckets)).alias("bucket"))
    import math

    lp_raw0 = math.log(1.0 / (raw_total + buckets))
    lp_tgt0 = math.log(1.0 / (tgt_total + buckets))
    scored = (
        feats.join(lr, "bucket", "left").join(lt, "bucket", "left")
        .select(
            "doc_id",
            (F.coalesce(F.col("lp_tgt"), F.lit(lp_tgt0))
             - F.coalesce(F.col("lp_raw"), F.lit(lp_raw0))).alias("llr"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_feats"),
             F.sum("llr").alias("logweight"))
    )


def dsir_resample(raw: DataFrame, target: DataFrame, k: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  buckets: int = DEFAULT_BUCKETS,
                  temperature: float = 1.0, seed: int = 13) -> DataFrame:
    """Gumbel top-k importance resampling without replacement.

    Sampling key = logweight/temperature + Gumbel(0,1), with the uniform
    derived from md5(seed, doc_id) — content-derived, so the selected set
    is identical under retries, repartitioning, and recomputation (a
    `rand()`-keyed sample is none of those).  ORDER BY + LIMIT compiles
    to TakeOrderedAndProject: no global sort shuffle."""
    w = dsir_weights(raw, target, text_col, id_col, buckets)
    # 13 hex chars = 52 bits -> uniform in (0, 1); +1 in the numerator
    # guards log(0)
    u = (F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)),
                                              F.col("doc_id").cast("string"))),
                            1, 13), 16, 10).cast("double") + F.lit(1.0)) \
        / F.lit(float(1 << 52))
    gumbel = -F.log(-F.log(u))
    key = (F.col("logweight") / F.lit(float(temperature))) + gumbel
    picked = (
        w.select("doc_id", key.alias("_dsir_key"))
        .orderBy(F.col("_dsir_key").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    out = raw.join(
        picked.select(F.col("doc_id").alias("__dsir_id")),
        raw[id_col] == F.col("__dsir_id"), "left_semi",
    )
    return out.select(*[raw[c] for c in raw.columns])
