"""BM25 ranked retrieval over a document corpus.

Okapi BM25 (Robertson & Walker 1994; the Lucene-default ranking
function) scores a document for a bag-of-terms query from corpus-level
statistics:

    score(D, Q) = Σ_t  idf(t) · tf(t,D)·(k1+1)
                        / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))

Spark-first shape (everything stays in whole-stage codegen):

* tokenization is one ``split`` — the SAME whitespace rule as
  operators/dsir.py, so the DuckDB oracle reproduces tokens exactly;
* per-document term frequencies: one explode + a term filter that
  keeps ONLY query terms (the corpus scan emits ≤ |Q| rows per doc
  before any shuffle) + one ``groupBy(doc_id, term)``;
* df(t) and (N, avgdl) are tiny aggregates — df is at most |Q| rows
  and joins back as a broadcast; N/avgdl ride a one-row crossJoin, so
  the whole query is ONE corpus scan + one shuffle on (doc_id, term)
  + one shuffle on doc_id. No collect anywhere.

Scale notes (100 TB): the only data-sized shuffles are keyed on
(doc_id, term) then doc_id — uniform by construction (doc ids are
unique). A hot query term never concentrates: its rows are spread
across doc ids. For a query WORKLOAD (many queries), broadcast the
query-term table instead of the isin literal and add query_id to the
group keys — same plan shape.

Reference scope: SedonaDB has no text-retrieval surface; this is part
of the beyond-the-reference training-data toolkit (e.g. quality-scoring
documents against a prompt/topic bag, ELI5-style retrieval filtering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bm25_scores", "bm25_search"]


def _tokens(text_col) -> F.Column:
    t = F.trim(F.lower(text_col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def bm25_scores(docs: DataFrame, query_terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(doc_id, bm25) for every document matching ≥ 1 query term.

    Terms are matched after lower-casing; repeated query terms are
    counted once (a bag query just scales per-term idf, which callers
    can do by weighting the output).
    """
    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       _tokens(F.col(text_col)).alias("t"))
    dl = toks.where(F.size("t") >= 1).select("doc_id",
                                             F.size("t").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"),
                   F.avg("dl").alias("avgdl"))
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                       + F.lit(b) * F.col("dl")
                                       / F.col("avgdl"))
    per_term = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(per_term).alias("bm25"))
    )


def bm25_search(docs: DataFrame, query_terms: list[str], k: int,
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k documents by BM25, deterministic doc_id tiebreak.

    ORDER BY + LIMIT compiles to TakeOrderedAndProject — per-partition
    top-k heaps merged on the driver, no global sort shuffle."""
    scored = bm25_scores(docs, query_terms, text_col, id_col, k1, b)
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(k)
