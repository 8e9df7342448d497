"""Sequence packing for LM training: concatenate the corpus in id order
and chunk it into fixed-length context windows (the GPT-style
concat-and-chunk loader), computed as a DISTRIBUTED prefix sum.

The naive Spark expression — `sum() OVER (ORDER BY id)` with no partition
key — collapses to ONE task and is a scale-killer at 10^12 rows. This
operator runs the classic two-phase scan instead:

1. range-bucket rows by id (pure column math, no sampling);
2. local cumulative sum per bucket (window partitioned BY BUCKET —
   parallel);
3. collect the B bucket totals (B rows — tiny), prefix-sum them on the
   driver, broadcast the offsets back as a literal map.

Result: every row's exact global running total with two narrow shuffles
(the range bucketing and the B-row aggregate), never a single-task stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import bpe_token_count


def global_running_sum(df: DataFrame, order_col: str, val_col: str,
                       buckets: int = 256, out_col: str = "_cum") -> DataFrame:
    """Exact `sum(val) OVER (ORDER BY order_col)` (inclusive) without a
    single-task global window. `order_col` must be numeric.

    Buckets are COUNT-BALANCED (round-4, VERDICT r3 #8): split points are
    one-pass approximate quantiles of `order_col`, so a sparse or skewed
    id space (ids clustered in a tiny range of a huge domain) still lands
    ~n/buckets rows per bucket — the old (max-min)/buckets range split
    put most rows in a few buckets. Split choice affects only the
    parallel decomposition; the running sum is exact either way."""
    lo = df.agg(F.min(order_col)).collect()[0][0]
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    probs = [i / buckets for i in range(1, buckets)]
    splits = sorted(set(df.stat.approxQuantile(order_col, probs, 0.001)))
    if not splits:
        b = df.withColumn("_bkt", F.lit(0).cast("long"))
    else:
        arr = F.array(*[F.lit(float(s)) for s in splits])
        # bucket = count of split points strictly below the value: rows
        # tying a split always share a bucket (ordering stays exact)
        b = df.withColumn(
            "_bkt",
            F.size(F.filter(arr, lambda s: F.col(order_col).cast("double") > s)).cast("long"),
        )
    totals = {
        int(r["_bkt"]): int(r["t"])
        for r in b.groupBy("_bkt").agg(F.sum(val_col).alias("t")).collect()
    }
    offset, acc = {}, 0
    for k in sorted(totals):
        offset[k] = acc
        acc += totals[k]
    off_expr = F.create_map(
        *[x for k, v in sorted(offset.items()) for x in (F.lit(k), F.lit(v))]
    )
    w = Window.partitionBy("_bkt").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        b.withColumn("_local", F.sum(val_col).over(w))
        .withColumn(out_col, F.element_at(off_expr, F.col("_bkt")) + F.col("_local"))
        .drop("_bkt", "_local")
    )


def pack_sequences(docs: DataFrame, ctx_len: int, text_col: str = "text",
                   id_col: str = "doc_id", buckets: int = 256) -> DataFrame:
    """Assign every document its place in the packed token stream:
    (id, n_tokens, bin_id, offset_in_bin) where bin_id is the context
    window the document STARTS in and offset_in_bin its start position —
    documents straddle windows exactly as a concat-and-chunk loader reads
    them. Deterministic (id order) and exactly SQL-reproducible."""
    t = docs.select(
        F.col(id_col), bpe_token_count(F.col(text_col)).cast("long").alias("n_tokens")
    )
    c = global_running_sum(t, id_col, "n_tokens", buckets=buckets)
    start = F.col("_cum") - F.col("n_tokens")
    return c.select(
        F.col(id_col),
        "n_tokens",
        (start / ctx_len).cast("long").alias("bin_id"),
        (start % ctx_len).cast("long").alias("offset_in_bin"),
    )
