"""Deduplication operators for large-scale training-data pipelines.

Four families, each a composition of DataFrame ops designed for the
10^12-document scale of the pages/documents tables:

* **exact** — hash-groupBy on a content digest. One shuffle on a 16-byte
  key; the canonical first pass of any corpus dedup.
* **MinHash + LSH** — shingle → minhash signature (vectorized numpy over
  Arrow batches) → band → bucket equi-join → candidate pairs → exact-verify.
  Only bucket-mates ever join: no O(n²) pair enumeration.
* **SimHash** — 64-bit weighted fingerprint; near-dup candidates via
  banded chunks (Hamming ≤ 3 across 4×16-bit bands guarantees ≥1 exact
  band match), verified by popcount on the JVM side (no Python in the
  verify).
* **n-gram Jaccard** — exact verification kernel used on LSH candidates.

All signature math uses the same splitmix64 mix as sources/pages.py, so
results are deterministic and partition-independent.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from ..sources.pages import _splitmix64

_MERSENNE = np.uint64((1 << 61) - 1)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: one representative row (min id) per distinct content.

    Returns (digest, rep_id, dup_count). Single shuffle on the digest; at
    100 TB prefer this first — it typically removes 20-40% of a web corpus
    before the expensive near-dup pass."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("doc_id"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("rep_id"), F.count("*").alias("dup_count"))
    )


def _char_shingles(text: str, k: int) -> np.ndarray:
    """Hashes of all character k-grams (numpy rolling window over bytes)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    # polynomial hash then mix
    h = np.zeros(len(win), dtype=np.uint64)
    for j in range(k):
        h = h * np.uint64(1099511628211) + win[:, j]
    return np.unique(_splitmix64(h))


def minhash_signature_udf(num_hashes: int = 64, shingle_k: int = 5, seed: int = 1):
    """text -> array<long> minhash signature (vectorized per Arrow batch).

    Permutations are (a*x + b) mod p universal hashes with seeded a/b —
    identical on every executor."""
    rng = np.random.default_rng(seed)
    A = rng.integers(1, (1 << 61) - 1, num_hashes, dtype=np.int64).astype(np.uint64)
    B = rng.integers(0, (1 << 61) - 1, num_hashes, dtype=np.int64).astype(np.uint64)

    @F.pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            sh = _char_shingles(t, shingle_k) & _MERSENNE
            if len(sh) == 0:
                out.append([0] * num_hashes)
                continue
            # (num_hashes, n_shingles) min over shingles — one matmul-shaped op
            vals = (A[:, None] * sh[None, :] + B[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out, dtype=object)

    return sig


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 1,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Output: (id_a, id_b, est_jaccard) with id_a < id_b; est_jaccard is the
    signature agreement rate (unbiased Jaccard estimate). Pairs survive iff
    they share ≥1 of `bands` bands — tune bands/rows for the target
    threshold (16 bands × 4 rows ≈ catches J ≳ 0.5)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signature_udf(num_hashes, shingle_k, seed)
    S = df.select(F.col(id_col).alias("doc_id"), sig(F.col(text_col)).alias("sig")).where(
        F.col("sig").isNotNull()
    )

    # band key = hash of the band's slice — built-in functions only
    band_rows = S.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.element_at("sig", b * rows_per_band + r + 1)
                                 for r in range(rows_per_band)]).alias("bkey"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))

    a = band_rows.alias("a")
    b = band_rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # estimate = fraction of agreeing signature positions (JVM-side zip_with)
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(num_hashes)
    )
    return pairs.withColumn("est_jaccard", est).drop("sig_a", "sig_b")


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    **kw,
) -> DataFrame:
    """Near-dup pairs with est_jaccard ≥ threshold."""
    return minhash_lsh_candidates(df, text_col, id_col, **kw).where(
        F.col("est_jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_udf(seed: int = 3):
    """text -> 64-bit simhash over word tokens (vectorized bit-bucket sums)."""

    @F.pandas_udf(LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        mask_na = np.zeros(len(texts), dtype=bool)
        for i, t in enumerate(texts):
            if t is None:
                mask_na[i] = True
                continue
            words = t.split()
            if not words:
                continue
            hs = _splitmix64(
                np.array([hash_word(w, seed) for w in words], dtype=np.uint64)
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            score = bits.sum(axis=0) * 2 - len(words)  # +1/-1 votes
            v = np.uint64(0)
            for bpos in np.nonzero(score > 0)[0]:
                v |= np.uint64(1) << np.uint64(bpos)
            # reinterpret the u64 bit pattern as signed (top bit may be set)
            out[i] = np.array([v], dtype=np.uint64).view(np.int64)[0]
        res = pd.Series(out, dtype="Int64")
        res[mask_na] = pd.NA
        return res

    return sh


def hash_word(w: str, seed: int) -> int:
    # python-int FNV-1a with explicit 64-bit wrap (no numpy overflow noise)
    h = (seed * 0x9E3779B97F4A7C15 + 0xCBF29CE484222325) & 0xFFFFFFFFFFFFFFFF
    for ch in w.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_dups(df: DataFrame, text_col: str, id_col: str,
                      max_hamming: int = 3, seed: int = 3) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.

    Banding: split the 64-bit hash into 4×16-bit chunks; any pair with
    Hamming ≤ 3 matches exactly on ≥1 chunk (pigeonhole), so the candidate
    join is an equi-join per chunk, then a JVM-side popcount verify."""
    S = df.select(F.col(id_col).alias("doc_id"), simhash_udf(seed)(F.col(text_col)).alias("sh")).where(
        F.col("sh").isNotNull()
    )
    chunks = S.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright(F.col("sh"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ckey"),
                )
                for c in range(4)
            ])
        ).alias("cc"),
    ).select("doc_id", "sh", F.col("cc.chunk").alias("chunk"), F.col("cc.ckey").alias("ckey"))
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .drop("sh_a", "sh_b")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify kernel)
# ---------------------------------------------------------------------------


def word_ngrams(col, n: int = 3):
    """Column of word n-gram strings (JVM-side: split + transform + slice)."""
    words = F.split(F.trim(col), r"\s+")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.when(cnt >= n, F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))
    )).otherwise(F.array(F.concat_ws(" ", words)))


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, text_col: str, id_col: str,
                        n: int = 3) -> DataFrame:
    """Exact word-n-gram Jaccard for given (id_a, id_b) pairs — all
    JVM-side array ops (array_intersect/array_union), no Python."""
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("grams"),
    )
    out = (
        pairs.join(docs.withColumnRenamed("doc_id", "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
        .join(docs.withColumnRenamed("doc_id", "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("double")
    union = F.size(F.array_union("grams_a", "grams_b")).cast("double")
    return out.withColumn(
        "jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    ).drop("grams_a", "grams_b")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(df: DataFrame, vec_col: str, id_col: str,
                           threshold: float = 0.95, planes: int = 16,
                           seed: int = 9, dim: Optional[int] = None) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold.

    Random-hyperplane LSH: sign-signature bucket join (high-cosine pairs
    collide with prob (1 - θ/π)^planes), then exact JVM-side cosine verify.
    For guaranteed recall lower `planes`; for 10^12 rows raise it."""
    if dim is None:
        first = df.select(F.size(vec_col)).first()
        dim = int(first[0])
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(planes, dim)).astype(np.float64)

    @F.pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        na = np.zeros(len(vecs), dtype=bool)
        for i, v in enumerate(vecs):
            if v is None:
                na[i] = True
                continue
            proj = H @ np.asarray(v, dtype=np.float64)
            bits = (proj > 0).astype(np.uint64)
            out[i] = int((bits << np.arange(planes, dtype=np.uint64)).sum())
        res = pd.Series(out, dtype="Int64")
        res[na] = pd.NA
        return res

    S = df.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec")).withColumn(
        "bucket", bucket(F.col("vec"))
    )
    a, b = S.alias("a"), S.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.vec").alias("vec_a"),
        F.col("b.vec").alias("vec_b"),
    )
    dot = F.aggregate(
        F.zip_with("vec_a", "vec_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.transform(c, lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0), lambda acc, v: acc + v)
    )
    cos = dot / (norm("vec_a") * norm("vec_b"))
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .drop("vec_a", "vec_b")
    )
