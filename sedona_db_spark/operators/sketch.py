"""Mergeable distinct-count sketches: HyperLogLog.

Flajolet et al. 2007 ("HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm"). At 10^12 rows, ``COUNT(DISTINCT
text)`` per group is a full shuffle of every distinct value; the HLL
register table is ``m = 2^p`` rows per group, mergeable across
partitions, days, and datasets by a plain ``MAX`` — the shape every
warehouse sketch column uses.

This is a from-scratch DETERMINISTIC construction (not a binding):

* hash: two independent md5-prefix integers per value — register
  ``('0x'||substr(md5(v),1,8)) % m`` and a 40-bit suffix
  ``('0x'||substr(md5(v),9,10))``; md5 agrees byte-for-byte between
  Spark and DuckDB, so a SQL oracle recomputes every register and the
  final estimate exactly (Spark's builtin ``approx_count_distinct``
  is a different, non-reproducible sketch — the point here is an
  oracle-checkable one);
* rank: ``rho = 41 - bit_length(suffix)`` via ``length(bin(v))`` —
  both engines print minimal binary strings, so rho is exact integer
  math, no float log2;
* estimator: ``alpha_m · m² / (Σ 2^-M_j)`` with the small-range
  linear-counting correction ``m·ln(m/V)`` when ``E ≤ 2.5m`` and empty
  registers exist. Every 2^-M_j term is a power of two and the sum
  stays under 53 mantissa bits for p ≤ 12, so the fold is EXACT and
  order-independent — no float-accumulation drift between engines.

Scale notes: the only shuffle is ``groupBy(group, register)`` — at most
``m`` rows per group survive the map-side partial MAX, so a 10^12-row
scan reduces to ``groups × m`` rows on the wire. ``hll_merge`` unions
register tables and re-MAXes: sketch once per partition/day, merge
cheaply forever (the cross-dataset dedup-accounting pattern).

Reference scope: SedonaDB has no sketch surface; beyond-the-reference
training-data op (corpus-size accounting, per-domain URL cardinality).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

__all__ = ["hdr_sketch", "hdr_merge", "hdr_quantiles", "hdr_bucket",
           "hdr_decode",
           "hll_sketch", "hll_merge", "hll_estimate", "hll_count_distinct",
           "hll_reg_rho", "cms_sketch", "cms_merge", "cms_estimate"]

_SUFFIX_BITS = 40


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    if m == 16:
        return 0.673
    raise ValueError("p must be >= 4")


def hll_reg_rho(col, p: int):
    """(reg, rho) Columns for a value — the deterministic register
    assignment shared by the batch sketch and the streaming rollup."""
    if not 4 <= p <= 12:
        # p > 12 would push the estimator fold past the exact-double
        # window the oracle parity relies on (see module docstring)
        raise ValueError("p must be in [4, 12]")
    m = 1 << p
    v = F.col(col).cast("string") if isinstance(col, str) else col.cast("string")
    reg = (F.conv(F.substring(F.md5(v), 1, 8), 16, 10).cast("long")
           % F.lit(m)).alias("reg")
    suf = F.conv(F.substring(F.md5(v), 9, 10), 16, 10).cast("long")
    rho = F.when(suf == 0, F.lit(_SUFFIX_BITS + 1)).otherwise(
        F.lit(_SUFFIX_BITS + 1) - F.length(F.bin(suf))).alias("rho")
    return reg, rho


def hll_sketch(df: DataFrame, col: str, group_cols: list[str] | None = None,
               p: int = 12) -> DataFrame:
    """Register table ``(group..., reg, mj)`` for the values in ``col``.

    NULL values are ignored (SQL COUNT(DISTINCT) semantics). The table
    has ≤ 2^p rows per group and merges with :func:`hll_merge`."""
    group_cols = list(group_cols or [])
    reg, rho = hll_reg_rho(col, p)
    base = df.where(F.col(col).isNotNull()).select(*group_cols, reg, rho)
    return base.groupBy(*group_cols, "reg").agg(F.max("rho").alias("mj"))


def hll_merge(*sketches: DataFrame,
              group_cols: list[str] | None = None) -> DataFrame:
    """Merge register tables built with the same ``p``: union + MAX."""
    group_cols = list(group_cols or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "reg").agg(F.max("mj").alias("mj"))


def hll_estimate(registers: DataFrame, p: int = 12,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Fold a register table to ``(group..., hll_est)``.

    Missing registers contribute 2^0 = 1 to the harmonic denominator;
    V = count of missing registers drives the linear-counting branch."""
    m = 1 << p
    group_cols = list(group_cols or [])
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("s1"),
        F.count(F.lit(1)).alias("c"),
    )
    denom = F.col("s1") + (F.lit(m) - F.col("c")) * F.lit(1.0)
    raw = F.lit(_alpha(m) * m * m) / denom
    v_zero = F.lit(m) - F.col("c")
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero)
    est = F.when((raw <= F.lit(2.5 * m)) & (v_zero > 0), lin).otherwise(raw)
    return agg.select(*group_cols, est.alias("hll_est"))


def hll_count_distinct(df: DataFrame, col: str,
                       group_cols: list[str] | None = None,
                       p: int = 12) -> DataFrame:
    """One-shot sketch + estimate: ``(group..., hll_est)``."""
    return hll_estimate(hll_sketch(df, col, group_cols, p), p, group_cols)


# --- Count-min sketch (Cormode & Muthukrishnan 2005) -------------------------
#
# Frequency estimates with FIXED memory: depth*width counters however many
# rows/keys stream through. est(v) = min over rows i of C[i][h_i(v)] —
# never an underestimate, over by at most eps*N with prob 1-delta for
# width = e/eps, depth = ln(1/delta). The Zipf-head question ("how hot is
# each domain?") answered without a full-key groupBy: the only shuffle is
# groupBy(row, pos) — at most depth*width surviving rows. Mergeable by
# register SUM (partitions / days / shards), same pattern as hll_merge.
#
# Hashing mirrors operators/bloom.py (Kirsch-Mitzenmacher double hashing
# over md5 prefixes), so a plain-SQL oracle recomputes every register AND
# every estimate exactly.

def _cms_pos(value, width: int, row_j: int):
    v = value.cast("string")
    h1 = F.conv(F.substring(F.md5(v), 1, 8), 16, 10).cast("long") % width
    h2 = (F.conv(F.substring(F.md5(v), 9, 10), 16, 10).cast("long")
          % (width - 1)) + 1
    return (h1 + F.lit(row_j) * h2) % width


def _check_cms(width: int, depth: int) -> None:
    if not (2 <= width <= (1 << 24)):
        raise ValueError(f"width must be in [2, 2^24], got {width}")
    if not (1 <= depth <= 16):
        raise ValueError(f"depth must be in [1, 16], got {depth}")


def cms_sketch(df: DataFrame, col: str, width: int = 1 << 12,
               depth: int = 4, weight_col: str | None = None) -> DataFrame:
    """Count-min register table ``(row, pos, cnt)`` for values of ``col``.

    At most ``depth*width`` rows regardless of input size; NULLs are
    skipped. ``weight_col`` switches to the turnstile model (each row
    adds its weight — bytes per URL, tokens per doc — instead of 1; the
    estimate then never underestimates the total weight per key, for
    non-negative weights). Merge shards with :func:`cms_merge`."""
    _check_cms(width, depth)
    v = df.where(F.col(col).isNotNull())
    w = (F.coalesce(F.col(weight_col), F.lit(0)).cast("long")
         if weight_col else F.lit(1).cast("long"))
    rows = v.select(w.alias("_w"), F.explode(F.array(*[
        F.struct(F.lit(j).alias("row"),
                 _cms_pos(F.col(col), width, j).alias("pos"))
        for j in range(depth)])).alias("rp"))
    return (rows.select("_w", "rp.row", "rp.pos")
            .groupBy("row", "pos").agg(F.sum("_w").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum register tables from disjoint shards (associative)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, values: DataFrame, col: str,
                 width: int = 1 << 12, depth: int = 4,
                 out_col: str = "cms_est") -> DataFrame:
    """Estimated frequency for each row of ``values`` (distinct keys).

    min over the depth registers; missing registers count 0 (the key
    hashed only to untouched cells). Join shape: values × depth rows
    against the ≤ depth*width register table — broadcast the SKETCH
    (bounded), never the values."""
    _check_cms(width, depth)
    pos = values.select(
        F.col(col),
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("row"),
                     _cms_pos(F.col(col), width, j).alias("pos"))
            for j in range(depth)])).alias("rp"),
    ).select(col, "rp.row", "rp.pos")
    joined = pos.join(F.broadcast(sketch), ["row", "pos"], "left")
    return (joined.groupBy(col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col)))


# ---------------------------------------------------------------------------
# HDR-style quantile sketch
# ---------------------------------------------------------------------------
# HdrHistogram (Tene) semantics, from scratch: non-negative integer values
# land in log-scaled buckets — exact below 2^sbits, relative width
# <= 2^(1-sbits) above — so the register table is bounded by
# ~52 * 2^sbits rows per group FOREVER, SUM-mergeable across
# partitions/shards/days like the CMS, and every step is integer-exact:
# bucket index from the value's bit length (length(bin(v)) — both
# engines print minimal binary), shifts as EXACT double scaling
# (v < 2^52 keeps v * 2^-k lossless), so a plain-SQL oracle recomputes
# every register, rank, and decoded quantile bit-for-bit.  At 10^12 rows
# percentile(col, ...) is a full sort; this is one groupBy.

_HDR_MAX = 1 << 52  # doubles scale by powers of two losslessly below this


def _check_hdr(sbits: int) -> None:
    if not 2 <= sbits <= 16:
        raise ValueError(f"sbits must be in [2, 16], got {sbits}")


def hdr_bucket(col, sbits: int):
    """Non-negative BIGINT value -> HDR bucket id (integer-exact).

    v < 2^sbits: bucket = v (exact). Otherwise k = bit_length(v) - sbits,
    bucket = k * 2^sbits + floor(v / 2^k) — the mantissa's top sbits bits.
    """
    v = col.cast("long")
    s = F.lit(1 << sbits)
    m = F.length(F.bin(v))  # bit_length for v >= 1
    k = m - F.lit(sbits)
    # 2^k as exact double; v / 2^k is a pure exponent shift -> lossless
    p2k = F.pow(F.lit(2.0), k.cast("double"))
    coarse = k.cast("long") * s + F.floor(v.cast("double") / p2k).cast("long")
    return F.when(v < s, v).otherwise(coarse)


def hdr_decode(bucket_col, sbits: int):
    """Bucket id -> lower edge of the bucket (the quantile estimate).

    Relative error < 2^(1-sbits): the true value lies in
    [edge, edge + 2^k) with 2^k <= edge * 2^(1-sbits).
    """
    u = bucket_col.cast("long")
    s = F.lit(1 << sbits)
    k = F.floor(u / s).cast("long")
    sub = u - k * s
    p2k = F.pow(F.lit(2.0), k.cast("double"))
    return F.when(u < s, u).otherwise((sub.cast("double") * p2k).cast("long"))


def hdr_sketch(df: DataFrame, col: str,
               group_cols: list[str] | None = None,
               sbits: int = 7) -> DataFrame:
    """(group..., bucket, cnt) — the mergeable quantile register table.

    NULLs and negatives are skipped (HDR is a non-negative-value
    histogram; shift or split signed data first). Values >= 2^52 raise
    at runtime rather than silently losing mantissa bits.
    """
    _check_hdr(sbits)
    g = list(group_cols or [])
    v = F.col(col).cast("long")
    checked = F.when(v >= F.lit(_HDR_MAX),
                     F.raise_error(F.lit(
                         f"hdr_sketch: value >= 2^52 in column {col!r}; "
                         "rescale (e.g. to milliseconds) first"))
                     ).otherwise(v)
    rows = df.where(v.isNotNull() & (v >= 0)).select(
        *g, hdr_bucket(checked, sbits).alias("bucket"))
    return rows.groupBy(*g, "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def hdr_merge(*sketches: DataFrame,
              group_cols: list[str] | None = None) -> DataFrame:
    """Sum register tables from disjoint shards (associative)."""
    g = list(group_cols or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*g, "bucket").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(sketch: DataFrame, qs: list[float],
                  group_cols: list[str] | None = None,
                  sbits: int = 7) -> DataFrame:
    """(group..., q, n, est) — the value estimate at each quantile.

    Rank rule: r = max(1, ceil(q * n)); est = decoded lower edge of the
    smallest bucket whose cumulative count reaches r (the classic
    inverted-CDF / `percentile_disc` convention, evaluated on buckets).
    The register-table window is bounded (<= ~52 * 2^sbits rows per
    group), so the per-group sort is trivial however large the corpus.
    """
    _check_hdr(sbits)
    from pyspark.sql import Window

    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"qs must be fractions in (0, 1], got {qs}")
    g = list(group_cols or [])
    w = Window.partitionBy(*g).orderBy("bucket") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(*g)
    cum = sketch.select(
        *g, "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    qdf = F.broadcast(
        sketch.sparkSession.createDataFrame(
            [(float(q),) for q in qs], "q double"))
    hits = cum.crossJoin(qdf).where(
        F.col("cum") >= F.greatest(
            F.lit(1), F.ceil(F.col("q") * F.col("n"))))
    return (hits.groupBy(*g, "q")
            .agg(F.min("bucket").alias("_b"), F.first("n").alias("n"))
            .select(*g, "q", "n",
                    hdr_decode(F.col("_b"), sbits).alias("est")))
