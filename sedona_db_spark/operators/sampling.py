"""Deterministic sampling / per-group capping for training-data pipelines.

Web-corpus jobs routinely need "keep 20% of German, 50% of English" or
"at most N documents per domain, best-quality first". Both must be
DETERMINISTIC (re-runs and retried tasks must keep the same rows — a
`rand()` filter silently changes the corpus under task retry) and
shuffle-light at 100 TB.

* `stratified_sample` — pure column algebra, ZERO shuffle: the keep
  decision is a hash of the row's own key, so any executor decides any
  row independently. This is the map-side ideal; Spark's own
  `sampleBy` is seeded per-partition and NOT stable under
  repartitioning, which is why we hash content instead.
* `domain_top_k` — one shuffle on the group key (window row_number);
  an optional pre-aggregation salt bounds the per-task row count under
  Zipf-skewed domains (the hot-domain pattern the north rule calls out).

Both are BIGINT-safe arithmetic only, so a plain-SQL oracle reproduces
every kept row bit-for-bit (same scheme as operators/dedup.py poly31).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

_P31 = 2147483647  # 2^31 - 1 (Mersenne)
_MULT = 2654435761  # Knuth multiplicative constant, < 2^32
_BUCKETS = 1_000_000


def sample_bucket(key, seed: int = 1):
    """Deterministic bucket in [0, 1e6) from a BIGINT key.

    ((|key| % p) * mult + seed) % p % 1e6 — every intermediate fits in a
    BIGINT ((2^31)·mult < 2^63), so DuckDB/ANSI SQL recomputes it
    verbatim (the dedup poly31 trick, dedup.py:95).
    """
    h = (F.abs(key.cast("long")) % _P31) * F.lit(_MULT) + F.lit(int(seed))
    return (h % _P31) % _BUCKETS


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    seed: int = 1,
) -> DataFrame:
    """Keep a per-stratum fraction of rows, decided by a content hash.

    fractions: stratum value -> fraction in [0, 1]. Fractions are
    quantized to parts-per-million DRIVER-side so the kept set is exactly
    reproducible in SQL (no float-comparison ambiguity). Rows whose
    stratum is missing from `fractions` keep `default_fraction`.

    Scale: no shuffle, no sampling pass, no driver state — a pure filter
    that pushes into the scan's projection. Deterministic under task
    retry, repartitioning, and AQE re-planning (unlike df.sampleBy, which
    seeds per-partition).
    """
    ppm = {k: int(round(v * _BUCKETS)) for k, v in fractions.items()}
    for k, v in ppm.items():
        if not (0 <= v <= _BUCKETS):
            raise ValueError(f"fraction for {k!r} outside [0, 1]")
    default_ppm = int(round(default_fraction * _BUCKETS))
    thresh = F.lit(default_ppm)
    for k, v in ppm.items():
        thresh = F.when(F.col(strata_col) == F.lit(k), F.lit(v)).otherwise(thresh)
    return df.where(sample_bucket(F.col(key_col), seed) < thresh)


def domain_top_k(
    df: DataFrame,
    group_col: str,
    k: int,
    order_by: Sequence,
    tiebreak_col: Optional[str] = None,
    salt_replicas: int = 0,
    rank_name: str = "rank_in_group",
) -> DataFrame:
    """Keep the top `k` rows per group (e.g. best-quality docs per domain).

    order_by: list of Columns (e.g. ``[F.col("quality").desc()]``);
    `tiebreak_col` (an id column) is appended ascending so the kept set
    is total-order deterministic.

    Scale: one shuffle on `group_col`. For Zipf-hot groups (one domain =
    10% of the corpus) set `salt_replicas=s`: a first window over
    (group, hash(id) % s) keeps s*k rows per group, bounding any single
    task at ~|group|/s rows before the exact final window — the standard
    two-phase top-k under skew.
    """
    order = list(order_by)
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    if salt_replicas > 1:
        if tiebreak_col is None:
            raise ValueError("salt_replicas requires tiebreak_col (the salt key)")
        salt = sample_bucket(F.col(tiebreak_col), seed=7) % salt_replicas
        w1 = Window.partitionBy(F.col(group_col), salt).orderBy(*order)
        df = df.withColumn("_r1", F.row_number().over(w1)).where(
            F.col("_r1") <= k
        ).drop("_r1")
    w = Window.partitionBy(group_col).orderBy(*order)
    return df.withColumn(rank_name, F.row_number().over(w)).where(
        F.col(rank_name) <= k
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    keep_max_frac: float = 1.0,
    seed: int = 1,
) -> DataFrame:
    """Temperature-balanced per-group downsampling: kept ∝ count^alpha.

    The multilingual-corpus rebalancing rule (mC4 / CC-100 style): with
    alpha < 1, head groups (English) are downsampled harder than tail
    groups (Welsh), flattening the distribution toward uniform as
    alpha -> 0 while alpha = 1 keeps everything. The keep probability is
    NORMALIZATION-FREE:

        p_g = min(1, keep_max_frac * (n_max / n_g) ** (1 - alpha))

    so the largest group keeps exactly ``keep_max_frac`` and expected
    kept counts are proportional to n_g^alpha. Avoiding the usual
    sum-normalization constant is deliberate: n_max is an integer MAX
    (no float summation order), so every p_g is a short chain of exactly
    rounded IEEE ops that any SQL engine reproduces bit-for-bit. For
    alpha = 0.5 the power is computed with sqrt() (exactly rounded and
    engine-portable, unlike general pow()).

    Scale shape: one groupBy over ``group_col`` (#groups rows — languages,
    not documents), a 1-row max cross-joined back, and ONE broadcast join
    of the tiny ppm table onto the corpus; the keep decision is the same
    content-hash rule as :func:`stratified_sample` (retry/partitioning
    stable), zero Python, zero corpus shuffle.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if not 0.0 <= keep_max_frac <= 1.0:
        raise ValueError(f"keep_max_frac must be in [0, 1], got {keep_max_frac}")
    cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    mx = cnt.agg(F.max("_n").alias("_nmax"))
    ratio = cnt.crossJoin(F.broadcast(mx)).select(
        group_col,
        (F.col("_nmax").cast("double") / F.col("_n").cast("double")).alias("_ratio"),
    )
    if alpha == 0.5:
        boost = F.sqrt(F.col("_ratio"))
    elif alpha == 1.0:
        boost = F.lit(1.0)
    else:
        # general pow() is not guaranteed identically rounded across
        # engines; fine for the engine itself, but oracle queries should
        # stick to alpha in {0.5, 1.0}
        boost = F.pow(F.col("_ratio"), F.lit(1.0 - alpha))
    ppm = ratio.select(
        group_col,
        F.floor(F.least(F.lit(1.0), F.lit(keep_max_frac) * boost)
                * F.lit(float(_BUCKETS)) + F.lit(0.5)).cast("long").alias("_ppm"),
    )
    # null-SAFE join: groupBy counts NULL groups as a real group, so a
    # plain equi-join would silently drop every NULL-group row here
    ppm = ppm.withColumnRenamed(group_col, "_grp")
    return (
        df.join(F.broadcast(ppm), F.col(group_col).eqNullSafe(F.col("_grp")))
        .where(sample_bucket(F.col(key_col), seed) < F.col("_ppm"))
        .drop("_ppm", "_grp")
    )
