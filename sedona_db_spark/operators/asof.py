"""As-of (nearest-past) join — the time-series primitive Spark lacks.

For every left row, attach the single right row with the LARGEST right
timestamp <= the left timestamp (pandas ``merge_asof`` backward
semantics, exact matches included), optionally within the same ``by``
key and within a ``tolerance``. The canonical trades←quotes /
event←latest-state lookup.

Implementation is the classic union-window, not a join: tag right rows
0 and left rows 1, union, and take ``last(right_payload, ignorenulls)``
over ``(partition ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)`` — at
equal timestamps the right row sorts first, so exact matches are
visible to their left row. ONE shuffle, no row explosion, no
self-join: at 10^12 rows this is a sort-merge pass.

Partitioning:

* ``by=...`` (quotes-per-symbol): partition = the by key. Zipf-hot keys
  serialize within their partition — the same bound any per-key
  sort-merge has.
* ``by=None`` (one global timeline): a single window partition would be
  a one-task scale-killer, so the operator range-buckets the timeline
  by sampled quantiles of the union'd timestamps and injects each
  bucket's CARRY-IN (the latest right row before the bucket start,
  computed from per-bucket maxima with one tiny aggregate) as a synthetic
  right row — every bucket then windows independently. Same two-phase
  trick as the distributed prefix sum in operators/packing.py.

Right rows must be unique per (by, ts); pass ``tiebreak_col`` to let the
operator collapse duplicates deterministically (largest tiebreak wins)
— a silent nondeterministic pick is the alternative, and this engine
does not do silent.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[float] = None,
    tiebreak_col: Optional[str] = None,
    suffix: str = "_asof",
    num_buckets: int = 64,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the nearest right row at-or-before their timestamp
    (``direction="backward"``, the default) or at-or-after
    (``"forward"``) — both include exact matches.

    ``right_cols``: right payload columns to attach (default: all except
    ``ts_col``/``by``), each renamed ``<name><suffix>``; a matched-right
    timestamp column ``<ts_col><suffix>`` is always attached. Unmatched
    (or out-of-``tolerance``, in the same units as ``ts_col`` seconds)
    rows keep NULLs."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or "
                         f"'nearest', got {direction!r}")
    fwd = direction == "forward"
    near = direction == "nearest"
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (ts_col, by)]
    if not right_cols:
        raise ValueError("right side carries no payload columns")

    if tiebreak_col is not None:
        # deterministic duplicate-timestamp rule: largest tiebreak wins
        right = (
            right.groupBy(*([by] if by else []), ts_col)
            .agg(F.max(F.struct(tiebreak_col, *[c for c in right_cols
                                                if c != tiebreak_col]))
                 .alias("_tb"))
            .select(*([by] if by else []), ts_col,
                    *[F.col(f"_tb.{c}").alias(c) for c in
                      dict.fromkeys([tiebreak_col, *right_cols])])
        )

    payload = F.struct(F.col(ts_col).alias("_rts"),
                       *[F.col(c) for c in right_cols])
    rtag = right.select(
        *([F.col(by)] if by else []),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        payload.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    ltag = left.select(
        *([F.col(by)] if by else []),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(rtag.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    u = rtag.unionByName(ltag)

    if by is not None:
        part_cols = [by]
    else:
        # global timeline: quantile buckets + carry-in rows
        qs = [i / num_buckets for i in range(1, num_buckets)]
        splits = sorted(set(u.approxQuantile("_ts", qs, 0.001)))
        bucket = F.lit(0)
        for i, s in enumerate(splits):
            bucket = F.when(F.col("_ts") > F.lit(s), F.lit(i + 1)).otherwise(bucket)
        u = u.withColumn("_bkt", bucket)

        # nearest right row per bucket (tiny: <= num_buckets rows), then
        # the carry-in for bucket b = running nearest over the buckets on
        # the matching side (earlier for backward, later for forward);
        # direction="nearest" injects BOTH carry sets — a backward carry
        # row's _ts <= every left _ts in its bucket, so the forward
        # window pass never sees it as a future match (and vice versa):
        # the two carry families cannot cross-contaminate.
        def carry_rows(forward: bool):
            agg = F.min if forward else F.max
            per_bkt = (
                u.where(F.col("_tag") == 0)
                .groupBy("_bkt").agg(agg(F.struct("_ts", "_rv")).alias("_m"))
            )
            all_bkts = u.select("_bkt").distinct()
            if forward:
                wprev = Window.orderBy("_bkt").rowsBetween(
                    1, Window.unboundedFollowing)
                carry_fn = F.first
            else:
                wprev = Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1)
                carry_fn = F.last
            rows = all_bkts.join(per_bkt, "_bkt", "left").withColumn(
                "_carry", carry_fn("_m", True).over(wprev)
            ).where(F.col("_carry").isNotNull()).select(
                "_bkt",
                F.col("_carry._ts").alias("_ts"),
                F.lit(0).alias("_tag"),
                F.col("_carry._rv").alias("_rv"),
            )
            for c in left.columns:
                rows = rows.withColumn(
                    f"_l_{c}", F.lit(None).cast(left.schema[c].dataType))
            return rows.select(*u.columns)

        if near:
            u = u.unionByName(carry_rows(False)).unionByName(carry_rows(True))
        else:
            u = u.unionByName(carry_rows(fwd))
        part_cols = ["_bkt"]

    def match_col(forward: bool):
        ts_order = F.col("_ts").desc() if forward else F.col("_ts").asc()
        w = (Window.partitionBy(*part_cols)
             .orderBy(ts_order, F.col("_tag").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return F.last("_rv", True).over(w)

    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    ts_type = u.schema["_ts"].dataType

    def secs(c):
        # only the DIFFERENCE matters, so any common affine epoch works;
        # TIMESTAMP_NTZ has no direct numeric cast in Spark 4
        if isinstance(ts_type, (TimestampType, TimestampNTZType, DateType)):
            return F.unix_micros(c.cast("timestamp")).cast("double") / 1e6
        return c.cast("double")

    if near:
        # both passes share one hash exchange (same partition keys); the
        # per-row pick is: smaller absolute gap wins, backward wins exact
        # ties — pandas merge_asof(direction="nearest") parity
        matched = (
            u.withColumn("_mb", match_col(False))
             .withColumn("_mf", match_col(True))
             .where(F.col("_tag") == 1)
        )
        gap_b = secs(F.col("_ts")) - secs(F.col("_mb._rts"))
        gap_f = secs(F.col("_mf._rts")) - secs(F.col("_ts"))
        if tolerance is not None:
            tol = float(tolerance)
            matched = (
                matched.withColumn("_mb", F.when(gap_b <= tol, F.col("_mb")))
                       .withColumn("_mf", F.when(gap_f <= tol, F.col("_mf")))
            )
        matched = matched.withColumn(
            "_match",
            F.when(
                F.col("_mb").isNotNull()
                & (F.col("_mf").isNull() | (gap_b <= gap_f)),
                F.col("_mb"),
            ).otherwise(F.col("_mf")),
        )
    else:
        matched = u.withColumn("_match", match_col(fwd)) \
                   .where(F.col("_tag") == 1)
        if tolerance is not None:
            gap = secs(F.col("_ts")) - secs(F.col("_match._rts"))
            if fwd:
                gap = -gap
            matched = matched.withColumn(
                "_match", F.when(gap <= float(tolerance), F.col("_match")))
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.col("_match._rts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
