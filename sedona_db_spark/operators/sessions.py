"""Gap-based sessionization (batch + streaming-shaped).

Web/event corpora need "group this user's events into sessions separated
by >= gap of silence" — e.g. crawl sessions per host, user sessions per
visitor. Spark has a NATIVE operator for exactly this shape:
`F.session_window` (a Catalyst session-window aggregation with map-side
partial merge, usable identically in batch and Structured Streaming), so
the implementation is declarative — no window-function self-scan, no
Python.

Scale: one shuffle on the key; session merging is streaming-safe (the
same call under `readStream` + watermark produces incremental sessions).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap: str,
    aggs: Optional[Dict[str, Column]] = None,
) -> DataFrame:
    """Aggregate events into per-key sessions split at >= `gap` of silence.

    gap: a Spark interval string, e.g. "30 minutes".
    aggs: output-name -> aggregate Column (default: n_events count).

    Output: key cols + session_start / session_last (first/last event
    timestamps — NOT the padded window end, so semantics are engine-
    independent) + the aggregates.
    """
    if aggs is None:
        aggs = {"n_events": F.count(F.lit(1))}
    agg_cols = [v.alias(k) for k, v in aggs.items()]
    out = (
        df.groupBy(F.session_window(F.col(ts_col), gap), *[F.col(k) for k in key_cols])
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_last"),
            *agg_cols,
        )
        .drop("session_window")
    )
    return out
