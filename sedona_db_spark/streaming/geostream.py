"""Structured Streaming support: streaming geotag + windowed cell rollups.

The reference is a pure batch engine (SURVEY.md §1.1 — no streaming
operator exists in it), so nothing here is required for parity; this
module exists because the north-rule pipeline (a continuously-crawled
pages table) naturally ingests as a stream. Every transform in
sources/pages.py is stateless column/UDF logic, so it lifts onto
readStream unchanged; this module adds the stateful pieces:

* `geotag_stream` — the batch geotagger applied to a streaming frame;
* `windowed_cell_counts` — watermarked tumbling-window counts per quadkey
  cell (late data dropped past the watermark), the streaming analogue of
  the batch per-cell rollup;
* `stream_pages_from_dir` — file-source ingestion of a pages parquet
  directory (the Iceberg-table tail-read stand-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.pages import PAGES_SCHEMA, geotag_pages


def stream_pages_from_dir(spark: SparkSession, path: str,
                          max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def geotag_stream(pages_stream: DataFrame, grid_level: int = 7) -> DataFrame:
    """Stateless — identical logic to the batch path, applied per micro-batch."""
    return geotag_pages(pages_stream, grid_level=grid_level)


def streaming_exact_dedup(
    pages_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST page per content digest seen
    within the watermark horizon. State is one digest per distinct
    document, expired past the watermark — bounded, unlike a naive
    global dropDuplicates (which at 10^12 rows would hold the whole
    corpus's digests forever)."""
    withd = pages_stream.withColumn("digest", F.md5(F.col(text_col)))
    return withd.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["digest"]
    )


def streaming_pip_join(
    tagged_stream: DataFrame,
    zones: DataFrame,
    zone_id: str = "zone_id",
    zone_geom: str = "geometry",
) -> DataFrame:
    """Stream-static point-in-polygon join: the streaming geotagged pages
    against a STATIC zone layer. Stream-static joins are stateless (each
    micro-batch joins against the broadcast polygons), so this is the
    always-on form of the batch two-phase join's broadcast path — the
    shape a continuously-crawled pages firehose actually needs."""
    from ..operators.spatial_join import spatial_join

    pts = tagged_stream.where(F.col("lat").isNotNull())
    # stream side must keep its streaming plan: use the explicit pure-column
    # path (cell assignment + refine are deterministic column exprs)
    return spatial_join(
        pts,
        zones.select(zone_id, zone_geom),
        predicate="within",
        left_geom="__unused__",
        right_geom=zone_geom,
        left_xy=("lon", "lat"),
        broadcast_right=True,
        grid_level=4,
    )


def hot_cell_tracker(
    tagged_stream: DataFrame,
    threshold: int = 100,
    ts_col: str = "warc_ts",
    watermark_delay: str = "2 hours",
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Custom STATEFUL streaming operator via applyInPandasWithState:
    tracks a running page count per quadkey cell and emits a row whenever
    a cell crosses `threshold` (the skew/hotspot detector a web-scale
    geotag pipeline runs continuously — feeds salting decisions, cf.
    spatial_join.salt_hot_cells). State = one int per active cell, expired
    by EVENT-TIME timeout `state_ttl_ms` past the watermark => bounded,
    and no perpetual empty micro-batches (processing-time timeouts keep a
    query busy forever)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType([
        StructField("cell_id", LongType()),
        StructField("total", LongType()),
    ])
    state_schema = StructType([StructField("count", LongType())])

    def track(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"cell_id": [], "total": []})
            return
        n = 0
        max_ev_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            if ts_col in pdf.columns and len(pdf):
                mx = pdf[ts_col].max()
                if mx is not None and not pd.isna(mx):
                    max_ev_ms = max(max_ev_ms, int(mx.timestamp() * 1000))
        (prev,) = state.get if state.exists else (0,)
        total = prev + n
        state.update((total,))
        # anchor the TTL on max(watermark, batch event time): in the FIRST
        # micro-batch the watermark is still 0 (epoch), so watermark+TTL
        # would be a 1970 timestamp and the state would silently expire as
        # soon as the real watermark advances — state built in batch 1
        # vanished before batch 2 (file-order-dependent flake)
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), max_ev_ms) + state_ttl_ms)
        if prev < threshold <= total:
            yield pd.DataFrame({"cell_id": [key[0]], "total": [total]})
        else:
            yield pd.DataFrame({"cell_id": [], "total": []})

    return (
        tagged_stream.where(F.col("cell_id").isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .groupBy("cell_id")
        .applyInPandasWithState(
            track, out_schema, state_schema, "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def windowed_cell_counts(
    tagged_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Tumbling-window page counts per cell with late-data handling.

    Output: (window struct, cell_id, n_pages, n_geotagged). Rows later than
    the watermark past their window close are dropped (state is bounded —
    the property that matters at 10^12 rows/day)."""
    return (
        tagged_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("cell_id"))
        .agg(
            F.count("*").alias("n_pages"),
            F.count("lat").alias("n_geotagged"),
        )
    )


def streaming_hll_registers(
    stream: DataFrame,
    value_col: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "warc_ts",
    p: int = 8,
) -> DataFrame:
    """Per-window HyperLogLog registers over a stream: distinct-count
    state in ≤ 2^p rows per window FOREVER.

    The register update is MAX (associative + idempotent), so replayed
    batches, at-least-once sources, and late-but-within-watermark rows
    can never inflate the estimate — the property a streaming
    count-distinct over an append log does not have. The register
    assignment is `operators/sketch.hll_reg_rho` (md5-deterministic), so
    the streamed register table is byte-identical to the batch
    `hll_sketch` over the same rows; finalize windows with
    `sketch.hll_estimate` on the materialized output.

    Output: (window struct, reg, mj)."""
    from sedona_db_spark.operators.sketch import hll_reg_rho

    reg, rho = hll_reg_rho(value_col, p)
    return (
        stream.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .select(F.col(ts_col), reg, rho)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("reg"))
        .agg(F.max("rho").alias("mj"))
    )


def streaming_cms_registers(
    stream: DataFrame,
    value_col: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "warc_ts",
    width: int = 1 << 12,
    depth: int = 4,
    event_id_col: str | None = None,
) -> DataFrame:
    """Per-window count-min registers over a stream: heavy-hitter state
    in ≤ depth*width rows per window FOREVER.

    Unlike the HLL's MAX, the CMS update is SUM — NOT idempotent — so an
    at-least-once source replaying a micro-batch would inflate counts.
    Pass ``event_id_col`` to insert a watermark-scoped
    ``dropDuplicates`` on (event id) ahead of the count: replays and
    duplicate deliveries inside the watermark are then absorbed and the
    streamed registers match the batch `cms_sketch` over the distinct
    rows exactly. Leave it None only on an exactly-once source.

    The register assignment is `operators/sketch._cms_pos`
    (md5-deterministic), so finalize windows with `sketch.cms_estimate`
    on the materialized output.

    Output: (window struct, row, pos, cnt)."""
    from sedona_db_spark.operators.sketch import _check_cms, _cms_pos

    _check_cms(width, depth)
    s = stream.where(F.col(value_col).isNotNull()) \
        .withWatermark(ts_col, watermark_delay)
    if event_id_col is not None:
        s = s.dropDuplicates([event_id_col, ts_col])
    rows = s.select(F.col(ts_col), F.explode(F.array(*[
        F.struct(F.lit(j).alias("row"),
                 _cms_pos(F.col(value_col), width, j).alias("pos"))
        for j in range(depth)])).alias("rp"))
    return (
        rows.select(ts_col, "rp.row", "rp.pos")
        .groupBy(F.window(F.col(ts_col), window_duration),
                 F.col("row"), F.col("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def trajectory_tracker(
    events: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "event_ts",
    x_col: str = "lon",
    y_col: str = "lat",
    max_points: int = 256,
    watermark_delay: str = "2 hours",
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Custom STATEFUL streaming operator: assembles per-entity
    trajectories (LINESTRING M, measure = epoch seconds) incrementally
    from a point-event stream via applyInPandasWithState.

    Each micro-batch merges the entity's new points into its stored
    track (kept sorted by time, deduplicated on timestamp, capped at the
    NEWEST ``max_points`` — bounded state, the property that matters at
    10^12 events/day) and emits the entity's current trajectory WKB plus
    point count.  Ties into the batch side: the emitted column feeds
    ST_IsValidTrajectory / ST_DistanceCPA / operators/cpa_join.py
    unchanged.  State expires by EVENT-TIME timeout past the watermark,
    so idle entities cost nothing and no perpetual empty micro-batches
    occur."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType([
        StructField("entity_id", StringType()),
        StructField("traj", BinaryType()),
        StructField("n_points", IntegerType()),
    ])
    state_schema = StructType([
        StructField("xs", ArrayType(DoubleType())),
        StructField("ys", ArrayType(DoubleType())),
        StructField("ts", ArrayType(DoubleType())),
    ])

    def track(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        from ..geometry import wkb as _wkb
        from ..geometry.wkb import Geometry, LINESTRING

        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"entity_id": [], "traj": [], "n_points": []})
            return
        xs, ys, ts = [], [], []
        if state.exists:
            sx, sy, st_ = state.get
            xs, ys, ts = list(sx), list(sy), list(st_)
        for pdf in pdfs:
            xs.extend(float(v) for v in pdf[x_col])
            ys.extend(float(v) for v in pdf[y_col])
            ts.extend(float(v.timestamp()) if hasattr(v, "timestamp")
                      else float(v) for v in pdf[ts_col])
        arr = np.array([ts, xs, ys], dtype=np.float64).T
        # sort by time, dedup equal timestamps (last write wins), cap to
        # the newest max_points so state stays bounded
        arr = arr[np.argsort(arr[:, 0], kind="stable")]
        keep = np.concatenate([np.diff(arr[:, 0]) > 0, [True]])
        arr = arr[keep][-max_points:]
        state.update((arr[:, 1].tolist(), arr[:, 2].tolist(),
                      arr[:, 0].tolist()))
        # TTL anchored on max(watermark, newest point): the batch-1
        # watermark is 0, and watermark+TTL alone would expire the track
        # before batch 2 (see hot_cell_tracker note)
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(),
                int(arr[-1, 0] * 1000) if len(arr) else 0) + state_ttl_ms)
        if len(arr) < 2:
            yield pd.DataFrame({"entity_id": [], "traj": [], "n_points": []})
            return
        coords = np.column_stack([arr[:, 1], arr[:, 2], arr[:, 0]])
        g = Geometry(LINESTRING, coords, has_z=False, has_m=True)
        yield pd.DataFrame({
            "entity_id": [key[0]],
            "traj": [_wkb.encode(g)],
            "n_points": [int(len(arr))],
        })

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(entity_col)
        .applyInPandasWithState(
            track, out_schema, state_schema, "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_minhash_candidates(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "event_ts",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 1,
    max_bucket: int = 256,
    watermark_delay: str = "2 hours",
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming near-duplicate candidates: the batch MinHash+LSH
    pipeline (operators/dedup.py) re-expressed over an unbounded stream
    with BOUNDED per-bucket state.

    Stateless stages reuse the batch kernels verbatim — the signature
    UDF and the (band, bkey) construction are the same code, so a doc
    lands in the same buckets streaming or batch.  The stateful stage
    keys by (band, bkey) via applyInPandasWithState: state = the doc ids
    seen in that bucket (capped at ``max_bucket``; a hotter bucket stops
    emitting new pairs and sets ``truncated`` — at 10^12 docs an
    unbounded hot bucket IS the failure mode, and near-dup semantics
    degrade gracefully because every doc already emitted against the
    first ``max_bucket`` members).  Event-time TTL expires idle buckets.

    Output: (id_a, id_b, band) candidate pairs, id_a < id_b — the same
    contract as ``minhash_lsh_candidates`` minus the signature-verify
    stage (run it batch-side on the much smaller candidate stream)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.dedup import minhash_signature_udf

    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signature_udf(num_hashes, shingle_k, seed, scheme="poly31")

    S = docs_stream.withWatermark(ts_col, watermark_delay).select(
        F.col(id_col).alias("doc_id"), F.col(ts_col),
        sig(F.col(text_col)).alias("sig"),
    ).where(F.col("sig").isNotNull())
    band_rows = S.select(
        "doc_id", ts_col,
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.element_at("sig", b * rows_per_band + r + 1)
                             for r in range(rows_per_band)]).alias("bkey"),
            )
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc_id", ts_col, F.col("bb.band").alias("band"),
             F.col("bb.bkey").alias("bkey"))

    out_schema = StructType([
        StructField("id_a", StringType()),
        StructField("id_b", StringType()),
        StructField("band", IntegerType()),
    ])
    state_schema = StructType([
        StructField("ids", StringType()),      # \x1f-joined (bounded)
        StructField("truncated", LongType()),
    ])

    def track(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"id_a": [], "id_b": [], "band": []})
            return
        band = int(key[0])
        seen, trunc = [], 0
        if state.exists:
            blob, trunc = state.get
            seen = blob.split("\x1f") if blob else []
        new_ids = []
        pdfs_seen = []
        for pdf in pdfs:
            pdfs_seen.append(pdf)
            for d in pdf["doc_id"]:
                d = str(d)
                if d not in seen and d not in new_ids:
                    new_ids.append(d)
        a_out, b_out = [], []
        for i, d in enumerate(new_ids):
            if len(seen) + i >= max_bucket:
                trunc = 1
                break
            for other in seen + new_ids[:i]:
                lo, hi = (d, other) if d < other else (other, d)
                a_out.append(lo)
                b_out.append(hi)
        keep = (seen + new_ids)[:max_bucket]
        state.update(("\x1f".join(keep), trunc))
        # TTL anchored on max(watermark, batch event time) — the batch-1
        # watermark is epoch 0, and watermark+TTL alone expired batch-1
        # buckets before batch 2, silently losing cross-batch candidate
        # pairs (file-order-dependent flake caught by the full suite)
        max_ev_ms = 0
        for pdf in pdfs_seen:
            if len(pdf):
                mx = pdf[ts_col].max()
                if mx is not None and not pd.isna(mx):
                    max_ev_ms = max(max_ev_ms, int(mx.timestamp() * 1000))
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), max_ev_ms) + state_ttl_ms)
        yield pd.DataFrame({"id_a": a_out, "id_b": b_out,
                            "band": [band] * len(a_out)})

    return (
        band_rows.groupBy("band", "bkey")
        .applyInPandasWithState(
            track, out_schema, state_schema, "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
