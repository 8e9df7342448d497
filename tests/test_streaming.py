"""Structured Streaming geotag + windowed rollup tests (memory sink,
processAllAvailable for determinism)."""

from pyspark.sql import functions as F

from sedona_db_spark.sources import pages as P
from sedona_db_spark.streaming import geostream as GS


def test_stream_geotag_and_window(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    P.synthesize_pages(spark, 1500, partitions=5).write.mode("overwrite").parquet(src)

    stream = GS.stream_pages_from_dir(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming
    tagged = GS.geotag_stream(stream, grid_level=5)
    counts = GS.windowed_cell_counts(tagged, "1 hour", "2 hours")

    q = (
        counts.writeStream.format("memory")
        .queryName("cell_counts")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(
            "SELECT sum(n_pages) AS total, sum(n_geotagged) AS geo, "
            "count(DISTINCT cell_id) AS cells FROM cell_counts"
        ).collect()[0]
    finally:
        q.stop()

    # batch ground truth
    batch = P.geotag_pages(spark.read.parquet(src), grid_level=5)
    want_total = batch.count()
    want_geo = batch.where(F.col("lat").isNotNull()).count()
    want_cells = batch.select("cell_id").distinct().count()  # incl. null row

    # streaming update-mode may emit a key several times across batches;
    # the memory sink keeps every update, so compare against the LAST
    # update per (window, cell) instead of raw sums
    last = spark.sql(
        "SELECT window, cell_id, max(n_pages) AS n_pages, max(n_geotagged) AS g "
        "FROM cell_counts GROUP BY window, cell_id"
    )
    got_total = last.agg(F.sum("n_pages")).collect()[0][0]
    got_geo = last.agg(F.sum("g")).collect()[0][0]
    assert got_total == want_total
    assert got_geo == want_geo
    got_cells = last.select("cell_id").distinct().count()
    assert got_cells == want_cells


def test_streaming_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    df = P.synthesize_pages(spark, 600, partitions=3)
    # plant exact duplicates: same text under different urls
    dup = df.limit(50).withColumn("url", F.concat(F.col("url"), F.lit("?copy")))
    df.union(dup).write.mode("overwrite").parquet(src)

    stream = GS.stream_pages_from_dir(spark, src, max_files_per_trigger=2)
    deduped = GS.streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) c, count(DISTINCT digest) d FROM dedup_out").collect()[0]
    finally:
        q.stop()
    want = spark.read.parquet(src).select(F.md5("text")).distinct().count()
    assert got["d"] == want
    assert got["c"] == got["d"]  # exactly one survivor per digest


def test_streaming_pip_join_matches_batch(spark, tmp_path):
    from sedona_db_spark.geometry import wkb
    from sedona_db_spark.operators.spatial_join import spatial_join

    src = str(tmp_path / "pip_src")
    P.synthesize_pages(spark, 800, partitions=4).write.mode("overwrite").parquet(src)
    zones = spark.createDataFrame(
        [(i, wkb.encode(wkb.box(-180 + (i % 5) * 72.0, -90 + (i // 5) * 36.0,
                                -180 + (i % 5 + 1) * 72.0, -90 + (i // 5 + 1) * 36.0)))
         for i in range(25)],
        "zone_id LONG, geometry BINARY",
    )
    stream = GS.geotag_stream(GS.stream_pages_from_dir(spark, src, 2), grid_level=4)
    joined = GS.streaming_pip_join(stream, zones)
    q = (
        joined.select("url", "zone_id").writeStream.format("memory")
        .queryName("pip_out").outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {(r["url"], r["zone_id"]) for r in spark.sql("SELECT * FROM pip_out").collect()}
    finally:
        q.stop()
    batch_tagged = P.geotag_pages(spark.read.parquet(src), grid_level=4).where(
        F.col("lat").isNotNull()
    )
    want_df = spatial_join(
        batch_tagged, zones, predicate="within", left_geom="__unused__",
        right_geom="geometry", left_xy=("lon", "lat"), broadcast_right=True,
        grid_level=4,
    )
    want = {(r["url"], r["zone_id"]) for r in want_df.select("url", "zone_id").collect()}
    assert got == want
    assert len(got) > 0


def test_hot_cell_tracker(spark, tmp_path):
    src = str(tmp_path / "hot_src")
    P.synthesize_pages(spark, 1200, partitions=3).write.mode("overwrite").parquet(src)
    tagged_batch = P.geotag_pages(spark.read.parquet(src), grid_level=3)
    counts = {r["cell_id"]: r["c"] for r in tagged_batch.where(F.col("cell_id").isNotNull())
              .groupBy("cell_id").agg(F.count("*").alias("c")).collect()}
    threshold = 50
    want_hot = {c for c, n in counts.items() if n >= threshold}
    assert want_hot  # Zipf-skewed geotags guarantee hot cells

    stream = GS.geotag_stream(GS.stream_pages_from_dir(spark, src, 1), grid_level=3)
    hot = GS.hot_cell_tracker(stream, threshold=threshold)
    q = hot.writeStream.format("memory").queryName("hot_out").outputMode("update").start()
    try:
        q.processAllAvailable()
        got = {r["cell_id"] for r in spark.sql("SELECT DISTINCT cell_id FROM hot_out").collect()}
    finally:
        q.stop()
    assert got == want_hot


def test_streaming_hll_matches_batch_registers(spark, tmp_path):
    """Streamed per-window HLL registers must equal the batch hll_sketch
    over the same rows EXACTLY (md5-deterministic assignment, MAX merge
    across micro-batches), and the estimate must be accurate."""
    from sedona_db_spark.operators.sketch import hll_estimate, hll_sketch

    src = str(tmp_path / "pages_hll")
    P.synthesize_pages(spark, 1200, partitions=6).write.mode("overwrite").parquet(src)

    stream = GS.stream_pages_from_dir(spark, src, max_files_per_trigger=2)
    regs = GS.streaming_hll_registers(stream, "url", "6 hours", "1 hour",
                                      ts_col="warc_ts", p=8)
    q = (regs.writeStream.format("memory").queryName("hll_regs")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        # update mode re-emits registers as they grow; keep the last (max)
        streamed = spark.sql(
            "SELECT window.start AS ws, reg, max(mj) AS mj "
            "FROM hll_regs GROUP BY 1, 2")
    finally:
        q.stop()
    streamed = streamed.collect()

    batch = spark.read.parquet(src).withColumn(
        "ws", F.window(F.col("warc_ts"), "6 hours").getField("start"))
    want = {(r["ws"], r["reg"]): r["mj"]
            for r in hll_sketch(batch, "url", ["ws"], p=8).collect()}
    got = {(r["ws"], r["reg"]): r["mj"] for r in streamed}
    assert got == want

    # estimate accuracy on the materialized registers (one window is fine)
    regs_df = spark.createDataFrame(
        [(r["ws"], r["reg"], r["mj"]) for r in streamed],
        "ws timestamp, reg long, mj long")
    est = {r["ws"]: r["hll_est"]
           for r in hll_estimate(regs_df, p=8, group_cols=["ws"]).collect()}
    exact = {r["ws"]: r["n"] for r in batch.groupBy("ws").agg(
        F.countDistinct("url").alias("n")).collect()}
    for ws, n in exact.items():
        assert abs(est[ws] - n) / max(n, 1) < 0.3


def test_streaming_cms_matches_batch_and_absorbs_replay(spark, tmp_path):
    """Streamed per-window CMS registers over an at-least-once source
    (the same file delivered twice) must equal the batch cms_sketch over
    the DISTINCT rows exactly — the event-id dropDuplicates absorbs the
    replay that a raw SUM would double-count."""
    from sedona_db_spark.operators.sketch import cms_estimate, cms_sketch

    src = str(tmp_path / "pages_cms")
    base = P.synthesize_pages(spark, 800, partitions=4)
    base.write.mode("overwrite").parquet(src)
    # replay: the identical rows land again as new files
    base.coalesce(2).write.mode("append").parquet(src)

    W, D = 1 << 8, 3
    stream = GS.stream_pages_from_dir(spark, src, max_files_per_trigger=2)
    regs = GS.streaming_cms_registers(stream, "lang", "6 hours", "1 hour",
                                      ts_col="warc_ts", width=W, depth=D,
                                      event_id_col="url")
    q = (regs.writeStream.format("memory").queryName("cms_regs")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        # update mode re-emits a register as it grows: the max is final
        streamed = spark.sql(
            "SELECT window.start AS ws, row, pos, max(cnt) AS cnt "
            "FROM cms_regs GROUP BY 1, 2, 3").collect()
    finally:
        q.stop()

    batch = (spark.read.parquet(src).dropDuplicates(["url", "warc_ts"])
             .withColumn("ws", F.window(F.col("warc_ts"), "6 hours")
                         .getField("start")))
    want = {}
    for ws_row in batch.select("ws").distinct().collect():
        ws = ws_row["ws"]
        sk = cms_sketch(batch.where(F.col("ws") == ws), "lang",
                        width=W, depth=D)
        for r in sk.collect():
            want[(ws, r["row"], r["pos"])] = r["cnt"]
    got = {(r["ws"], r["row"], r["pos"]): r["cnt"] for r in streamed}
    assert got == want

    # finalize: per-window heavy-hitter estimates never underestimate
    one_ws = max(set(ws for ws, _, _ in got), key=lambda w: sum(
        c for (ws2, _, _), c in got.items() if ws2 == w))
    regs_df = spark.createDataFrame(
        [(r, p, c) for (ws, r, p), c in got.items() if ws == one_ws],
        "row long, pos long, cnt long")
    langs = batch.where(F.col("ws") == one_ws).select("lang").distinct()
    est = {r["lang"]: r["cms_est"] for r in cms_estimate(
        regs_df, langs, "lang", width=W, depth=D).collect()}
    exact = {r["lang"]: r["n"] for r in
             batch.where(F.col("ws") == one_ws).groupBy("lang")
             .agg(F.count("*").alias("n")).collect()}
    for k, n in exact.items():
        assert est[k] >= n


def test_trajectory_tracker(spark, tmp_path):
    """Streaming per-entity trajectory assembly equals the batch-built
    LINESTRING M, and the emitted WKB feeds the batch CPA kernels."""
    import numpy as np

    from sedona_db_spark.geometry import trajectory as TJ, wkb as WKB

    src = str(tmp_path / "traj_src")
    rows = []
    # 6 entities x 20 ordered pings; files split so several micro-batches
    # each carry partial tracks.  BASE keeps event times away from epoch
    # 0 — Spark's watermark floors at 0, so a 1970-01-01T00:00:00 event
    # is "late" against the initial watermark and silently dropped.
    BASE = 1_700_000_000.0
    for e in range(6):
        for t in range(20):
            rows.append((
                f"ent-{e}",
                BASE + float(t * 60),               # epoch seconds
                float(e * 10 + t * 0.5),
                float(e * 5 + (t % 7) * 0.25),
            ))
    df = spark.createDataFrame(
        rows, "entity_id string, ts double, lon double, lat double"
    ).withColumn("event_ts", F.timestamp_seconds(F.col("ts"))).drop("ts")
    df.repartition(5).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    traj = GS.trajectory_tracker(stream, entity_col="entity_id",
                                 ts_col="event_ts")
    q = (
        traj.writeStream.format("memory").queryName("traj_out")
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT entity_id, traj, n_points FROM traj_out "
            "WHERE n_points = (SELECT max(n_points) FROM traj_out t2 "
            "                  WHERE t2.entity_id = traj_out.entity_id)"
        ).collect()
    finally:
        q.stop()

    final = {r.entity_id: r for r in got}
    assert set(final) == {f"ent-{e}" for e in range(6)}
    for e in range(6):
        r = final[f"ent-{e}"]
        assert r.n_points == 20
        g = WKB.parse(bytes(r.traj))
        assert TJ.is_valid_trajectory(g) is True
        c = g.coords
        # matches the batch-built track exactly
        assert np.allclose(c[:, 0], [e * 10 + t * 0.5 for t in range(20)])
        assert np.allclose(c[:, 2], [BASE + t * 60 for t in range(20)])
    # and the streamed WKB drives the batch CPA kernel unchanged
    a = WKB.parse(bytes(final["ent-0"].traj))
    b = WKB.parse(bytes(final["ent-1"].traj))
    assert TJ.distance_cpa(a, b) is not None


def test_streaming_minhash_candidates(spark, tmp_path):
    """Streaming LSH candidates equal the batch minhash_lsh_candidates
    pair set (same signature + band kernels), across micro-batches."""
    from sedona_db_spark.operators.dedup import minhash_lsh_candidates

    src = str(tmp_path / "mh_src")
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about spark query planning",
        "numpy vectorization of geometry kernels for fun and profit",
    ]
    rows = []
    BASE_TS = 1_700_000_000.0
    n = 0
    for i, t in enumerate(base):
        for rep in range(4):          # 4 near-copies per family
            text = t + (" tail" * rep)
            rows.append((f"d{i}-{rep}", text, BASE_TS + n))
            n += 1
    df = spark.createDataFrame(rows, "doc_id string, text string, ts double") \
        .withColumn("event_ts", F.timestamp_seconds(F.col("ts"))).drop("ts")
    df.repartition(4).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    cand = GS.streaming_minhash_candidates(stream)
    q = (cand.writeStream.format("memory").queryName("mh_cand")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        got = {(r.id_a, r.id_b) for r in
               spark.sql("SELECT DISTINCT id_a, id_b FROM mh_cand").collect()}
    finally:
        q.stop()

    batch = minhash_lsh_candidates(spark.read.parquet(src),
                                   "text", "doc_id")
    want = {(r.id_a, r.id_b) for r in batch.select("id_a", "id_b").collect()}
    assert got == want
    assert want      # the near-copy families produce real candidates
    # different families never collide
    for a, b in got:
        assert a.split("-")[0] == b.split("-")[0]
