"""sessionize: gap-based session_window wrapper — batch brute force +
boundary semantics + streaming parity with the batch result."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sedona_db_spark.operators.sessions import sessionize

T0 = dt.datetime(2024, 1, 1)


def _mk_events():
    # two users; gaps of 10/40/30(exact)/31 minutes around a 30-minute gap
    rows = []
    offs_u1 = [0, 10, 50, 80, 111]  # sessions: [0,10], [50,80(exact-gap merge)], [111]
    for i, m in enumerate(offs_u1):
        rows.append((i, 1, T0 + dt.timedelta(minutes=m), float(i)))
    offs_u2 = [0, 31]  # 31 > 30 -> two sessions
    for i, m in enumerate(offs_u2):
        rows.append((10 + i, 2, T0 + dt.timedelta(minutes=m), 1.0))
    return rows


def _brute_sessions(rows, gap_min=30):
    by_user = {}
    for _, u, ts, v in sorted(rows, key=lambda r: (r[1], r[2])):
        s = by_user.setdefault(u, [])
        if s and (ts - s[-1]["last"]).total_seconds() <= gap_min * 60:
            s[-1]["last"] = ts
            s[-1]["n"] += 1
            s[-1]["sum"] += v
        else:
            s.append({"start": ts, "last": ts, "n": 1, "sum": v})
    out = set()
    for u, ss in by_user.items():
        for s in ss:
            out.add((u, s["start"], s["last"], s["n"], round(s["sum"], 6)))
    return out


def test_sessionize_batch_matches_brute_force(spark):
    rows = _mk_events()
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    out = sessionize(df, "ts", ["user_id"], "30 minutes",
                     {"n_events": F.count(F.lit(1)),
                      "sum_value": F.round(F.sum("value"), 6)})
    got = {(r["user_id"], r["session_start"], r["session_last"],
            r["n_events"], r["sum_value"]) for r in out.collect()}
    assert got == _brute_sessions(rows)
    # exact-gap event merges; 31-minute gap splits
    per_user = {}
    for u, *_ in got:
        per_user[u] = per_user.get(u, 0) + 1
    assert per_user == {1: 3, 2: 2}


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    rows = _mk_events()
    src = str(tmp_path / "events_src")
    schema = "event_id long, user_id long, ts timestamp, value double"
    df = spark.createDataFrame(rows, schema)
    # deliver files in EVENT-TIME order (a time-ordered ingest feed): out-of-
    # order delivery beyond the watermark is legitimate late data and would
    # rightly produce partial sessions, which is not what this test checks
    ordered = sorted(rows, key=lambda r: r[2])
    import time as _time

    for i in range(3):
        chunk = ordered[i * 3:(i + 1) * 3] or ordered[-1:]
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    # session-window streaming aggregations only support APPEND output:
    # a session is emitted once the watermark passes its end (last + gap),
    # i.e. once no future event can merge into it
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 seconds")
    )
    sess = sessionize(stream, "ts", ["user_id"], "30 minutes",
                      {"n_events": F.count(F.lit(1))})
    q = (
        sess.writeStream.format("memory").queryName("sessions_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {(r["user_id"], r["session_start"], r["session_last"], r["n_events"])
               for r in spark.sql("SELECT * FROM sessions_out").collect()}
    finally:
        q.stop()
    batch = {(r["user_id"], r["session_start"], r["session_last"], r["n_events"])
             for r in sessionize(df, "ts", ["user_id"], "30 minutes").collect()}
    # every emitted session is a final batch session (no partials in append)
    assert got <= batch
    # sessions whose end precedes the final watermark MUST have been emitted
    max_ts = max(r[2] for r in rows)
    wm = max_ts - dt.timedelta(seconds=1)
    closed = {b for b in batch if b[2] + dt.timedelta(minutes=30) < wm}
    assert closed <= got and len(closed) >= 3
