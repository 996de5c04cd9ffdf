"""Watermarked windowed aggregation + applyInPandasWithState
sessionization, driven through real streaming queries (file source,
availableNow micro-batches, memory sink)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from deltalake_poc_spark.streaming.stateful import (
    sessionize_stream, windowed_event_counts,
)

EVENT_DDL = "event_id long, ts_ms long, user_id long, event_type string, value double"

H = 3600 * 1000
BASE = 1700000000000 - (1700000000000 % H)  # aligned to an hour boundary


def _write_events(path, name, rows):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        for i, (ts_ms, user, etype, val) in enumerate(rows):
            fh.write(json.dumps({
                "event_id": i, "ts_ms": ts_ms, "user_id": user,
                "event_type": etype, "value": val}) + "\n")


def _stream(spark, path):
    from pyspark.sql import functions as F

    raw = spark.readStream.schema(EVENT_DDL).option("maxFilesPerTrigger", "1").json(path)
    return raw.select(
        "event_id", "user_id", "event_type", "value",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    )


def _run_to_memory(spark, df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream(spark, tmp_path):
    path = str(tmp_path / "ev")
    # hour 0: three events; hour 3 (file 2) pushes the watermark far
    # enough that hour 0's window closes and is emitted in append mode
    _write_events(path, "f1.json", [
        (BASE + 10_000, 1, "click", 1.0),
        (BASE + 20_000, 1, "click", 2.0),
        (BASE + 30_000, 2, "view", 5.0),
    ])
    _write_events(path, "f2.json", [
        (BASE + 3 * H, 1, "click", 9.0),
    ])
    out = _run_to_memory(
        spark, windowed_event_counts(_stream(spark, path), watermark="1 hour"),
        "win_counts")
    rows = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in out.collect()}
    import datetime
    h0 = datetime.datetime.utcfromtimestamp(BASE / 1000).strftime("%Y-%m-%d %H:%M")
    assert rows[(h0, "click")] == (2, 3.0)
    assert rows[(h0, "view")] == (1, 5.0)


def test_stream_stream_join(spark, tmp_path):
    """Two file streams joined on user within a 5-minute window."""
    from deltalake_poc_spark.streaming.joins import stream_stream_join

    lpath, rpath = str(tmp_path / "l"), str(tmp_path / "r")
    _write_events(lpath, "l1.json", [
        (BASE + 0, 1, "view", 1.0),
        (BASE + 0, 2, "view", 2.0),
    ])
    _write_events(rpath, "r1.json", [
        (BASE + 2 * 60_000, 1, "purchase", 10.0),    # within 5 min of view
        (BASE + 30 * 60_000, 2, "purchase", 20.0),   # too late for user 2
    ])
    left = _stream(spark, lpath).select(
        "user_id", "ts", F.col("value").alias("view_value"))
    right = _stream(spark, rpath).select(
        "user_id", "ts", F.col("value").alias("purchase_value"))
    joined = stream_stream_join(
        left, right.withColumnRenamed("ts", "p_ts"),
        key="user_id", left_ts="ts", right_ts="p_ts", within="5 minutes")
    out_dir = str(tmp_path / "out")
    q = (joined.select(F.col("l.user_id").alias("user_id"),
                       "view_value", "purchase_value")
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = [(r["user_id"], r["view_value"], r["purchase_value"])
           for r in spark.read.parquet(out_dir).collect()]
    assert got == [(1, 1.0, 10.0)]  # only the in-window pair joins


def test_sessionize_stream_matches_batch(spark, tmp_path):
    path = str(tmp_path / "ev")
    # user 1: two sessions split by a >30min gap inside file 1;
    # file 2 moves event time ahead so open sessions time out
    _write_events(path, "f1.json", [
        (BASE + 0, 1, "click", 1.0),
        (BASE + 60_000, 1, "click", 2.0),          # same session
        (BASE + 45 * 60_000, 1, "click", 4.0),     # gap > 30min -> new session
        (BASE + 10_000, 2, "view", 7.0),
    ])
    _write_events(path, "f2.json", [
        (BASE + 5 * H, 3, "click", 0.5),           # watermark pusher
    ])
    out = _run_to_memory(
        spark,
        sessionize_stream(_stream(spark, path), gap_minutes=30,
                          watermark="1 minute"),
        "sessions")
    got = {(r["user_id"], r["session_start_ms"]):
           (r["n_events"], r["session_end_ms"], r["session_value"])
           for r in out.collect()}
    # user 1 session A: 2 events, closed by the in-batch gap
    assert got[(1, BASE)] == (2, BASE + 60_000, 3.0)
    # user 1 session B and user 2's session: closed by event-time timeout
    assert got[(1, BASE + 45 * 60_000)] == (1, BASE + 45 * 60_000, 4.0)
    assert got[(2, BASE + 10_000)] == (1, BASE + 10_000, 7.0)

    # batch oracle agrees on (start, n, end) for the closed sessions
    from deltalake_poc_spark.analytics.events import user_sessions
    from pyspark.sql import functions as F

    batch = spark.read.schema(EVENT_DDL).json(path).select(
        "user_id", F.timestamp_millis(F.col("ts_ms")).alias("ts"), "value")
    b = {(r["user_id"], r["start_ms"]): (r["n_events"], r["end_ms"])
         for r in user_sessions(batch, gap_minutes=30).collect()}
    for (u, s), (n, e, _v) in got.items():
        assert b[(u, s)] == (n, e)
