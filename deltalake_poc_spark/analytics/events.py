"""Event-stream analytics: tumbling windows and sessionization.

Batch implementations over the ``events`` table. The same semantics
run incrementally in streaming form (streaming/stateful.py): the
tumbling window via watermark + windowed aggregation, the session via
``applyInPandasWithState``. Batch is the oracle for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .money import dec_sum


def event_windows(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event type. Window starts are
    emitted as strings (engine-portable; 1h tumbling windows align
    with date_trunc('hour'))."""
    return (
        events.groupBy(
            F.window("ts", duration).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # value snaps to integer 1e-4 units (identical IEEE ops in
            # every engine), sums exactly — order-independent by
            # construction. scale=4 matches the precision
            # top_value_events assumes for the same measure; cents
            # would silently quantize finer-precision inputs.
            dec_sum("value", scale=4).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )


def range_join_pairs(events: DataFrame, window_ms: int = 60_000) -> DataFrame:
    """Time-range self-join: pairs of events of the same user within
    ``window_ms`` of each other.

    Bucketized band join — NOT an inequality join (which Spark plans as
    a broadcast nested loop and explodes at scale): both sides get a
    time bin of width ``window_ms``; one side probes its own bin ±1,
    the equi-join runs on (user, bin), and the exact |Δt| predicate
    filters the candidates. Work is proportional to events per
    (user, bin) — the distributed range-join pattern.
    """
    base = events.select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms")
    ).withColumn("bin", F.expr(f"ts_ms div {window_ms}"))
    probes = base.withColumn(
        "probe_bin", F.explode(F.array(F.col("bin") - 1, F.col("bin"),
                                       F.col("bin") + 1))
    )
    a, b = base.alias("a"), probes.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bin") == F.col("b.probe_bin"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .filter(F.abs(F.col("a.ts_ms") - F.col("b.ts_ms")) <= window_ms)
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            (F.col("b.ts_ms") - F.col("a.ts_ms")).alias("delta_ms"),
        )
    )


def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization (gaps-and-islands): a new session starts when the
    gap to the previous event of the same user exceeds ``gap_minutes``.
    Classic two-window formulation — lag to flag boundaries, running
    sum to number sessions, then one aggregation. Shuffles once on
    user_id; both window functions share that partitioning.

    Whale users (one key with millions of events) degrade to one slow
    task, not an OOM: lag(1) and the running sum are streaming window
    frames over a spill-backed partition buffer
    (ExternalAppendOnlyUnsafeRowArray), so per-task memory stays
    bounded while the whale's events sort externally — pinned by
    tests/test_cdc_queries.py::test_user_sessions_whale_user."""
    gap_ms = gap_minutes * 60 * 1000
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    # explicit ROWS frame: Spark's default for sum-over-orderBy is
    # RANGE (ties collapse); ROWS matches the SQL-oracle semantics
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_ms = F.unix_millis(F.col("ts"))
    flagged = (
        events.select("user_id", ts_ms.alias("ts_ms"), "value")
        .withColumn("prev_ms", F.lag("ts_ms").over(w))
        .withColumn(
            "new_session",
            (F.col("prev_ms").isNull()
             | ((F.col("ts_ms") - F.col("prev_ms")) > gap_ms)).cast("int"),
        )
        .withColumn("session_idx", F.sum("new_session").over(w_run))
    )
    return (
        flagged.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
            dec_sum("value", scale=4).alias("session_value"),
        )
    )
