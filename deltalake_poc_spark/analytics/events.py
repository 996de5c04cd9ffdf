"""Event-stream analytics: tumbling windows and sessionization.

Batch implementations over the ``events`` table. The same semantics
run incrementally in streaming form (streaming/stateful.py): the
tumbling window via watermark + windowed aggregation, the session via
``applyInPandasWithState``. Batch is the oracle for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )


def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization (gaps-and-islands): a new session starts when the
    gap to the previous event of the same user exceeds ``gap_minutes``.
    Classic two-window formulation — lag to flag boundaries, running
    sum to number sessions, then one aggregation. Shuffles once on
    user_id; both window functions share that partitioning."""
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
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )
