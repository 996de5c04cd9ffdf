"""Streaming event analytics: watermarked windows + custom stateful
sessionization.

The batch twins (analytics/events.py) define the semantics and serve
as the oracle; these run the same logic incrementally:

- ``windowed_event_counts``: watermark + tumbling-window aggregation
  (late data beyond the watermark is dropped; append mode emits a
  window once the watermark passes its end)
- ``sessionize_stream``: per-user session tracking with
  ``applyInPandasWithState`` — the custom-stateful-operator escape
  hatch for semantics built-in operators can't express. Sessions close
  either when a later event arrives past the gap (emitted immediately)
  or when event time moves ``gap`` past the open session's last event
  (event-time timeout). State per user is O(1): one open session.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_DDL = (
    "user_id long, session_start_ms long, session_end_ms long, "
    "n_events long, session_value double"
)
SESSION_STATE_DDL = "start_ms long, last_ms long, n long, vsum double"


def windowed_event_counts(stream: DataFrame, duration: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of analytics.events.event_windows (T6-style
    watermarking the reference never needed — it had no event-time
    windows)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )


def sessionize_stream(stream: DataFrame, gap_minutes: int = 30,
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming sessionization with applyInPandasWithState.

    Emits one row per CLOSED session; the session still open when the
    stream ends stays in state (standard streaming-session semantics).
    Input needs columns: user_id, ts (timestamp), value.
    """
    gap_ms = gap_minutes * 60 * 1000

    def track(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                start_ms, last_ms, n, vsum = state.get
                closed.append((user_id, start_ms, last_ms, n, round(vsum, 2)))
                state.remove()
            yield pd.DataFrame(closed, columns=[
                "user_id", "session_start_ms", "session_end_ms",
                "n_events", "session_value"])
            return

        events = pd.concat(list(pdfs), ignore_index=True)
        events = events.sort_values("ts_ms")
        if state.exists:
            start_ms, last_ms, n, vsum = state.get
        else:
            start_ms = last_ms = -1
            n, vsum = 0, 0.0

        for ts_ms, value in zip(events["ts_ms"], events["value"]):
            ts_ms = int(ts_ms)
            if start_ms < 0:
                start_ms, last_ms, n, vsum = ts_ms, ts_ms, 1, float(value)
            elif ts_ms - last_ms > gap_ms:
                closed.append((user_id, start_ms, last_ms, n, round(vsum, 2)))
                start_ms, last_ms, n, vsum = ts_ms, ts_ms, 1, float(value)
            else:
                last_ms, n, vsum = ts_ms, n + 1, vsum + float(value)

        state.update((start_ms, last_ms, n, vsum))
        # close the open session when event time passes last_ms + gap
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(closed, columns=[
            "user_id", "session_start_ms", "session_end_ms",
            "n_events", "session_value"])

    prepared = stream.withWatermark("ts", watermark).select(
        "user_id", F.unix_millis("ts").alias("ts_ms"), "value", "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=SESSION_OUTPUT_DDL,
        stateStructType=SESSION_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
