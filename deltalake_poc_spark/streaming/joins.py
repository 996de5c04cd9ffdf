"""Watermarked stream-stream joins.

Joining two live streams requires bounding how long each side buffers
the other: both sides carry watermarks and the join condition includes
an event-time range, so state is purged as the watermarks advance —
without the range condition the state grows forever. (The reference
has no stream-stream joins; its only streaming join is the per-batch
MERGE. This completes the streaming operator surface.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event falls within
    [left_ts, left_ts + within]. State on both sides is bounded by the
    watermark + range condition."""
    l_wm = left.withWatermark(left_ts, watermark).alias("l")
    r_wm = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}")
           <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return l_wm.join(r_wm, cond, how)
