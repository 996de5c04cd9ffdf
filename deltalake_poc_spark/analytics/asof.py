"""Distributed as-of join — an operator Spark's built-ins don't offer.

``asof_join(left, right, key, ts)`` attaches, to every left row, the
most recent right row of the same key with right.ts <= left.ts.

Implementation is the scalable union+window formulation, NOT a range
join: tag both inputs, union them, and for each key order by
(ts, side); a last-value-ignore-nulls running window then carries the
latest right-side payload forward onto each left row. One shuffle on
the key, no row explosion — the naive inequality-join alternative is
O(|left| x |right per key|) and dies on hot keys.

DuckDB's native ASOF JOIN provides the oracle (driver query
``asof_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """Left as-of join. ``left`` and ``right`` must both carry ``key``
    and an orderable ``ts``; ``value_cols`` are the right-side columns
    to attach (renamed with ``suffix``). Right rows tied on
    (key, ts) must be pre-deduplicated (ambiguous matches otherwise)."""
    lcols = [c for c in left.columns]
    tagged_l = left.select(
        *lcols, F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}")
          for c in value_cols],
    )
    tagged_r = right.select(
        key, ts, *[F.col(c).alias(f"__r_{c}") for c in value_cols]
    )
    # right rows sort before left rows at equal ts => "at or before"
    tagged_r = tagged_r.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols if c not in (key, ts)],
        key, ts, F.lit(0).alias("__side"),
        *[F.col(f"__r_{c}") for c in value_cols],
    ).select(*lcols, "__side", *[f"__r_{c}" for c in value_cols])

    unioned = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols, "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c + suffix)
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
