"""Load the driver's synthetic star-schema tables.

Tables (per TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        # timestamp-derived results (date_trunc/date_format) depend on
        # the session TZ; pin UTC so any caller session matches the
        # (TZ-naive) DuckDB oracle. Dynamic conf; idempotent.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize ``events.ts`` to session-TZ ``TimestampType``.

    The driver has shipped this column under two physical types across
    rounds: parquet TIMESTAMP(NANOS) — unreadable natively, so read as
    long nanos via ``spark.sql.legacy.parquet.nanosAsLong`` and truncate
    to µs — and plain µs TIMESTAMP without UTC adjustment, which a
    vanilla Spark 4 session infers as TIMESTAMP_NTZ
    (``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults true) and
    which breaks ``unix_millis``. Both converge to TimestampType here;
    with the session pinned to UTC the NTZ→LTZ cast preserves values,
    matching the DuckDB oracle's naive-timestamp reading.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    ts_field = next((f for f in df.schema.fields if f.name == "ts"), None)
    if ts_field is not None and isinstance(ts_field.dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_field is not None and isinstance(ts_field.dataType, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
