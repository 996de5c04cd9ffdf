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
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark cannot read natively. Read it as long nanos
    (``spark.sql.legacy.parquet.nanosAsLong`` — a dynamic SQLConf) and
    truncate to a µs TimestampType column; downstream queries expose
    ms-epoch values, which truncate identically in Spark and DuckDB.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    ts_field = next((f for f in df.schema.fields if f.name == "ts"), None)
    if ts_field is not None and isinstance(ts_field.dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
