"""Synthetic Debezium envelope generation — distributed, for tests and
golden runs (the reference's test strategy is a bash script inserting
rows into Postgres, scripts/test-cdc.sh:22-44; we synthesize the exact
Kafka-level messages instead so no Postgres/Kafka is needed).

Everything is built with ``to_json(struct(...))`` — executors generate
messages; nothing funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def raw_kafka_frame(
    df: DataFrame,
    op: Column,
    key: Column,
    lsn: Column,
    ts_ms: Column,
    after: Column | None,
    before: Column | None = None,
    table: str = "customers",
    db: str = "sourcedb",
    schema: str = "public",
    topic_prefix: str = "cdc",
    with_transaction: bool = False,
) -> DataFrame:
    """Wrap rows of ``df`` into raw Kafka-message shape (key/value/
    topic/partition/offset) carrying a Debezium envelope, exactly as
    the reference's connector emits them (shared/models.py:42-103,
    docs/technical-docs.md:268-307). ``with_transaction`` adds the
    transaction block a provide.transaction.metadata connector emits."""
    payload = F.struct(
        op.alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(
            F.lit("2.3").alias("version"),
            F.lit("postgresql").alias("connector"),
            F.lit(topic_prefix).alias("name"),
            ts_ms.alias("ts_ms"),
            F.lit("false").alias("snapshot"),
            F.lit(db).alias("db"),
            F.lit(schema).alias("schema"),
            F.lit(table).alias("table"),
            lsn.alias("txId"),
            lsn.alias("lsn"),
        ).alias("source"),
        *( [after.alias("after")] if after is not None else [] ),
        *( [before.alias("before")] if before is not None else [] ),
        *( [F.struct(
                F.concat(F.lit("txn-"), lsn.cast("string")).alias("id"),
                F.lit(1).cast("long").alias("total_order"),
                F.lit(1).cast("long").alias("data_collection_order"),
            ).alias("transaction")] if with_transaction else [] ),
    )
    key_json = F.to_json(F.struct(F.struct(key.alias("id")).alias("payload")))
    value_json = F.to_json(F.struct(payload.alias("payload")))
    return df.select(
        key_json.alias("key"),
        value_json.alias("value"),
        F.lit(f"{topic_prefix}.{schema}.{table}").alias("topic"),
        F.lit(0).alias("partition"),
        lsn.alias("offset"),
    )
