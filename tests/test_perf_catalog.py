"""Schema inference, SQL surface, salted joins, bucketed co-located
joins."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from deltalake_poc_spark.cdc import CDCApplier, parse_debezium
from deltalake_poc_spark.catalog import insert_into, register_views
from deltalake_poc_spark.perf import salted_join, write_bucketed
from pyspark.sql.types import LongType, StringType, TimestampType


def _msg(op, id_, lsn, after=None, before=None, table="gadgets"):
    payload = {
        "op": op, "ts_ms": 1700000000000,
        "source": {"version": "2.3", "connector": "postgresql", "name": "cdc",
                   "ts_ms": 1700000000000, "snapshot": "false", "db": "sourcedb",
                   "schema": "public", "table": table, "txId": lsn, "lsn": lsn},
    }
    if after is not None:
        payload["after"] = after
    if before is not None:
        payload["before"] = before
    return (json.dumps({"payload": {"id": id_}}), json.dumps({"payload": payload}),
            f"cdc.public.{table}", 0, lsn)


def test_schema_inference_unknown_table(spark, tmp_path):
    """§1.4 mode 2: a table with no declared schema gets one inferred
    from the batch (µs suffix rule, int widening, null->string)."""
    raw = spark.createDataFrame([
        _msg("c", 1, 10, after={"id": 1, "label": "x", "qty": 5,
                                "price": 1.5, "made_at": 1700000000_000000,
                                "note": None}),
        _msg("c", 2, 11, after={"id": 2, "label": "y", "qty": 7,
                                "price": 2.5, "made_at": 1700000100_000000,
                                "note": None}),
    ], "key string, value string, topic string, partition int, offset long")
    applier = CDCApplier(spark, str(tmp_path), table_schemas={},
                         infer_unknown_tables=True)
    applier.apply_batch(parse_debezium(raw))
    t = applier.snapshot_table("gadgets")
    sch = {f.name: type(f.dataType) for f in t.schema().fields}
    assert sch["id"] is LongType and sch["qty"] is LongType
    assert sch["made_at"] is TimestampType   # _at suffix -> epoch-µs
    assert sch["note"] is StringType         # null-only -> string
    rows = {r["id"]: r for r in t.read().collect()}
    assert rows[1]["made_at"].year == 2023
    assert rows[2]["label"] == "y"


def test_register_views_and_sql(spark, tmp_path):
    applier = CDCApplier(spark, str(tmp_path))
    raw = spark.createDataFrame([
        _msg("c", 1, 10, table="customers",
             after={"id": 1, "first_name": "A", "last_name": "B",
                    "email": "a@x", "phone": None, "address": "1",
                    "created_at": 1700000000_000000,
                    "updated_at": 1700000000_000000}),
    ], "key string, value string, topic string, partition int, offset long")
    applier.apply_batch(parse_debezium(raw))
    views = register_views(applier)
    assert "customers" in views and "cdc_events" in views
    got = spark.sql(
        "SELECT c.email, e.operation_name FROM customers c "
        "JOIN cdc_events e ON e.source_table = 'customers'").collect()
    assert got[0]["email"] == "a@x" and got[0]["operation_name"] == "INSERT"


def test_insert_into(spark, tmp_path):
    from deltalake_poc_spark.tables import VersionedTable

    schema = spark.createDataFrame([], "id long, v string").schema
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema)
    insert_into(spark, t, [(1, "a"), (2, "b")])
    assert t.read().count() == 2


def test_salted_join_matches_plain(spark):
    # skewed: 90% of rows share key 7
    skewed = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id"))
        .alias("k"), F.col("id").alias("payload"))
    compact = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim"))
    plain = skewed.join(compact, "k", "left")
    salted = salted_join(skewed, compact, "k", n_salts=8, how="left")
    assert salted.count() == plain.count()
    a = sorted((r["k"], r["payload"], r["dim"]) for r in plain.collect())
    b = sorted((r["k"], r["payload"], r["dim"]) for r in salted.collect())
    assert a == b


def test_bucketed_join_no_shuffle(spark, tmp_path):
    big = spark.range(0, 10_000).select(F.col("id").alias("k"),
                                        (F.col("id") % 97).alias("v"))
    dim = spark.range(0, 1_000).select(F.col("id").alias("k"),
                                       (F.col("id") % 7).alias("d"))
    write_bucketed(big, "t_big", "k", n_buckets=8)
    write_bucketed(dim, "t_dim", "k", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_big").join(spark.table("t_dim"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_big")
        spark.sql("DROP TABLE IF EXISTS t_dim")


def test_aqe_splits_skewed_join(spark):
    """The 100 TB skew story must actually fire: a sort-merge join with
    one hot key gets its skewed partition split by AQE at runtime
    (OptimizeSkewedJoin marks the join skew=true). Thresholds are
    lowered so the test corpus triggers the same code path a hot-key
    shuffle triggers at scale."""
    from pyspark.sql import functions as F

    saved = {k: spark.conf.get(k, None) for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold")}
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        # force a shuffle join: broadcast would hide the skew path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        skewed = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = skewed.join(dim, "k")
        # collect() (not count()) so it is THIS frame's query execution
        # that runs — count() builds a separate execution and the
        # inspected plan would stay isFinalPlan=false
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
