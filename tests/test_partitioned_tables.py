"""Partitioned versioned tables: Hive layout, partition recovery,
scan-level partition pruning, MERGE/DELETE on partitioned data,
partitioned audit table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from deltalake_poc_spark.tables import VersionedTable

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("region", StringType()),
    StructField("v", StringType()),
])


@pytest.fixture()
def ptable(spark, tmp_path):
    return VersionedTable.create(
        spark, str(tmp_path / "pt"), SCHEMA, partition_by=["region"],
        properties={"enableChangeDataFeed": "true"},
    )


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_partitioned_roundtrip_and_layout(spark, ptable):
    ptable.write(_rows(spark, [(1, "eu", "a"), (2, "us", "b"), (3, "eu", "c")]))
    got = sorted((r["id"], r["region"], r["v"]) for r in ptable.read().collect())
    assert got == [(1, "eu", "a"), (2, "us", "b"), (3, "eu", "c")]
    # files live in Hive-style dirs and the log knows their partition
    snap = ptable.snapshot()
    parts = {e.partition.get("region") for e in snap.files}
    assert parts == {"eu", "us"}
    assert all("region=" in e.path for e in snap.files)


def test_partition_pruning_in_scan(spark, ptable):
    ptable.write(_rows(spark, [(1, "eu", "a"), (2, "us", "b")]))
    df = ptable.read().filter(F.col("region") == "eu")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "region" in plan
    assert df.count() == 1


def test_merge_and_delete_on_partitioned(spark, ptable):
    ptable.write(_rows(spark, [(1, "eu", "a"), (2, "us", "b"), (3, "eu", "c")]))
    (ptable.merge(_rows(spark, [(2, "us", "B2"), (4, "ap", "d")]), on="id")
     .when_matched_update_all().when_not_matched_insert_all().execute())
    got = {r["id"]: (r["region"], r["v"]) for r in ptable.read().collect()}
    assert got[2] == ("us", "B2") and got[4] == ("ap", "d")
    assert {e.partition.get("region") for e in ptable.snapshot().files} >= {"ap"}

    ptable.delete("region = 'eu'")
    assert sorted(r["id"] for r in ptable.read().collect()) == [2, 4]
    # CDF rows carry the partition column too
    cdf = ptable.read_change_feed(0)
    dels = [r["id"] for r in cdf.filter("_change_type = 'delete'").collect()]
    assert sorted(dels) == [1, 3]


def test_partition_scoped_optimize(spark, ptable):
    for i in range(4):  # 4 small appends -> 4+ files per partition
        ptable.write(_rows(spark, [(i * 2, "eu", f"e{i}"), (i * 2 + 1, "us", f"u{i}")]))
    before = ptable.snapshot().files
    us_before = {e.path for e in before if e.partition.get("region") == "us"}
    c = ptable.optimize(target_file_rows=1000, partitions={"region": "eu"})
    after = ptable.snapshot().files
    us_after = {e.path for e in after if e.partition.get("region") == "us"}
    assert us_before == us_after                      # us untouched
    eu_after = [e for e in after if e.partition.get("region") == "eu"]
    assert len(eu_after) == 1                         # eu compacted
    assert c.metrics["numRemovedFiles"] == 4
    assert ptable.read().count() == 8
    with pytest.raises(ValueError, match="non-partition"):
        ptable.optimize(partitions={"v": "x"})


def test_partitioned_audit_table(spark, tmp_path):
    import json

    from deltalake_poc_spark.cdc import CDCApplier, parse_debezium

    def msg(table, id_, lsn):
        payload = {"op": "c", "ts_ms": 1700000000000,
                   "source": {"version": "1", "connector": "p", "name": "cdc",
                              "ts_ms": 1700000000000, "snapshot": "false",
                              "db": "d", "schema": "public", "table": table,
                              "txId": lsn, "lsn": lsn},
                   "after": {"id": id_}}
        return (json.dumps({"payload": {"id": id_}}),
                json.dumps({"payload": payload}),
                f"cdc.public.{table}", 0, lsn)

    raw = spark.createDataFrame(
        [msg("customers", 1, 10), msg("orders", 2, 11)],
        "key string, value string, topic string, partition int, offset long")
    applier = CDCApplier(spark, str(tmp_path), table_schemas={})
    applier.apply_batch(parse_debezium(raw), tables=[])
    audit = applier.audit_table()
    assert audit.partition_columns() == ["source_table"]
    parts = {e.partition["source_table"] for e in audit.snapshot().files}
    assert parts == {"customers", "orders"}
    df = audit.read().filter("source_table = 'orders'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert df.count() == 1
