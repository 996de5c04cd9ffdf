"""Adversarial edges: empty CDC batches, deleting every row, merge
into empty tables, events missing source metadata."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from deltalake_poc_spark.cdc import CDCApplier, parse_debezium
from deltalake_poc_spark.tables import VersionedTable

CUST = {"id": 1, "first_name": "A", "last_name": "B", "email": "a@x",
        "phone": None, "address": "1", "created_at": 1700000000_000000,
        "updated_at": 1700000000_000000}


def _raw(spark, rows):
    return spark.createDataFrame(
        rows, "key string, value string, topic string, partition int, offset long")


def _msg(op, id_, lsn, after=None, before=None, source=True):
    payload = {"op": op, "ts_ms": 1700000000000}
    if source:
        payload["source"] = {
            "version": "1", "connector": "p", "name": "cdc",
            "ts_ms": 1700000000000, "snapshot": "false", "db": "d",
            "schema": "public", "table": "customers", "txId": lsn, "lsn": lsn}
    if after is not None:
        payload["after"] = after
    if before is not None:
        payload["before"] = before
    return (json.dumps({"payload": {"id": id_}}),
            json.dumps({"payload": payload}),
            "cdc.public.customers", 0, lsn)


def test_empty_batch_apply(spark, tmp_path):
    applier = CDCApplier(spark, str(tmp_path))
    empty = parse_debezium(_raw(spark, []))
    m = applier.apply_batch(empty, tables=["customers"])
    assert m["customers"]["numTargetRowsInserted"] == 0
    assert applier.snapshot_table("customers").read().count() == 0
    # and a real batch afterwards still works
    applier.apply_batch(parse_debezium(_raw(spark, [
        _msg("c", 1, 10, after=CUST)])))
    assert applier.snapshot_table("customers").read().count() == 1


def test_delete_every_row(spark, tmp_path):
    schema = spark.createDataFrame([], "id long, v string").schema
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema,
                              properties={"enableChangeDataFeed": "true"})
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    c = t.delete("id >= 0")
    assert c.metrics["numDeletedRows"] == 2
    assert t.read().count() == 0                 # empty-but-readable
    assert t.snapshot().files == []
    cdf = t.read_change_feed(0)
    assert cdf.filter("_change_type = 'delete'").count() == 2
    # table accepts new writes after full deletion
    t.write(spark.createDataFrame([(3, "c")], schema))
    assert t.read().count() == 1


def test_merge_into_never_written_table(spark, tmp_path):
    schema = spark.createDataFrame([], "id long, v string").schema
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema)
    c = (t.merge(spark.createDataFrame([(1, "a")], schema), on="id")
         .when_matched_update_all().when_not_matched_insert_all().execute())
    assert c.metrics["numTargetRowsInserted"] == 1
    assert t.read().count() == 1


def test_restore_reverts_schema_evolution(spark, tmp_path):
    schema = spark.createDataFrame([], "id long, v string").schema
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema)
    t.write(spark.createDataFrame([(1, "a")], schema))                  # v1
    t.write(spark.createDataFrame([(2, "b", "X")],
                                  "id long, v string, extra string"))  # v2 evolves
    assert "extra" in t.read().columns
    t.restore(1)                                                        # v3
    assert t.read().columns == ["id", "v"]
    assert [r["id"] for r in t.read().collect()] == [1]


def test_event_without_source_block_is_isolated(spark, tmp_path):
    """An envelope missing its source block parses (null lsn/table) but
    cannot route to a table — it lands in the audit trail only."""
    applier = CDCApplier(spark, str(tmp_path))
    events = parse_debezium(_raw(spark, [
        _msg("c", 1, 10, after=CUST),
        _msg("c", 2, 11, after={**CUST, "id": 2}, source=False),
    ]))
    assert events.count() == 2
    applier.apply_batch(events)
    assert applier.audit_table().read().count() == 2
    snap = applier.snapshot_table("customers").read()
    assert [r["id"] for r in snap.collect()] == [1]  # sourceless not routed


def test_price_ranks_salted_equals_naive_window(spark):
    """price_ranks' scalable shape (salted local top-k -> exact rank
    over candidates -> closed-form NTILE from per-status counts) must
    be row-identical to the naive RANK/NTILE window it replaced (r11:
    the 3-value partition key serialized the tier sort into 3 tasks,
    208 s at sf100; the salted shape is 19.5 s). Edge cases pinned:
    statuses with n < 4 rows (ANSI ntile's q=0 regime, tile == pos),
    n not divisible by 4 (unequal tile sizes), and rank-k boundaries
    inside and beyond a status's row count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from deltalake_poc_spark.analytics.queries import price_ranks

    rows = [(sid * 100000 + i, status, float((i * 37) % 997) + 0.25)
            for status, n in [("A", 1), ("B", 2), ("C", 3), ("D", 5),
                              ("E", 7), ("F", 103), ("G", 400),
                              ("H", 401)]
            for sid, i in [(ord(status), j) for j in range(n)]]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_totalprice double")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    naive = (orders.select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
        F.rank().over(w).alias("price_rank"),
        F.ntile(4).over(w).alias("quartile"))
        .filter(F.col("price_rank") <= 100))
    for k, salt in ((100, 32), (100, 3), (7, 8)):
        got = sorted(map(tuple, price_ranks(orders, k=k,
                                            salt_buckets=salt).collect()))
        want = sorted(t for t in map(tuple, naive.collect()) if t[3] <= k)
        assert got == want, (k, salt, got[:5], want[:5])
