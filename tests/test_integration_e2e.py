"""Golden end-to-end: the reference's full demo flow
(scripts/test-cdc.sh smoke + notebook analysis cells) in one run —
stream ingestion -> snapshots -> analytics MVs -> time travel ->
CDF -> maintenance, asserting at every stage."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from deltalake_poc_spark.analytics import cdc_queries as CQ
from deltalake_poc_spark.catalog import register_views
from deltalake_poc_spark.cdc import CDCApplier
from deltalake_poc_spark.streaming import CDCStreamRunner, MaterializedView
from deltalake_poc_spark.tables.inspect import change_timeline


def _msg(op, table, id_, lsn, after=None, before=None):
    payload = {"op": op, "ts_ms": 1700000000000 + lsn,
               "source": {"version": "2.3", "connector": "postgresql",
                          "name": "cdc", "ts_ms": 1700000000000 + lsn,
                          "snapshot": "false", "db": "sourcedb",
                          "schema": "public", "table": table,
                          "txId": lsn, "lsn": lsn}}
    if after is not None:
        payload["after"] = after
    if before is not None:
        payload["before"] = before
    return {"key": json.dumps({"payload": {"id": id_}}),
            "value": json.dumps({"payload": payload}),
            "topic": f"cdc.public.{table}", "partition": 0, "offset": lsn}


def _cust(i, email):
    return {"id": i, "first_name": f"F{i}", "last_name": f"L{i}",
            "email": email, "phone": None, "address": f"{i} Way",
            "created_at": 1700000000_000000, "updated_at": 1700000000_000000}


def _order(i, cust, amount, status="pending"):
    return {"id": i, "customer_id": cust, "order_date": 1700000000_000000,
            "status": status, "total_amount": amount,
            "created_at": 1700000000_000000, "updated_at": 1700000000_000000}


def _write(input_dir, name, msgs):
    os.makedirs(input_dir, exist_ok=True)
    with open(os.path.join(input_dir, name), "w") as fh:
        fh.writelines(json.dumps(m) + "\n" for m in msgs)


def test_full_demo_flow(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    applier = CDCApplier(spark, str(tmp_path / "lake"))
    runner = CDCStreamRunner(spark, applier, str(tmp_path / "ckpt"))

    # batch 1: the test-cdc.sh shape — inserts + an update
    _write(input_dir, "b1.json", [
        _msg("c", "customers", 1, 10, after=_cust(1, "a@x")),
        _msg("c", "customers", 2, 11, after=_cust(2, "b@x")),
        _msg("u", "customers", 1, 12, after=_cust(1, "a2@x")),
        _msg("c", "orders", 100, 13, after=_order(100, 1, 50.0)),
        _msg("c", "orders", 101, 14, after=_order(101, 1, 70.0, "completed")),
        _msg("c", "orders", 102, 15, after=_order(102, 2, 10.0)),
    ])
    q = runner.start(runner.file_source(input_dir), available_now=True)
    q.awaitTermination(120)
    runner.stop_all()

    customers_t = applier.snapshot_table("customers")
    v1 = customers_t.version()

    # analytics over snapshots (notebook cells 28-30 / RisingWave MVs)
    summary = {r["customer_id"]: r for r in CQ.customer_order_summary(
        customers_t.read(), applier.snapshot_table("orders").read()).collect()}
    assert summary[1]["order_count"] == 2 and summary[1]["lifetime_value"] == 120.0
    assert summary[2]["lifetime_value"] == 10.0

    # MV refresh into a versioned table (T7)
    mv = MaterializedView(spark, "cos", str(tmp_path / "mv"),
                          CQ.customer_order_summary)
    mv_t = mv.refresh(customers_t.read(), applier.snapshot_table("orders").read())
    assert mv_t.read().count() == 2

    # batch 2: delete customer 2, bump an order
    _write(input_dir, "b2.json", [
        _msg("d", "customers", 2, 20, before=_cust(2, "b@x")),
        _msg("u", "orders", 102, 21, after=_order(102, 2, 99.0, "completed")),
    ])
    q = runner.start(runner.file_source(input_dir), available_now=True)
    q.awaitTermination(120)
    runner.stop_all()

    # current state
    assert [r["id"] for r in customers_t.read().collect()] == [1]
    # time travel: customer 2 still visible at v1 (notebook cells 21-24)
    assert sorted(r["id"] for r in customers_t.read(version=v1).collect()) == [1, 2]
    # CDF timeline of customer 1: insert then in-batch-dedup'd update
    tl = [r["_change_type"] for r in
          change_timeline(customers_t, "id", 2).collect()]
    assert tl == ["insert", "delete"]
    # audit stats view (A7)
    stats = {(r["source_table"], r["operation"]): r["event_count"]
             for r in CQ.cdc_statistics(applier.audit_table().read()).collect()}
    assert stats[("customers", "c")] == 2
    assert stats[("customers", "d")] == 1
    assert stats[("orders", "u")] == 1
    # sync summary over snapshots (A8)
    summ = {r["table_name"]: r["record_count"] for r in CQ.sync_summary({
        "customers": customers_t.read(),
        "orders": applier.snapshot_table("orders").read()}).collect()}
    assert summ == {"customers": 1, "orders": 3}
    # SQL surface over the lakehouse (notebook cells 20, 28-30)
    register_views(applier, tables=["customers", "orders"])
    got = spark.sql(
        "SELECT c.id, COUNT(o.id) AS n FROM customers c "
        "LEFT JOIN orders o ON o.customer_id = c.id GROUP BY c.id").collect()
    assert {(r["id"], r["n"]) for r in got} == {(1, 2)}
    # maintenance: optimize + vacuum keep reads correct (M4/M5)
    customers_t.optimize(target_file_rows=10_000)
    customers_t.vacuum(retention_hours=0.0)
    assert customers_t.read().collect()[0]["email"] == "a2@x"
