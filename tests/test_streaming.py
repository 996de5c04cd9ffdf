"""Structured Streaming runtime: file-source micro-batches, checkpoint
resume, graceful stop, materialized-view refresh (full + incremental)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from deltalake_poc_spark.cdc import CDCApplier
from deltalake_poc_spark.streaming import CDCStreamRunner, MaterializedView
from deltalake_poc_spark.tables import VersionedTable

CUST = {"id": 1, "first_name": "Alice", "last_name": "A", "email": "a@x",
        "phone": None, "address": "1 Way",
        "created_at": 1700000000_000000, "updated_at": 1700000000_000000}


def _msg(op, id_, lsn, after=None, before=None, table="customers"):
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
    return {
        "key": json.dumps({"payload": {"id": id_}}),
        "value": json.dumps({"payload": payload}),
        "topic": f"cdc.public.{table}", "partition": 0, "offset": lsn,
    }


def _write_batch(input_dir: str, name: str, msgs: list[dict]) -> None:
    os.makedirs(input_dir, exist_ok=True)
    with open(os.path.join(input_dir, name), "w") as fh:
        for m in msgs:
            fh.write(json.dumps(m) + "\n")


def test_stream_apply_and_checkpoint_resume(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    applier = CDCApplier(spark, str(tmp_path / "lake"))
    batches_seen = []
    runner = CDCStreamRunner(
        spark, applier, str(tmp_path / "ckpt"),
        on_batch=lambda bid, m: batches_seen.append((bid, m)),
    )

    _write_batch(input_dir, "b1.json", [
        _msg("c", 1, 10, after=CUST),
        _msg("c", 2, 11, after={**CUST, "id": 2, "email": "b@x"}),
        _msg("u", 1, 12, after={**CUST, "email": "new@x"}),
    ])
    q = runner.start(runner.file_source(input_dir), available_now=True)
    q.awaitTermination(120)
    runner.stop_all()

    snap = {r["id"]: r for r in applier.snapshot_table("customers").read().collect()}
    assert set(snap) == {1, 2} and snap[1]["email"] == "new@x"
    assert applier.audit_table().read().count() == 3

    # resume from checkpoint: only the NEW file is processed
    _write_batch(input_dir, "b2.json", [
        _msg("d", 1, 20, before=CUST),
    ])
    q2 = runner.start(runner.file_source(input_dir), available_now=True)
    q2.awaitTermination(120)
    runner.stop_all()

    assert applier.audit_table().read().count() == 4  # 3 + 1, not 3 + 4
    assert [r["id"] for r in applier.snapshot_table("customers").read().collect()] == [2]
    assert len(batches_seen) >= 2


def test_stream_graceful_stop(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    _write_batch(input_dir, "b1.json", [_msg("c", 1, 10, after=CUST)])
    applier = CDCApplier(spark, str(tmp_path / "lake"))
    runner = CDCStreamRunner(spark, applier, str(tmp_path / "ckpt"),
                             trigger_seconds=1)
    q = runner.start(runner.file_source(input_dir))
    deadline = time.time() + 60
    while time.time() < deadline:
        if applier.snapshot_table("customers").log.exists() and \
           VersionedTable.is_table(str(tmp_path / "lake/customers")):
            try:
                if applier.snapshot_table("customers").read().count() == 1:
                    break
            except Exception:
                pass
        time.sleep(0.5)
    assert q.isActive
    runner.stop_all()
    assert not q.isActive
    assert applier.snapshot_table("customers").read().count() == 1


ORDER_ROWS = [
    (1, "A", 10.0), (2, "A", 20.0), (3, "B", 5.0), (4, "B", 7.0), (5, "C", 1.0),
]


def _mv_build(df):
    return df.groupBy("status").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("amount"), 2).alias("total"),
    )


def test_mv_full_refresh(spark, tmp_path):
    base = spark.createDataFrame(ORDER_ROWS, "id long, status string, amount double")
    mv = MaterializedView(spark, "order_mv", str(tmp_path / "mv"), _mv_build)
    t = mv.refresh(base)
    got = {r["status"]: (r["cnt"], r["total"]) for r in t.read().collect()}
    assert got == {"A": (2, 30.0), "B": (2, 12.0), "C": (1, 1.0)}
    # refresh again: overwrite, previous version still time-travelable
    mv.refresh(base.filter("status != 'C'"))
    assert {r["status"] for r in t.read().collect()} == {"A", "B"}
    assert {r["status"] for r in t.read(version=1).collect()} == {"A", "B", "C"}


def test_mv_incremental_refresh(spark, tmp_path):
    base_t = VersionedTable.create(
        spark, str(tmp_path / "base"),
        spark.createDataFrame([], "id long, status string, amount double").schema,
        properties={"enableChangeDataFeed": "true"},
    )
    base_t.write(spark.createDataFrame(ORDER_ROWS,
                                       "id long, status string, amount double"))
    mv = MaterializedView(spark, "order_mv", str(tmp_path / "mv"), _mv_build)
    mv.refresh(base_t.read())
    since = base_t.version() + 1

    # change group A (update), wipe group C (delete), leave B untouched
    (base_t.merge(
        spark.createDataFrame([(1, "A", 100.0, False), (5, "C", 0.0, True)],
                              "id long, status string, amount double, __is_delete boolean"),
        on="id")
     .when_matched_delete(condition=F.col("s.__is_delete"))
     .when_matched_update_all(condition=~F.col("s.__is_delete"))
     .when_not_matched_insert_all(condition=~F.col("s.__is_delete"))
     .execute())

    t = mv.refresh_incremental(base_t, group_key="status", since_version=since)
    got = {r["status"]: (r["cnt"], r["total"]) for r in t.read().collect()}
    # full-recompute oracle
    want = {r["status"]: (r["cnt"], r["total"])
            for r in _mv_build(base_t.read()).collect()}
    assert got == want == {"A": (2, 120.0), "B": (2, 12.0)}
    # only A and C groups were touched by the merge (B rows copied, not updated)
    h = t.history()[0]
    assert h["operation"] == "MERGE"
