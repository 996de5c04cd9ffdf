"""Dead-letter routing, blind-append commit retry, per-batch MV
refresh attached to the stream runner."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from deltalake_poc_spark.cdc import CDCApplier
from deltalake_poc_spark.cdc.parse import parse_debezium, split_malformed
from deltalake_poc_spark.streaming import CDCStreamRunner, MaterializedView
from deltalake_poc_spark.tables import VersionedTable
from deltalake_poc_spark.tables.log import Commit

CUST = {"id": 1, "first_name": "A", "last_name": "B", "email": "a@x",
        "phone": None, "address": "1", "created_at": 1700000000_000000,
        "updated_at": 1700000000_000000}


def _good(id_, lsn):
    payload = {"op": "c", "ts_ms": 1700000000000,
               "source": {"version": "1", "connector": "p", "name": "cdc",
                          "ts_ms": 1700000000000, "snapshot": "false",
                          "db": "d", "schema": "public", "table": "customers",
                          "txId": lsn, "lsn": lsn},
               "after": {**CUST, "id": id_}}
    return {"key": json.dumps({"payload": {"id": id_}}),
            "value": json.dumps({"payload": payload}),
            "topic": "cdc.public.customers", "partition": 0, "offset": lsn}


def test_split_malformed(spark):
    rows = [
        _good(1, 10),
        {"key": "k", "value": "{not json at all", "topic": "t",
         "partition": 0, "offset": 11},
        {"key": "k", "value": json.dumps({"payload": {"nope": 1}}),
         "topic": "t", "partition": 0, "offset": 12},
        {"key": "k", "value": None, "topic": "t", "partition": 0, "offset": 13},
    ]
    raw = spark.createDataFrame(
        rows, "key string, value string, topic string, partition int, offset long")
    ok, errors = split_malformed(raw)
    assert ok.count() == 2          # good + tombstone
    errs = errors.collect()
    assert len(errs) == 2
    assert all(e["error"] == "unparseable_envelope" for e in errs)
    # and the good path parses to exactly one event
    assert parse_debezium(ok).count() == 1


def test_stream_dead_letter(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    with open(os.path.join(input_dir, "b1.json"), "w") as fh:
        fh.write(json.dumps(_good(1, 10)) + "\n")
        fh.write(json.dumps({"key": "k", "value": "garbage{", "topic": "t",
                             "partition": 0, "offset": 11}) + "\n")
    applier = CDCApplier(spark, str(tmp_path / "lake"))
    runner = CDCStreamRunner(spark, applier, str(tmp_path / "ckpt"),
                             dead_letter=True)
    q = runner.start(runner.file_source(input_dir), available_now=True)
    q.awaitTermination(120)
    runner.stop_all()
    assert applier.snapshot_table("customers").read().count() == 1
    dlq = applier.errors_table().read().collect()
    assert len(dlq) == 1 and dlq[0]["value"] == "garbage{"


def test_append_retries_on_concurrent_commit(spark, tmp_path):
    schema = spark.createDataFrame([], "id long, v string").schema
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema)
    t.write(spark.createDataFrame([(1, "a")], schema))
    # simulate a concurrent writer grabbing the next version
    stolen = t.log.next_version()
    t.log.write_commit(Commit(version=stolen,
                              timestamp=t.log.monotonic_now_ms(),
                              operation="APPEND"))
    c = t.write(spark.createDataFrame([(2, "b")], schema))  # blind append
    assert c.version == stolen + 1
    assert t.read().count() == 2


def test_runner_attached_mv_refreshes_per_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    with open(os.path.join(input_dir, "b1.json"), "w") as fh:
        fh.write(json.dumps(_good(1, 10)) + "\n")
        fh.write(json.dumps(_good(2, 11)) + "\n")
    applier = CDCApplier(spark, str(tmp_path / "lake"))
    runner = CDCStreamRunner(spark, applier, str(tmp_path / "ckpt"))
    mv = MaterializedView(
        spark, "cust_count", str(tmp_path / "mv"),
        lambda df: df.agg(F.count(F.lit(1)).alias("n")))
    runner.attach_mv(mv, ["customers"])
    q = runner.start(runner.file_source(input_dir), available_now=True)
    q.awaitTermination(120)
    runner.stop_all()
    assert mv.table().read().collect()[0]["n"] == 2
