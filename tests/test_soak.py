"""Soak: 25 micro-batches through the stream runner with tight
auto-compaction and log checkpointing — the long-running-operation
integration the reference never tested (continuous merge + compaction
+ checkpoint replay staying consistent)."""

from __future__ import annotations

import json
import os

from deltalake_poc_spark.cdc import CDCApplier
from deltalake_poc_spark.streaming import CDCStreamRunner
from deltalake_poc_spark.tables import VersionedTable
from deltalake_poc_spark.tables.log import TableLog

CUST = {"id": 0, "first_name": "F", "last_name": "L", "email": "x",
        "phone": None, "address": "a", "created_at": 1700000000_000000,
        "updated_at": 1700000000_000000}


def _msg(op, id_, lsn, email):
    payload = {"op": op, "ts_ms": 1700000000000 + lsn,
               "source": {"version": "1", "connector": "p", "name": "cdc",
                          "ts_ms": 1700000000000 + lsn, "snapshot": "false",
                          "db": "d", "schema": "public", "table": "customers",
                          "txId": lsn, "lsn": lsn}}
    if op == "d":
        payload["before"] = {**CUST, "id": id_}
    else:
        payload["after"] = {**CUST, "id": id_, "email": email}
    return {"key": json.dumps({"payload": {"id": id_}}),
            "value": json.dumps({"payload": payload}),
            "topic": "cdc.public.customers", "partition": 0, "offset": lsn}


def test_soak_25_batches(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(TableLog, "CHECKPOINT_EVERY", 10)
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    applier = CDCApplier(spark, str(tmp_path / "lake"), enable_cdf=False,
                         auto_compact_every=5)
    runner = CDCStreamRunner(spark, applier, str(tmp_path / "ckpt"))

    model: dict[int, str] = {}
    lsn = 0
    n_batches = 25
    for b in range(n_batches):
        msgs = []
        for i in range(4):
            key = (b * 3 + i) % 10
            lsn += 1
            if (b + i) % 6 == 5:
                msgs.append(_msg("d", key, lsn, ""))
                model.pop(key, None)
            else:
                email = f"b{b}i{i}@x"
                msgs.append(_msg("u", key, lsn, email))
                model[key] = email
        with open(os.path.join(input_dir, f"b{b:03d}.json"), "w") as fh:
            fh.writelines(json.dumps(m) + "\n" for m in msgs)
        # one file per availableNow run = one micro-batch
        q = runner.start(runner.file_source(input_dir,
                                            max_files_per_trigger=100),
                         available_now=True)
        q.awaitTermination(120)
        runner.stop_all()

    t = applier.snapshot_table("customers")
    got = {r["id"]: r["email"] for r in t.read().collect()}
    assert got == model
    # compaction kept the file count bounded despite 25 merges
    assert len(t.snapshot().files) <= 6
    # audit holds every event exactly once
    assert applier.audit_table().read().count() == lsn
    # log checkpoints exist and a cold open replays correctly
    ckpts = [f for f in os.listdir(t.log.log_path)
             if f.endswith(".checkpoint.json")]
    assert ckpts
    t2 = VersionedTable.for_path(spark, t.log.root)
    assert {r["id"]: r["email"] for r in t2.read().collect()} == model
