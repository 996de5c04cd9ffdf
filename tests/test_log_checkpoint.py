"""Log checkpointing: replay starts from the newest checkpoint; a
long commit history stays cheap to open; results identical."""

from __future__ import annotations

import os

from deltalake_poc_spark.tables import VersionedTable
from deltalake_poc_spark.tables.log import TableLog


def test_checkpoint_written_and_used(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(TableLog, "CHECKPOINT_EVERY", 10)
    schema = spark.createDataFrame([], "id long, v string").schema
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema)
    for i in range(12):
        t.write(spark.createDataFrame([(i, f"v{i}")], schema))
    ckpts = [f for f in os.listdir(t.log.log_path)
             if f.endswith(".checkpoint.json")]
    assert ckpts == ["00000000000000000010.checkpoint.json"]

    # a fresh handle replays from the checkpoint and sees all rows
    t2 = VersionedTable.for_path(spark, str(tmp_path / "t"))
    assert t2.read().count() == 12
    assert t2.version() == 12
    # time travel before the checkpoint still replays from scratch
    assert t2.read(version=3).count() == 3
    # ... and between checkpoint and head
    assert t2.read(version=11).count() == 11


def test_checkpoint_respects_overwrite(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(TableLog, "CHECKPOINT_EVERY", 5)
    schema = spark.createDataFrame([], "id long, v string").schema
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema)
    for i in range(4):
        t.write(spark.createDataFrame([(i, "x")], schema))
    t.write(spark.createDataFrame([(99, "only")], schema), "overwrite")  # v5 -> ckpt
    t.write(spark.createDataFrame([(100, "more")], schema))
    t2 = VersionedTable.for_path(spark, str(tmp_path / "t"))
    assert sorted(r["id"] for r in t2.read().collect()) == [99, 100]
