"""Standard-Delta-protocol read interop, verified against the
REFERENCE'S OWN committed Delta tables (written by delta-spark:
/root/reference/deltalake/*) plus synthesized logs covering the paths
the fixtures don't exercise (partitioned tables, checkpoints, column
mapping, deletion-vector refusal)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from deltalake_poc_spark.tables.deltareader import DeltaLakeReader

REF = "/root/reference/deltalake"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference Delta fixtures not present")


def _log_stats_rows(table: str, version: int) -> int:
    """Sum of numRecords over the ACTIVE file set at a version,
    replayed independently of the reader under test."""
    files: dict[str, int] = {}
    for v in range(version + 1):
        p = f"{REF}/{table}/_delta_log/{v:020d}.json"
        for line in open(p):
            a = json.loads(line)
            if "add" in a:
                files[a["add"]["path"]] = json.loads(
                    a["add"].get("stats", "{}")).get("numRecords", 0)
            elif "remove" in a:
                files.pop(a["remove"]["path"], None)
    return sum(files.values())


def test_reads_all_reference_tables(spark):
    for table in ("customers", "orders", "products", "order_items",
                  "cdc_events"):
        r = DeltaLakeReader(spark, f"{REF}/{table}")
        snap = r.snapshot()
        df = r.read()
        assert df.count() == _log_stats_rows(table, snap.version), table
        assert [f.name for f in df.schema.fields] == \
            [f.name for f in snap.schema.fields], table


def test_customers_schema_matches_log(spark):
    r = DeltaLakeReader(spark, f"{REF}/customers")
    names = [f.name for f in r.snapshot().schema.fields]
    assert names == ["id", "first_name", "last_name", "email", "phone",
                     "created_at", "updated_at", "__cdc_operation",
                     "__cdc_timestamp", "__processed_at"]


def test_time_travel_versions_agree_with_log(spark):
    """customers has v0 (WRITE) and v1 (MERGE that rewrote a file):
    each version's row count must match its log-declared active set,
    and v1 must reflect the MERGE's update."""
    r = DeltaLakeReader(spark, f"{REF}/customers")
    assert r.versions() == [0, 1]
    v0, v1 = r.read(version=0), r.read(version=1)
    assert v0.count() == _log_stats_rows("customers", 0)
    assert v1.count() == _log_stats_rows("customers", 1)
    # the MERGE updated rows in place: same keys, some changed values
    k0 = sorted(x["id"] for x in v0.select("id").collect())
    k1 = sorted(x["id"] for x in v1.select("id").collect())
    assert k0 == k1
    assert v0.exceptAll(v1).count() > 0  # v1 differs from v0


def test_timestamp_travel(spark):
    r = DeltaLakeReader(spark, f"{REF}/customers")
    t0 = r._commit_timestamp_ms(0)
    t1 = r._commit_timestamp_ms(1)
    assert r.snapshot(timestamp_ms=t0).version == 0
    assert r.snapshot(timestamp_ms=t1 + 1).version == 1
    with pytest.raises(ValueError, match="no commit"):
        r.snapshot(timestamp_ms=t0 - 1)


def test_history_lists_operations(spark):
    h = DeltaLakeReader(spark, f"{REF}/customers").history()
    assert [c["version"] for c in h] == [1, 0]
    assert h[0]["operation"] == "MERGE"
    assert h[1]["operation"] == "WRITE"


def test_change_feed_reads_reference_cdc_files(spark):
    """customers v1 is a MERGE with real _change_data files; v0 is a
    blind-append WRITE (inserts derived from added files)."""
    r = DeltaLakeReader(spark, f"{REF}/customers")
    cdf = r.read_change_feed(0)
    types = {x["_change_type"] for x in
             cdf.select("_change_type").distinct().collect()}
    assert "insert" in types
    assert {"update_preimage", "update_postimage"} <= types
    v0 = cdf.filter(F.col("_commit_version") == 0)
    assert v0.count() == _log_stats_rows("customers", 0)
    # pre/post images pair up per commit
    pre = cdf.filter(F.col("_change_type") == "update_preimage").count()
    post = cdf.filter(F.col("_change_type") == "update_postimage").count()
    assert pre == post > 0


# -------------------------- synthesized logs (paths fixtures lack) --------


def _write_delta_table(spark, root, rows, schema_fields, part_cols=(),
                       configuration=None, extra_commits=()):
    """Minimal standard-Delta writer for tests: parquet files + JSON log."""
    os.makedirs(os.path.join(root, "_delta_log"))
    df = spark.createDataFrame(rows, ", ".join(schema_fields))
    data_cols = [c for c in df.columns if c not in part_cols]
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "t", "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": list(part_cols),
            "configuration": configuration or {}}},
    ]
    if part_cols:
        groups = df.select(*part_cols).distinct().collect()
        for i, g in enumerate(groups):
            sub = df
            pv = {}
            for c in part_cols:
                sub = sub.filter(F.col(c) == g[c])
                pv[c] = str(g[c])
            pdir = "/".join(f"{c}={g[c]}" for c in part_cols)
            os.makedirs(os.path.join(root, pdir), exist_ok=True)
            path = f"{pdir}/part-{i:05d}.parquet"
            sub.select(*data_cols).toPandas().to_parquet(
                os.path.join(root, path))
            actions.append({"add": {"path": path, "partitionValues": pv,
                                    "size": 1, "modificationTime": 0,
                                    "dataChange": True}})
    else:
        path = "part-00000.parquet"
        df.toPandas().to_parquet(os.path.join(root, path))
        actions.append({"add": {"path": path, "partitionValues": {},
                                "size": 1, "modificationTime": 0,
                                "dataChange": True}})
    with open(os.path.join(root, "_delta_log",
                           f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    for v, acts in enumerate(extra_commits, start=1):
        with open(os.path.join(root, "_delta_log",
                               f"{v:020d}.json"), "w") as f:
            f.write("\n".join(json.dumps(a) for a in acts) + "\n")
    return df


def test_partitioned_delta_table_typed_values(spark, tmp_path):
    root = str(tmp_path / "pt")
    _write_delta_table(
        spark, root,
        [(1, 10, "a"), (2, 10, "b"), (3, 20, "c")],
        ["id long", "bucket int", "v string"], part_cols=("bucket",))
    df = DeltaLakeReader(spark, root).read()
    assert dict(df.dtypes)["bucket"] == "int"
    assert sorted((r["id"], r["bucket"]) for r in df.collect()) == [
        (1, 10), (2, 10), (3, 20)]


def test_remove_actions_and_missing_version(spark, tmp_path):
    root = str(tmp_path / "rm")
    _write_delta_table(
        spark, root, [(1, "a"), (2, "b")], ["id long", "v string"],
        extra_commits=[[
            {"commitInfo": {"timestamp": 1700000100000, "operation": "DELETE"}},
            {"remove": {"path": "part-00000.parquet", "dataChange": True}},
        ]])
    r = DeltaLakeReader(spark, root)
    assert r.read(version=0).count() == 2
    assert r.read(version=1).count() == 0
    with pytest.raises(FileNotFoundError, match="missing Delta log"):
        # simulate a vacuumed log: drop v0, ask for full replay
        os.rename(os.path.join(root, "_delta_log", f"{0:020d}.json"),
                  os.path.join(root, "_delta_log", "gone"))
        r.snapshot(version=1)


def test_checkpoint_replay(spark, tmp_path):
    """_last_checkpoint + checkpoint parquet replaces the JSON prefix;
    later JSON deltas still apply on top."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "ck")
    df = _write_delta_table(spark, root, [(1, "a"), (2, "b")],
                            ["id long", "v string"])
    # v1 adds a second file via JSON
    df.limit(1).toPandas().to_parquet(os.path.join(root, "part-00001.parquet"))
    with open(os.path.join(root, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"add": {"path": "part-00001.parquet",
                                    "partitionValues": {}, "size": 1,
                                    "modificationTime": 0,
                                    "dataChange": True}}) + "\n")
    # checkpoint at v0 (metaData + protocol + the v0 add), then drop v0 JSON
    # non-empty maps: pyarrow refuses to write childless structs, and
    # real checkpoints type these as map<string,string> anyway
    ck_rows = [
        {"metaData": {"id": "t", "format": {"provider": "parquet",
                                            "options": {"o": "1"}},
                      "schemaString": df.schema.json(),
                      "partitionColumns": [],
                      "configuration": {"delta.enableChangeDataFeed":
                                        "false"}},
         "protocol": None, "add": None, "remove": None},
        {"metaData": None,
         "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "add": None, "remove": None},
        {"metaData": None, "protocol": None,
         "add": {"path": "part-00000.parquet", "partitionValues": None,
                 "size": 1, "modificationTime": 0, "dataChange": True},
         "remove": None},
    ]
    pq.write_table(pa.Table.from_pylist(ck_rows),
                   os.path.join(root, "_delta_log",
                                f"{0:020d}.checkpoint.parquet"))
    with open(os.path.join(root, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 0, "size": 3}, f)
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))

    r = DeltaLakeReader(spark, root)
    assert r.read(version=1).count() == 3  # 2 from checkpoint add + 1 delta


def test_deletion_vectors_refused(spark, tmp_path):
    root = str(tmp_path / "dv")
    _write_delta_table(
        spark, root, [(1, "a")], ["id long", "v string"],
        extra_commits=[[
            {"add": {"path": "part-00000.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True,
                     "deletionVector": {"storageType": "u",
                                        "pathOrInlineDv": "x",
                                        "offset": 1, "sizeInBytes": 1,
                                        "cardinality": 1}}},
        ]])
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        DeltaLakeReader(spark, root).snapshot(version=1)


def test_column_mapping_by_name(spark, tmp_path):
    """Reader version 2 + columnMapping=name: parquet stores physical
    names; logical schema comes from field metadata."""
    root = str(tmp_path / "cm")
    os.makedirs(os.path.join(root, "_delta_log"))
    df = spark.createDataFrame([(1, "x")], "col_1 long, col_2 string")
    df.toPandas().to_parquet(os.path.join(root, "part-00000.parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col_1"}},
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col_2"}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "part-00000.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    out = DeltaLakeReader(spark, root).read()
    assert out.columns == ["id", "name"]
    assert out.collect()[0]["name"] == "x"
