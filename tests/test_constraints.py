"""CHECK constraints + NOT NULL enforcement (Delta parity:
ALTER TABLE ADD/DROP CONSTRAINT, schema nullability). Guards are
woven into the write plan as raise_error filters — violations fail
the write job itself, no validation pre-pass."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from deltalake_poc_spark.tables import VersionedTable

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("qty", LongType()),
    StructField("tag", StringType()),
])


def df_of(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable.create(spark, str(tmp_path / "c"), SCHEMA)
    t.write(df_of(spark, [(1, 10, "a"), (2, 20, "b")]), "append")
    return t


def test_check_constraint_blocks_bad_write(spark, table):
    table.add_constraint("qty_positive", "qty > 0")
    # good rows pass
    table.write(df_of(spark, [(3, 30, "c")]), "append")
    assert table.read().count() == 3
    # violating row fails the write job; table state unchanged
    with pytest.raises(Exception, match="qty_positive"):
        table.write(df_of(spark, [(4, -5, "d")]), "append")
    assert table.read().count() == 3
    # NULL passes a CHECK (SQL standard: only FALSE violates)
    table.write(df_of(spark, [(5, None, "e")]), "append")
    assert table.read().count() == 4


def test_add_constraint_validates_existing_rows(spark, table):
    table.write(df_of(spark, [(9, -1, "bad")]), "append")
    with pytest.raises(ValueError, match="existing row violates"):
        table.add_constraint("qty_positive", "qty > 0")


def test_merge_enforces_constraint(spark, table):
    table.add_constraint("qty_cap", "qty < 100")
    src = df_of(spark, [(2, 999, "boom")])
    with pytest.raises(Exception, match="qty_cap"):
        (table.merge(src, on="id")
         .when_matched_update_all().when_not_matched_insert_all().execute())
    # target unchanged
    assert {r["qty"] for r in table.read().collect()} == {10, 20}


def test_update_enforces_constraint(spark, table):
    table.add_constraint("qty_cap", "qty < 100")
    with pytest.raises(Exception, match="qty_cap"):
        table.update({"qty": "qty * 1000"}, "id = 1")
    assert {r["qty"] for r in table.read().collect()} == {10, 20}


def test_drop_constraint_reopens_writes(spark, table):
    table.add_constraint("qty_positive", "qty > 0")
    table.drop_constraint("qty_positive")
    table.write(df_of(spark, [(6, -1, "ok-now")]), "append")
    assert table.read().count() == 3
    with pytest.raises(ValueError, match="no such constraint"):
        table.drop_constraint("qty_positive")


def test_not_null_from_schema(spark, tmp_path):
    schema = StructType([
        StructField("id", LongType(), nullable=False),
        StructField("v", StringType()),
    ])
    t = VersionedTable.create(spark, str(tmp_path / "nn"), schema)
    t.write(spark.createDataFrame([(1, "a")], schema), "append")
    bad = spark.createDataFrame([(None, "x")], StructType([
        StructField("id", LongType(), nullable=True),
        StructField("v", StringType()),
    ]))
    with pytest.raises(Exception, match="NOT NULL"):
        t.write(bad, "append")
    assert t.read().count() == 1


def test_rename_constrained_column_rejected(spark, table):
    table.add_constraint("qty_positive", "qty > 0")
    with pytest.raises(ValueError, match="referenced by"):
        table.rename_column("qty", "amount")
    # unrelated rename still fine
    table.rename_column("tag", "label")


def test_constraint_survives_in_history(spark, table):
    c = table.add_constraint("qty_positive", "qty > 0")
    assert c.operation == "ADD CONSTRAINT"
    assert table.properties()["constraint.qty_positive"] == "qty > 0"
    # time travel to before the constraint sees no property
    before = table.snapshot(c.version - 1)
    assert "constraint.qty_positive" not in before.properties


def test_generated_columns(spark, tmp_path):
    """Delta generated columns: expression in field metadata; omitted
    values compute on write/merge-insert, supplied values must match."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("name_upper", StringType(),
                    metadata={"generationExpression": "upper(name)"}),
    ])
    t = VersionedTable.create(spark, str(tmp_path / "gen"), schema)

    # omitted -> computed
    t.write(spark.createDataFrame([(1, "ada")], "id long, name string"),
            "append")
    got = {r["id"]: r["name_upper"] for r in t.read().collect()}
    assert got == {1: "ADA"}

    # supplied + correct -> kept
    t.write(spark.createDataFrame([(2, "bob", "BOB")], schema), "append")
    # supplied + WRONG -> write fails
    with pytest.raises(Exception, match="generated column name_upper"):
        t.write(spark.createDataFrame([(3, "cat", "DOG")], schema), "append")
    assert t.read().count() == 2

    # merge-insert computes it too
    src = spark.createDataFrame([(4, "eve")], "id long, name string")
    (t.merge(src, on="id")
     .when_matched_update_all().when_not_matched_insert_all().execute())
    got = {r["id"]: r["name_upper"] for r in t.read().collect()}
    assert got == {1: "ADA", 2: "BOB", 4: "EVE"}


def test_describe_detail(spark, table):
    table.add_constraint("qty_positive", "qty > 0")
    d = table.detail()
    assert d["numFiles"] >= 1 and d["sizeInBytes"] > 0
    assert d["numRecords"] == 2
    assert d["version"] == table.version()
    assert d["constraints"] == {"qty_positive": "qty > 0"}
    assert d["numDeletionVectors"] == 0
    assert d["partitionColumns"] == []
