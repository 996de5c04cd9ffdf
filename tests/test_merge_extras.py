"""Change-detection condition builder, decimal money columns
(SURVEY.md §7.1), and a hypothesis property test: MERGE semantics
against a plain-Python model over random upsert/delete batches."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType, LongType, StringType, StructField, StructType,
)

from deltalake_poc_spark.tables import VersionedTable
from deltalake_poc_spark.tables.merge import change_detection_condition


def test_change_detection_condition_builder(spark, tmp_path):
    schema = StructType([StructField("id", LongType()),
                         StructField("a", StringType()),
                         StructField("b", StringType())])
    t = VersionedTable.create(spark, str(tmp_path / "t"), schema)
    t.write(spark.createDataFrame([(1, "x", None), (2, "y", "z")], schema))
    cond = change_detection_condition(["id", "a", "b"])
    assert cond == "NOT (t.a <=> s.a AND t.b <=> s.b)"
    src = spark.createDataFrame([(1, "x", None), (2, "y", "CHANGED")], schema)
    c = (t.merge(src, on="id")
         .when_matched_update_all(condition=cond)
         .execute())
    # row 1 identical (incl. null <=> null) -> copied, not updated
    assert c.metrics["numTargetRowsUpdated"] == 1
    assert c.metrics["numTargetRowsCopied"] == 1


def test_decimal_money_columns(spark, tmp_path):
    """§7.1: the RisingWave path keeps DECIMAL(10,2)/(12,2)
    (create-delta-tables.py:43,54,63); the table layer must round-trip
    decimals through write/merge/stats."""
    schema = StructType([StructField("id", LongType()),
                         StructField("price", DecimalType(10, 2)),
                         StructField("total", DecimalType(12, 2))])
    t = VersionedTable.create(spark, str(tmp_path / "d"), schema)
    t.write(spark.createDataFrame(
        [(1, Decimal("9.99"), Decimal("19.98")),
         (2, Decimal("0.01"), Decimal("0.02"))], schema))
    (t.merge(spark.createDataFrame([(2, Decimal("5.00"), Decimal("10.00"))], schema),
             on="id")
     .when_matched_update_all().execute())
    got = {r["id"]: (r["price"], r["total"]) for r in t.read().collect()}
    assert got[1] == (Decimal("9.99"), Decimal("19.98"))
    assert got[2] == (Decimal("5.00"), Decimal("10.00"))
    agg = t.read().agg(F.sum("price").alias("s")).collect()[0]["s"]
    assert agg == Decimal("14.99")


SCHEMA = StructType([StructField("id", LongType()),
                     StructField("v", StringType())])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=st.lists(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=6),      # key
                  st.sampled_from(["upsert", "delete"]),
                  st.text(alphabet="ab", max_size=2)),        # value
        min_size=1, max_size=5, unique_by=lambda t: t[0]),
    min_size=1, max_size=4))
def test_merge_matches_model(spark, tmp_path_factory, batches):
    """Random per-key-unique batches of upserts/deletes applied through
    MERGE must equal a dict replay."""
    tmp = tmp_path_factory.mktemp("prop")
    t = VersionedTable.create(spark, str(tmp / "t"), SCHEMA)
    model: dict[int, str] = {}
    for batch in batches:
        rows = [(k, v, op == "delete") for k, op, v in batch]
        src = spark.createDataFrame(
            rows, "id long, v string, __del boolean")
        (t.merge(src, on="id")
         .when_matched_delete(condition=F.col("s.__del"))
         .when_matched_update_all(condition=~F.col("s.__del"))
         .when_not_matched_insert_all(condition=~F.col("s.__del"))
         .execute())
        for k, op, v in batch:
            if op == "delete":
                model.pop(k, None)
            else:
                model[k] = v
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == model


def test_merge_composite_key(spark, tmp_path):
    """Composite merge keys: join/classify/prune on the conjunction of
    key columns; rows agreeing on one key column but not the other are
    NOT matches."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("region", StringType()),
        StructField("sku", LongType()),
        StructField("qty", LongType()),
    ])
    t = VersionedTable.create(spark, str(tmp_path / "ck"), schema)
    t.write(spark.createDataFrame(
        [("eu", 1, 10), ("eu", 2, 20), ("us", 1, 30)], schema), "append")

    src = spark.createDataFrame(
        [("eu", 1, 11),   # matches (eu,1) -> update
         ("us", 2, 40),   # sku 2 exists only in eu -> insert
         ("ap", 9, 50)],  # new region -> insert
        schema)
    commit = (t.merge(src, on=["region", "sku"])
              .when_matched_update_all()
              .when_not_matched_insert_all()
              .execute())
    assert commit.metrics["numTargetRowsUpdated"] == 1
    assert commit.metrics["numTargetRowsInserted"] == 2
    got = {(r["region"], r["sku"]): r["qty"] for r in t.read().collect()}
    assert got == {("eu", 1): 11, ("eu", 2): 20, ("us", 1): 30,
                   ("us", 2): 40, ("ap", 9): 50}
    assert "t.region = s.region AND t.sku = s.sku" in \
        commit.operation_parameters["predicate"]

    # duplicate composite keys in the source raise; distinct tuples
    # sharing one column do not
    dup = spark.createDataFrame([("eu", 1, 1), ("eu", 1, 2)], schema)
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge(dup, on=["region", "sku"]).when_matched_update_all().execute()
    ok = spark.createDataFrame([("eu", 3, 1), ("us", 3, 2)], schema)
    (t.merge(ok, on=["region", "sku"])
     .when_matched_update_all().when_not_matched_insert_all().execute())
    assert t.read().count() == 7


def test_merge_schema_evolution(spark, tmp_path):
    """with_schema_evolution(): new source columns extend the target
    schema in the merge commit; pre-existing rows read them as null;
    without the flag new source columns are dropped (current default)."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("id", LongType()),
        StructField("v", StringType()),
    ])
    t = VersionedTable.create(spark, str(tmp_path / "ev"), schema)
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], schema), "append")

    src = spark.createDataFrame([(2, "b2", "fresh"), (3, "c", "new")],
                                "id long, v string, note string")
    # default: extra source column ignored
    (t.merge(src, on="id")
     .when_matched_update_all().when_not_matched_insert_all().execute())
    assert "note" not in [f.name for f in t.schema().fields]

    # evolved: column lands in the schema; old rows read null
    c = (t.merge(src, on="id").with_schema_evolution()
         .when_matched_update_all().when_not_matched_insert_all().execute())
    assert c.schema_json is not None
    got = {r["id"]: (r["v"], r["note"]) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("b2", "fresh"), 3: ("c", "new")}
    # time travel before the evolving merge has no such column
    old_schema = t.schema(t.snapshot(c.version - 1))
    assert "note" not in [f.name for f in old_schema.fields]
