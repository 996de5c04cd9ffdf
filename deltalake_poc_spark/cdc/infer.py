"""Schema inference for undeclared CDC tables (SURVEY.md §1.4 mode 2).

The reference infers per-table schemas from the first record two ways:
arrow-type inference in the delta-rs handler
(consumer/python-consumer/delta_handler.py:133-145, null→string
default) and SQL-type inference in the Spark handler
(spark_delta_handler.py:196-208: datetime→TIMESTAMP, int→BIGINT,
float→DOUBLE, else STRING). Here the whole batch (not just the first
record) votes: Spark's JSON reader infers over every after_data
payload, then Debezium conventions are applied — epoch-µs integer
fields with ``_at``/``_date`` name suffixes become timestamps
(database.py:170-172's suffix rule), integers widen to long, and
null-only columns default to string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, NullType, StringType, StructField,
    StructType, TimestampType,
)

TS_SUFFIXES = ("_at", "_date")


def infer_table_schema(spark: SparkSession, events: DataFrame,
                       table: str) -> StructType:
    """Infer the snapshot schema for ``table`` from its after_data
    payloads in an event batch."""
    payloads = events.filter(
        (F.col("source_table") == table) & F.col("after_data").isNotNull()
    ).select("after_data")
    inferred = spark.read.json(payloads.rdd.map(lambda r: r["after_data"]))
    fields = []
    for f in inferred.schema.fields:
        dt = f.dataType
        if isinstance(dt, NullType):
            dt = StringType()  # null-only -> string (delta_handler.py:139)
        elif isinstance(dt, LongType) and f.name.endswith(TS_SUFFIXES):
            dt = TimestampType()  # epoch-µs by Debezium convention (F5)
        elif dt.typeName() in ("integer", "short", "byte"):
            dt = LongType()  # ints widen (spark_delta_handler.py:203 BIGINT)
        elif dt.typeName() == "float":
            dt = DoubleType()
        elif not isinstance(dt, (LongType, DoubleType, StringType,
                                 BooleanType, TimestampType)):
            dt = StringType()  # nested/unknown -> JSON string
        fields.append(StructField(f.name, dt))
    # stable order: id first (merge key), then alphabetical
    fields.sort(key=lambda f: (f.name != "id", f.name))
    return StructType(fields)
