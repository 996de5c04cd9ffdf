"""SQL surface: temp-view registry + INSERT INTO helper.

The reference issues much of its work as SQL strings over temp views
(spark_delta_handler.py DDL/MERGE/INSERT; notebook cells 20-38). Here
the engine is DataFrame-first, but the same SQL surface is available:
register the lakehouse tables as views and query with spark.sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deltalake_poc_spark.cdc.apply import CDCApplier
from deltalake_poc_spark.tables import VersionedTable


def register_views(applier: CDCApplier, tables: list[str] | None = None,
                   include_audit: bool = True, prefix: str = "") -> list[str]:
    """Register current snapshots (and the audit table) as temp views so
    users can ``spark.sql('SELECT ... JOIN ...')`` over them (notebook
    cells 20, 28-30's createOrReplaceTempView pattern)."""
    names = []
    for t in tables if tables is not None else list(applier.table_schemas):
        root = f"{applier.base_path}/{t}"
        if VersionedTable.is_table(root):
            applier.snapshot_table(t).read().createOrReplaceTempView(prefix + t)
            names.append(prefix + t)
    if include_audit and VersionedTable.is_table(f"{applier.base_path}/cdc_events"):
        applier.audit_table().read().createOrReplaceTempView(prefix + "cdc_events")
        names.append(prefix + "cdc_events")
    return names


def insert_into(spark: SparkSession, table: VersionedTable,
                rows: list[tuple] | DataFrame) -> None:
    """M10 — INSERT INTO ... VALUES (spark_delta_handler.py:127-141,
    notebook cells 33/35): append rows in table-schema order."""
    schema = table.schema()
    df = rows if isinstance(rows, DataFrame) else spark.createDataFrame(rows, schema)
    table.write(df, "append")
