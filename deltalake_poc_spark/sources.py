"""External source/sink escape hatches (SURVEY.md §2.1 S12, S16, S17).

- JDBC mirror read/write (S12): the reference keeps Postgres "target"
  mirrors updated with ON CONFLICT upserts (database.py:161-196); in
  this engine Postgres is just another snapshot sink — the same
  CDCApplier output written via spark JDBC. Plain reads mirror
  ``spark.read.jdbc``.
- Raw-parquet read (S16): the notebook's DuckDB-over-parquet path
  (cells 43-48) bypasses the transaction log and therefore sees
  removed/uncommitted files — provided for parity, with the same
  caveat, via ``read_raw_parquet``.
- S3/MinIO (S17): config-only in Spark — see EngineConfig.s3a()
  (session.py), mirroring notebook cell 60's fs.s3a.* settings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_read(spark: SparkSession, url: str, table: str,
              user: str | None = None, password: str | None = None,
              partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int | None = None) -> DataFrame:
    """Parallel JDBC read (predicate-partitioned when bounds given —
    without them the read is single-task, which does not scale)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def jdbc_write(df: DataFrame, url: str, table: str, mode: str = "append",
               user: str | None = None, password: str | None = None) -> None:
    """JDBC sink. For upsert semantics, land into a staging table and
    MERGE DB-side, or write the CDCApplier snapshot with
    mode='overwrite' (truncate) — per-row ON CONFLICT from executors
    (the reference's approach) does not scale past one connection."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    writer.mode(mode).save()


def read_raw_parquet(spark: SparkSession, table_root: str) -> DataFrame:
    """S16 parity: read a versioned table's data directory as bare
    parquet, IGNORING the transaction log — like the reference
    notebook's DuckDB httpfs reads, this sees files that have been
    logically removed but not yet vacuumed. Use VersionedTable.read()
    unless you specifically want that behavior."""
    return spark.read.parquet(f"{table_root}/data")
