"""Batch CDC apply — audit append + per-table dedup'd MERGE/DELETE.

The reference applies CDC three ways (row-at-a-time delta-rs
consumer/python-consumer/delta_handler.py:163-225, per-event SQL MERGE
spark_delta_handler.py:143-242, and per-micro-batch
spark_streaming.py:306-414). This module is the single batch-oriented
engine all of those collapse into (SURVEY.md §3.2), with the
reference's two scale bugs fixed:

1. **In-batch duplicate keys** (SURVEY.md §7.3): Delta MERGE throws on
   multiple source rows per key; the reference never dedups
   (spark_streaming.py:345-359). Here: keep the LATEST event per key
   — ordered by (source_lsn, offset) — via a window before merging; a
   trailing delete wins over earlier upserts.
2. **Driver-side delete** (spark_streaming.py:367-389 collects ids to
   the driver then calls delete). Here: deletes ride the same MERGE as
   a ``when_matched_delete`` clause — fully distributed, one pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampType

from deltalake_poc_spark.cdc import schema as S
from deltalake_poc_spark.tables import VersionedTable


class CDCApplier:
    """Applies parsed CDC event batches to an audit table + per-table
    snapshot tables (both VersionedTable)."""

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        table_schemas: dict[str, StructType] | None = None,
        key_col: str = "id",
        enable_cdf: bool = True,
        infer_unknown_tables: bool = False,
        evolve_schema: bool = False,
        auto_compact_every: int = 0,
        target_file_rows: int = 1_000_000,
        standard_mirror_path: str | None = None,
    ):
        """``auto_compact_every``: run OPTIMIZE on a snapshot table every
        N merge commits (0 = off). Micro-batch MERGEs produce small
        rewritten files each trigger — the reference hits the same
        small-file problem and schedules OPTIMIZE/VACUUM manually
        (spark_delta_handler.py:282-289, SURVEY.md §4); here compaction
        is a built-in policy of the apply loop.

        ``standard_mirror_path``: after each batch, incrementally sync
        every touched snapshot table to ``<path>/<table>`` as a
        STANDARD Delta table (tables/deltaexport.py) — the reference
        stack's delta-rs/delta-spark consumers can then follow the CDC
        output live without this engine. Metadata-only per sync (new
        commits' files hard-link; no data rewrite)."""
        self.spark = spark
        self.base_path = base_path
        self.table_schemas = dict(table_schemas or S.TABLE_SCHEMAS)
        self.key_col = key_col
        self.enable_cdf = enable_cdf
        self.infer_unknown_tables = infer_unknown_tables
        self.evolve_schema = evolve_schema
        self.auto_compact_every = auto_compact_every
        self.target_file_rows = target_file_rows
        self.standard_mirror_path = standard_mirror_path
        self._tables: dict[str, VersionedTable] = {}
        self._merges_since_compact: dict[str, int] = {}
        # incremental applied-batch-id scan state (see applied_batch_ids)
        self._applied_ids: set[str] = set()
        self._applied_scanned_to: int = -1

    # ------------------------------------------------------------- tables

    def errors_table(self) -> VersionedTable:
        """Dead-letter table for malformed messages (cdc/parse.py
        split_malformed). The reference logs-and-skips; a DLQ table
        keeps the bad messages queryable and replayable."""
        from pyspark.sql.types import (
            IntegerType, LongType, StringType, StructField, StructType,
            TimestampType,
        )

        schema = StructType([
            StructField("key", StringType()),
            StructField("value", StringType()),
            StructField("topic", StringType()),
            StructField("partition_id", IntegerType()),
            StructField("offset", LongType()),
            StructField("error", StringType()),
            StructField("failed_at", TimestampType()),
        ])
        return self._get_or_create("cdc_errors", schema)

    def audit_table(self) -> VersionedTable:
        """Audit table, partitioned by source_table — the partitioning
        the reference never added (partitionColumns: [] everywhere;
        SURVEY.md §4 flags this as the obvious improvement): per-table
        audit queries then scan only their partition."""
        return self._get_or_create("cdc_events", S.CDC_EVENTS_SCHEMA,
                                   partition_by=["source_table"])

    def snapshot_table(self, name: str) -> VersionedTable:
        base = self.table_schemas[name]
        full = StructType(
            base.fields
            + [
                # metadata columns every snapshot carries (SURVEY.md §1.5)
                S.StructField(S.META_OPERATION, S.StringType()),
                S.StructField(S.META_TIMESTAMP, TimestampType()),
                S.StructField(S.META_PROCESSED, TimestampType()),
            ]
        )
        return self._get_or_create(name, full)

    def _get_or_create(self, name: str, schema: StructType,
                       partition_by: list[str] | None = None) -> VersionedTable:
        if name not in self._tables:
            root = f"{self.base_path}/{name}"
            if VersionedTable.is_table(root):
                self._tables[name] = VersionedTable.for_path(self.spark, root)
            else:
                props = {"enableChangeDataFeed": "true"} if self.enable_cdf else {}
                self._tables[name] = VersionedTable.create(
                    self.spark, root, schema, properties=props,
                    if_not_exists=True, partition_by=partition_by,
                )
        return self._tables[name]

    # -------------------------------------------------------------- apply

    def applied_batch_ids(self) -> set[str]:
        """Batch ids already appended to the audit table (from commit
        operationParameters) — the foreachBatch idempotence marker.

        Incremental: commits are immutable once published, so only the
        log tail SINCE the last scan is read. Without this, a
        streaming job calling apply_batch per trigger re-reads the
        whole commit history every batch — O(N²) metadata reads over
        the job's lifetime (N = one commit per micro-batch)."""
        audit = self.audit_table()
        if not audit.log.exists():
            return set(self._applied_ids)
        latest = audit.log.latest_version()
        for c in audit.log.commits(start=self._applied_scanned_to + 1,
                                   end=latest):
            bid = c.operation_parameters.get("batchId")
            if bid is not None:
                self._applied_ids.add(bid)
        self._applied_scanned_to = latest
        return set(self._applied_ids)

    def apply_batch(self, events: DataFrame,
                    tables: list[str] | None = None,
                    batch_id: str | None = None,
                    cache: bool = True) -> dict[str, dict]:
        """Apply one batch of parsed CDC events (CDC_EVENTS_SCHEMA shape):
        append all to the audit table, then MERGE per-table snapshots.
        Returns per-table merge metrics.

        ``batch_id`` makes the AUDIT append exactly-once under
        at-least-once delivery (Spark replays the last un-committed
        micro-batch after a crash): the id is stamped into the append
        commit and replays of an already-appended batch skip the
        append. Snapshot MERGEs are idempotent by construction (same
        latest-event-per-key result), so they simply re-converge.
        This closes the reference's replay-duplicates gap on the audit
        path (its audit table is plain append; T3 in SURVEY.md §2.9).
        """
        # cache=False: callers slicing one parsed+persisted frame into
        # multiple batches pass it to avoid re-serializing every slice
        # into its own cache copy (the events frame is read 2+ times
        # below: audit append, then each table's merge)
        own_persist = cache
        if own_persist:
            events = events.persist()
        try:
            skip_audit = (batch_id is not None
                          and str(batch_id) in self.applied_batch_ids())
            if not skip_audit:
                extra = {"batchId": str(batch_id)} if batch_id is not None else None
                # Right-size the audit append WITHOUT a shuffle: the
                # envelope frame keeps its upstream partitioning
                # (spread/scan parallelism), so a small batch landed as
                # one near-empty file PER CORE — 64 x 65 KB files for
                # two micro-batches at sf0.1, each a commit-time footer
                # read and a scan entry for every later audit read.
                # r12 used a REBALANCE hint; its AQE exchange moved the
                # whole envelope frame per batch and measured ~0.3 s/
                # append slower than a plain coalesce to a bytes-
                # derived file target (interleaved A/B, 5 pairs). The
                # target comes from plan statistics (driver-side, no
                # job): tiny batches coalesce to one file, big batches
                # keep one partition per ~64 MB, so write parallelism
                # returns exactly when the bytes justify it (guide §6).
                to_write = events
                try:
                    nbytes = int(events._jdf.queryExecution()
                                 .optimizedPlan().stats().sizeInBytes())
                    target = max(1, nbytes // (64 << 20) + 1)
                    if events.rdd.getNumPartitions() > target:
                        to_write = events.coalesce(target)
                except Exception:
                    pass  # unsizable plan: append as-is
                self.audit_table().write(to_write, "append",
                                         extra_params=extra)
            if tables is None:
                seen = [r["source_table"] for r in
                        events.select("source_table").distinct().collect()]
                if self.infer_unknown_tables:
                    tables = seen
                else:
                    tables = [t for t in seen if t in self.table_schemas]
            unknown = [t for t in tables if t not in self.table_schemas]
            if unknown:
                # §1.4 mode 2: infer from this batch's payloads — but
                # only for tables the batch actually carries events
                # for. A multi-table consumer passes its FULL table
                # list every micro-batch; a batch that happens to hold
                # no rows for one table must defer that table's
                # inference to its first real events, not lock in an
                # empty schema (r9: the 4-table WAL tier's first
                # 10k-change batch held only table 0's inserts).
                from deltalake_poc_spark.cdc.infer import infer_table_schema

                seen_now = {r["source_table"] for r in
                            events.select("source_table")
                            .distinct().collect()}
                for t in unknown:
                    if t in seen_now:
                        self.table_schemas[t] = infer_table_schema(
                            self.spark, events, t)
            metrics = {}
            for t in sorted(tables):
                if t in self.table_schemas:
                    metrics[t] = self._apply_table(events, t)
            if self.standard_mirror_path:
                from deltalake_poc_spark.tables.deltaexport import (
                    export_standard_delta,
                )

                for t in sorted(tables):
                    export_standard_delta(
                        self.snapshot_table(t),
                        os.path.join(self.standard_mirror_path, t),
                        incremental=os.path.isdir(os.path.join(
                            self.standard_mirror_path, t, "_delta_log")))
            return metrics
        finally:
            if own_persist:
                events.unpersist()

    def rename_column(self, table: str, old: str, new: str):
        """Column-mapping rename on a snapshot table (reference
        README.md:149-162: metadata-only, no parquet rewrite): updates
        the versioned table's schema AND the applier's typing schema so
        subsequent batches (whose after_data now carries the new field
        name, as Debezium emits post-rename) apply under the new name.
        Old versions still time-travel with the old name."""
        if old == self.key_col:
            raise ValueError("cannot rename the merge key column")
        commit = self.snapshot_table(table).rename_column(old, new)
        if table in self.table_schemas:
            sch = self.table_schemas[table]
            self.table_schemas[table] = StructType([
                StructField(new if f.name == old else f.name,
                            f.dataType, f.nullable, f.metadata)
                for f in sch.fields
            ])
        return commit

    def drop_column(self, table: str, name: str):
        """Column-mapping drop on a snapshot table: metadata-only; the
        field leaves the logical schema, physical data stays until
        files rewrite naturally. Future events' values for the column
        are ignored (it is no longer in the typing schema)."""
        if name == self.key_col:
            raise ValueError("cannot drop the merge key column")
        commit = self.snapshot_table(table).drop_column(name)
        if table in self.table_schemas:
            sch = self.table_schemas[table]
            self.table_schemas[table] = StructType(
                [f for f in sch.fields if f.name != name])
        return commit

    def _maybe_evolve_schema(self, events: DataFrame, name: str) -> None:
        """Schema drift mid-stream (SURVEY.md §1.4 mode 3 / §7.6): new
        fields appearing in after_data extend the declared schema and
        the snapshot table (mergeSchema semantics — the reference's
        spark.databricks.delta.schema.autoMerge.enabled=true). Explicit
        renames/drops go through rename_column/drop_column (column
        mapping — metadata-only); implicit drift here is add-only."""
        from deltalake_poc_spark.cdc.infer import infer_table_schema

        current = self.table_schemas[name]
        inferred = infer_table_schema(
            self.spark, events.filter(F.col("source_table") == name), name)
        known = {f.name for f in current.fields}
        new_fields = [f for f in inferred.fields if f.name not in known]
        if not new_fields:
            return
        evolved = StructType(current.fields + new_fields)
        self.table_schemas[name] = evolved
        table = self.snapshot_table(name)
        # schema-only commit: append an empty frame carrying the evolved
        # shape; _merged_schema_json extends the table schema, no data
        meta_fields = [
            S.StructField(S.META_OPERATION, S.StringType()),
            S.StructField(S.META_TIMESTAMP, TimestampType()),
            S.StructField(S.META_PROCESSED, TimestampType()),
        ]
        table.write(
            self.spark.createDataFrame(
                [], StructType(evolved.fields + meta_fields)),
            "append",
        )

    def _apply_table(self, events: DataFrame, name: str) -> dict:
        if self.evolve_schema and name in self.table_schemas:
            self._maybe_evolve_schema(events, name)
        table_schema = self.table_schemas[name]
        key = self.key_col
        ev = events.filter(F.col("source_table") == name)

        # Key comes from after_data for upserts, before_data for deletes
        # (spark_streaming.py:320-341, 367-383).
        key_type = next(f.dataType for f in table_schema.fields if f.name == key)
        keyed = ev.withColumn(
            "__key",
            F.coalesce(
                F.get_json_object("after_data", f"$.{key}"),
                F.get_json_object("before_data", f"$.{key}"),
            ).cast(key_type),
        ).filter(F.col("__key").isNotNull())  # P5 null-key guard

        # Latest event per key: source_lsn then kafka offset (fixes the
        # reference's duplicate-keys-in-batch hazard, SURVEY.md §7.3).
        # max_by over a (lsn, offset) ordering struct instead of a
        # row_number window: the hash aggregate combines MAP-SIDE, so
        # the shuffle carries one partial row per (key, task) instead
        # of the whole batch, and there is no per-key sort. Struct
        # comparison is lexicographic with NULL smallest, which is
        # exactly desc_nulls_last(lsn) desc(offset) under max.
        latest = (
            keyed.groupBy("__key")
            .agg(F.max_by(
                F.struct(*[c for c in keyed.columns if c != "__key"]),
                F.struct("source_lsn", "offset")).alias("__r"))
            .select("__key", "__r.*")
        )

        # Re-type the JSON payload per the declared table schema (P9);
        # field-level Debezium timestamps are epoch-µs (F5;
        # database.py:20-27, "time.precision.mode": "connect").
        payload_fields = []
        for f in table_schema.fields:
            if isinstance(f.dataType, TimestampType):
                payload_fields.append(S.StructField(f.name, S.LongType()))
            else:
                payload_fields.append(f)
        payload_schema = StructType(payload_fields)
        rec = latest.withColumn(
            "__rec", F.from_json(F.col("after_data"), payload_schema)
        )

        cols = []
        for f in table_schema.fields:
            src = F.col(f"__rec.{f.name}")
            if f.name == key:
                src = F.col("__key")
            elif isinstance(f.dataType, TimestampType):
                src = F.timestamp_micros(src)
            cols.append(src.cast(f.dataType).alias(f.name))
        src_df = rec.select(
            *cols,
            F.col("operation").alias(S.META_OPERATION),
            F.col("event_timestamp").alias(S.META_TIMESTAMP),
            F.current_timestamp().alias(S.META_PROCESSED),
            (F.col("operation") == "d").alias("__is_delete"),
        )

        table = self.snapshot_table(name)
        commit = (
            table.merge(src_df, on=key)
            .when_matched_delete(condition=F.col("s.__is_delete"))
            .when_matched_update_all(condition=~F.col("s.__is_delete"))
            .when_not_matched_insert_all(condition=~F.col("s.__is_delete"))
            .without_source_validation()  # window above guarantees unique keys
            .execute()
        )
        if self.auto_compact_every:
            n = self._merges_since_compact.get(name, 0) + 1
            if n >= self.auto_compact_every:
                table.optimize(target_file_rows=self.target_file_rows,
                               zorder_by=[key])
                n = 0
            self._merges_since_compact[name] = n
        return commit.metrics
