"""VersionedTable — ACID-ish versioned parquet tables for Spark.

Re-creates, from scratch and PySpark-native, the Delta Lake capability
surface the reference uses (SURVEY.md §2.1/§2.10):

- batch read / append / overwrite with schema merge   (S5, S11)
- time travel by version and by timestamp             (S6, S7)
- change data feed with _change_type/_commit_version  (S8)
- create / exists / drop                              (S9, S10, M9, M11)
- MERGE upsert and DELETE                             (M1-M3; tables/merge.py)
- VACUUM / OPTIMIZE / history / RESTORE               (M4-M7)
- table properties incl. enableChangeDataFeed         (M8)

Design for scale: the log is driver-side metadata (tiny); all data
movement is Spark jobs over parquet. Readers plan one distributed
scan of exactly the active files; writers use file-stats pruning so a
MERGE touching k of N files rewrites only those k (tables/merge.py).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from deltalake_poc_spark.tables.log import (
    Commit, ConcurrentWriteError, FileEntry, Snapshot, TableLog,
)
from deltalake_poc_spark.tables.stats import (BLOOM_COLS_PROP, BLOOM_FPP_PROP,
                                               collect_blooms_distributed,
                                               collect_file_stats)

CDF_PROP = "enableChangeDataFeed"
DV_PROP = "enableDeletionVectors"
DV_DIR = "_dv"
CDF_COLS = ("_change_type", "_commit_version", "_commit_timestamp")


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.log = TableLog(root)

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: StructType,
        properties: dict | None = None,
        if_not_exists: bool = False,
        partition_by: list[str] | None = None,
    ) -> "VersionedTable":
        """CREATE TABLE (reference: spark_delta_handler.py:109-125 DDL,
        create-delta-tables.py:93-116 schema-only create w/ CDF).
        ``partition_by`` enables Hive-style partitioned data layout —
        an improvement over the reference, which partitions nothing
        (partitionColumns: [] in every Delta log; SURVEY.md §4)."""
        t = cls(spark, root)
        if t.log.exists():
            if if_not_exists:
                return t
            raise FileExistsError(f"table already exists at {root}")
        props = dict(properties or {})
        if partition_by:
            missing = [c for c in partition_by
                       if c not in {f.name for f in schema.fields}]
            if missing:
                raise ValueError(f"partition columns not in schema: {missing}")
            props["partitionColumns"] = json.dumps(partition_by)
        os.makedirs(t.log.data_dir(), exist_ok=True)
        t.log.write_commit(
            Commit(
                version=t.log.next_version(),
                timestamp=t.log.monotonic_now_ms(),
                operation="CREATE TABLE",
                schema_json=schema.json(),
                properties=props,
            )
        )
        return t

    def partition_columns(self, snap: Snapshot | None = None) -> list[str]:
        snap = snap or self.snapshot()
        raw = snap.properties.get("partitionColumns")
        return json.loads(raw) if raw else []

    @classmethod
    def is_table(cls, root: str) -> bool:
        """M11 — reference: DeltaTable.isDeltaTable (spark_delta_handler.py:164)."""
        return TableLog(root).exists()

    @classmethod
    def for_path(cls, spark: SparkSession, root: str) -> "VersionedTable":
        t = cls(spark, root)
        if not t.log.exists():
            raise FileNotFoundError(f"not a versioned table: {root}")
        return t

    def drop(self) -> None:
        """M9 — DROP TABLE (notebook cell 32)."""
        shutil.rmtree(self.log.root, ignore_errors=True)

    # ------------------------------------------------------------- snapshots

    def snapshot(self, version: int | None = None,
                 timestamp_ms: int | None = None) -> Snapshot:
        return self.log.snapshot(version, timestamp_ms)

    def schema(self, snap: Snapshot | None = None) -> StructType | None:
        snap = snap or self.snapshot()
        return StructType.fromJson(json.loads(snap.schema_json)) if snap.schema_json else None

    def properties(self) -> dict:
        return self.snapshot().properties

    # ---------------------------------------------------------- column mapping

    COLUMN_MAPPING_PROP = "columnMapping.mode"

    @staticmethod
    def _physical(f) -> str:
        """Physical (on-disk) column name for a schema field — the
        ``physicalName`` field-metadata entry, defaulting to the
        logical name (Delta column mapping, reference README.md:149-162:
        renames/drops change metadata only, never rewrite parquet)."""
        return (f.metadata or {}).get("physicalName", f.name)

    def column_mapping(self, snap: Snapshot | None = None) -> dict[str, str]:
        """logical -> physical name map for a snapshot's schema."""
        schema = self.schema(snap)
        if schema is None:
            return {}
        return {f.name: self._physical(f) for f in schema.fields}

    def _mapping_enabled(self, snap: Snapshot | None = None) -> bool:
        snap = snap or (self.snapshot() if self.log.exists() else None)
        return bool(snap) and str(
            snap.properties.get(self.COLUMN_MAPPING_PROP, "")) == "name"

    def cdf_enabled(self, snap: Snapshot | None = None) -> bool:
        snap = snap or self.snapshot()
        return str(snap.properties.get(CDF_PROP, "false")).lower() == "true"

    def version(self) -> int:
        return self.log.latest_version()

    # ---------------------------------------------------------------- reads

    def read(self, version: int | None = None,
             timestamp_ms: int | None = None,
             where: str | None = None) -> DataFrame:
        """Batch read, optionally time-traveled (S5-S7; reference:
        spark.read.format('delta').option('versionAsOf'/'timestampAsOf')
        spark_delta_handler.py:253-267, notebook cells 20-24).

        ``where`` enables Delta-style DATA SKIPPING: provable AND-ed
        ``col <op> literal`` conjuncts prune files whose per-file
        [min, max] stats cannot contain a match (files_matching), and
        the FULL predicate is then applied to the surviving rows — so
        pruning is a pure optimization and arbitrary predicates stay
        correct. Pairs with OPTIMIZE ZORDER BY, which clusters the
        stats ranges so selective predicates touch few files."""
        snap = self.snapshot(version, timestamp_ms)
        if where is None:
            return self._read_files(snap.file_paths, snap)
        return self._read_files(self.files_matching(where, snap),
                                snap).filter(where)

    def _candidate_paths(self, snap: Snapshot, predicate) -> list[str]:
        """Stats-pruned scan list for finding rows where ``predicate``
        IS TRUE (DELETE/UPDATE discovery): a file whose [min, max]
        ranges exclude every provable conjunct cannot contain a TRUE
        row (NULL never satisfies IS TRUE), so sparse point operations
        scan candidate files, not the table. Column predicates prune
        nothing (conservative)."""
        if isinstance(predicate, str):
            return self.files_matching(predicate, snap)
        return snap.file_paths

    def files_matching(self, where: str, snap: Snapshot | None = None) -> list[str]:
        """Relative data-file paths whose stats admit ``where`` (see
        read). Deletion vectors only shrink a file's live rows, so its
        recorded [min, max] remain valid over-approximations."""
        from .stats import (bloom_may_match, file_may_match,
                            parse_skipping_predicates, partition_may_match)

        if snap is None:
            snap = self.snapshot()
        preds = parse_skipping_predicates(where)
        if not preds:
            return snap.file_paths
        return [e.path for e in snap.files
                if partition_may_match(e.partition, preds)
                and file_may_match(e.stats, preds)
                and bloom_may_match(e.bloom, preds)]

    def _read_files(self, rel_paths: list[str], snap: Snapshot,
                    with_position: bool = False) -> DataFrame:
        """Distributed scan of the given files, deletion-vector
        filtered and schema-aligned. ``with_position=True`` keeps
        ``__file``/``__pos`` columns (absolute file URI + row index)
        for callers that address rows by position (DV delete).

        DV filtering is a LEFT ANTI join on (file, row position)
        against the active DV rows of exactly the requested files —
        the DV side is tiny relative to the data (a few deleted
        positions per file; tables where DVs grow large should purge),
        so AQE plans a broadcast anti-join: the scan stays one pass,
        no table-sized shuffle."""
        schema = self.schema(snap)
        if not rel_paths:
            if schema is None:
                raise ValueError("empty table with no declared schema")
            df = self.spark.createDataFrame([], schema)
            if with_position:
                df = (df.withColumn("__file", F.lit(None).cast("string"))
                        .withColumn("__pos", F.lit(None).cast("long")))
            return df
        paths = [self.log.abs_path(p) for p in rel_paths]
        reader = self.spark.read
        if schema is not None:
            # explicit PHYSICAL read schema from the snapshot: no
            # schema-inference/mergeSchema footer job per read (at
            # 1M files that merge was a distributed job per read; the
            # log already knows the schema). Files missing a column
            # (add-only evolution) read it as null natively; extra
            # columns (dropped-column data) are ignored natively.
            from pyspark.sql.types import StructField as _SF
            from pyspark.sql.types import StructType as _ST
            reader = reader.schema(_ST([
                _SF(self._physical(f), f.dataType, True) for f in schema.fields]))
        else:
            reader = reader.option("mergeSchema", "true")
        if self.partition_columns(snap):
            # Hive-layout files: partition values live in the directory
            # names; basePath lets Spark recover (and prune on) them
            reader = reader.option("basePath", self.log.data_dir())
        df = reader.parquet(*paths)
        dvs = ({p: snap.dvs[p] for p in rel_paths if p in snap.dvs}
               if snap.dvs else {})
        if dvs or with_position:
            df = (df.withColumn("__file", F.col("_metadata.file_path"))
                    .withColumn("__pos", F.col("_metadata.row_index")))
        if schema is not None:
            # align to declared schema: files store PHYSICAL names
            # (column mapping), output carries logical; missing -> null,
            # extra (e.g. dropped columns' data) ignored
            cols = []
            present = {f.name for f in df.schema.fields}
            for f in schema.fields:
                phys = self._physical(f)
                if phys in present:
                    cols.append(F.col(phys).cast(f.dataType).alias(f.name))
                else:
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            if dvs or with_position:
                cols += [F.col("__file"), F.col("__pos")]
            df = df.select(*cols)
        if dvs:
            # anti-join on (file BASENAME, pos): basenames are
            # uuid-unique within a table, and unlike the full
            # _metadata.file_path URI they carry no URL-encodable
            # characters — matching on a reconstructed absolute URI
            # breaks silently for table roots with spaces etc.
            dv_df = (self.spark.read.schema("file string, pos long").parquet(
                        *sorted({self.log.abs_path(d) for d in dvs.values()}))
                     .filter(F.col("file").isin(list(dvs)))
                     .select(F.element_at(F.split(F.col("file"), "/"), -1)
                             .alias("__dvf"),
                             F.col("pos").alias("__dvp")))
            df = df.join(dv_df,
                         (F.element_at(F.split(F.col("__file"), "/"), -1)
                          == F.col("__dvf"))
                         & (F.col("__pos") == F.col("__dvp")),
                         "left_anti")
        if not with_position and dvs:
            df = df.drop("__file", "__pos")
        return df

    def read_change_feed(self, starting_version: int = 0,
                         ending_version: int | None = None) -> DataFrame:
        """Change Data Feed read (S8; reference: notebook cells 25-26,
        54, 62 — option('readChangeFeed','true').option('startingVersion',v)).

        insert-only commits are derived from their add-files (no extra
        change files written — same trick as Delta); MERGE/DELETE/
        UPDATE commits read explicit change files from _changes/v=N.
        Output: table columns + _change_type/_commit_version/_commit_timestamp.
        """
        if not self.cdf_enabled():
            raise ValueError(f"{CDF_PROP} is not set on table {self.log.root}")
        snap = self.snapshot()
        end = ending_version if ending_version is not None else snap.version
        schema = self.schema(snap)
        pieces: list[DataFrame] = []
        for c in self.log.commits(starting_version, end):
            piece = None
            if c.operation in ("WRITE", "APPEND", "CREATE TABLE"):
                if c.add:
                    piece = self._stamp(self._plain_read([a.path for a in c.add], schema),
                                        "insert", c)
            elif c.operation in ("OVERWRITE", "RESTORE"):
                parts = []
                if c.add:
                    parts.append(self._stamp(
                        self._plain_read([a.path for a in c.add], schema), "insert", c))
                if c.remove:
                    parts.append(self._stamp(
                        self._plain_read(list(c.remove), schema), "delete", c))
                piece = self._union(parts)
            elif c.operation in ("MERGE", "DELETE", "UPDATE"):
                cd = self.log.commit_changes_dir(c)
                if os.path.isdir(cd) and any(
                    f.endswith(".parquet") for f in os.listdir(cd)
                ):
                    rd = self.spark.read
                    if schema is not None:
                        # explicit physical schema: no footer-inference
                        # job per commit leg (same rule as _read_files)
                        from pyspark.sql.types import StringType as _St
                        from pyspark.sql.types import StructField as _SF
                        from pyspark.sql.types import StructType as _ST
                        rd = rd.schema(_ST(
                            [_SF(self._physical(f), f.dataType, True)
                             for f in schema.fields]
                            + [_SF("_change_type", _St(), True)]))
                    ch = rd.parquet(cd)
                    if schema is not None:
                        # change files carry physical names; realign to
                        # the current logical schema (column mapping)
                        present = set(ch.columns)
                        cols = []
                        for f in schema.fields:
                            phys = self._physical(f)
                            src = (F.col(phys) if phys in present
                                   else F.lit(None))
                            cols.append(src.cast(f.dataType).alias(f.name))
                        ch = ch.select(*cols, "_change_type")
                    piece = (
                        ch.withColumn("_commit_version", F.lit(c.version))
                        .withColumn("_commit_timestamp",
                                    F.timestamp_millis(F.lit(c.timestamp)))
                    )
            # OPTIMIZE / VACUUM / SET TBLPROPERTIES: no logical change
            if piece is not None:
                pieces.append(piece)
        if not pieces:
            base = self.spark.createDataFrame([], schema) if schema else None
            if base is None:
                raise ValueError("empty CDF and no schema")
            return (base.withColumn("_change_type", F.lit(""))
                        .withColumn("_commit_version", F.lit(0).cast("long"))
                        .withColumn("_commit_timestamp", F.timestamp_millis(F.lit(0))))
        return self._union(pieces)

    def _plain_read(self, rel_paths: list[str], schema: StructType | None,
                    dvs: dict | None = None) -> DataFrame:
        props = self.snapshot().properties if self.log.exists() else {}
        snap = Snapshot(0, 0, [], schema.json() if schema else None, props,
                        dvs or {})
        return self._read_files(rel_paths, snap)

    def _stamp(self, df: DataFrame, change_type: str, c: Commit) -> DataFrame:
        return (
            df.withColumn("_change_type", F.lit(change_type))
            .withColumn("_commit_version", F.lit(c.version).cast("long"))
            .withColumn("_commit_timestamp", F.timestamp_millis(F.lit(c.timestamp)))
        )

    @staticmethod
    def _union(parts: list[DataFrame]) -> DataFrame | None:
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # --------------------------------------------------------------- writes

    def _materialize(self, df: DataFrame, stats_cols: list[str] | None = None,
                     sort_within_partitions_by: list[str] | None = None,
                     partition_by: list[str] | None = None,
                     mapping: dict[str, str] | None = None) -> list[FileEntry]:
        """Write df's rows as new parquet files under data/ and return
        their FileEntries (with footer-derived min/max stats). With
        ``partition_by``, files land in Hive-style k=v directories under
        data/ and carry their partition values in the log entry."""
        import urllib.parse

        staging = self.log.new_data_file_dir()
        # column mapping: data files store PHYSICAL names; stats are
        # re-keyed back to logical below so pruning stays logical.
        # Callers committing a NEW schema (write() with evolution) pass
        # that schema's mapping — the snapshot's mapping lags one commit
        if mapping is None:
            mapping = self.column_mapping() if self.log.exists() else {}
        nontrivial = {k: v for k, v in mapping.items() if k != v}
        inv = {v: k for k, v in mapping.items()}
        if nontrivial:
            df = df.select(*[
                F.col(c).alias(nontrivial.get(c, c)) for c in df.columns])
            if stats_cols:
                stats_cols = [nontrivial.get(c, c) for c in stats_cols]
        props = self.properties() if self.log.exists() else {}
        bloom_cols = [c.strip()
                      for c in str(props.get(BLOOM_COLS_PROP, "")).split(",")
                      if c.strip()]
        bloom_fpp = float(props.get(BLOOM_FPP_PROP, 0.01))
        if sort_within_partitions_by:
            df = df.sortWithinPartitions(*sort_within_partitions_by)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        # Size-targeted output files: AQE's parallelismFirst default
        # refuses to coalesce below defaultParallelism, so a 172-row
        # MERGE output lands as 32 near-empty files — each one a footer
        # stats read now and a scan task forever after. Scoped to the
        # staging write: shuffle-derived frames (merge sources, MV
        # aggregations) coalesce to the 64MB advisory target; frames
        # without a live shuffle (plain appends of scan-partitioned
        # data) keep their scan parallelism.
        pf_key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
        try:
            old_pf = self.spark.conf.get(pf_key)
        except Exception:
            old_pf = None
        try:
            self.spark.conf.set(pf_key, "false")
            writer.parquet(staging)
        finally:
            if old_pf is None:
                self.spark.conf.unset(pf_key)
            else:
                self.spark.conf.set(pf_key, old_pf)
        # Per-file blooms are computed by ONE distributed job over the
        # staging dir BEFORE the files move to their final names —
        # write tasks read the data, the driver receives only the
        # serialized filters (keyed by staged path).
        staged_blooms: dict[str, dict] = {}
        if bloom_cols:
            staged_blooms = collect_blooms_distributed(
                self.spark, staging,
                [nontrivial.get(c, c) for c in bloom_cols],
                fpp=bloom_fpp)
        entries: list[FileEntry] = []
        os.makedirs(self.log.data_dir(), exist_ok=True)
        for dirpath, _dirs, files in os.walk(staging):
            subdir = os.path.relpath(dirpath, staging)
            part_vals: dict[str, str] = {}
            if subdir != ".":
                for seg in subdir.split(os.sep):
                    if "=" in seg:
                        k, v = seg.split("=", 1)
                        part_vals[k] = urllib.parse.unquote(v)
            for name in sorted(files):
                if not name.endswith(".parquet"):
                    continue
                sub = "" if subdir == "." else subdir + "/"
                rel = f"{TableLog.DATA_DIR}/{sub}{uuid.uuid4().hex}.parquet"
                staged_abs = os.path.join(dirpath, name)
                os.makedirs(os.path.dirname(self.log.abs_path(rel)), exist_ok=True)
                shutil.move(staged_abs, self.log.abs_path(rel))
                n, stats = collect_file_stats(self.log.abs_path(rel), stats_cols)
                if n == 0:
                    os.unlink(self.log.abs_path(rel))
                    continue
                bloom = {}
                if bloom_cols:
                    # property names logical columns; files store
                    # physical names — translate both ways like stats
                    phys_bloom = staged_blooms.get(staged_abs, {})
                    bloom = {inv.get(c, c): b for c, b in phys_bloom.items()}
                if inv:
                    stats = {inv.get(c, c): v for c, v in stats.items()}
                entries.append(FileEntry(rel, n, stats, part_vals, bloom))
        shutil.rmtree(staging, ignore_errors=True)
        # only remove the shared _staging parent if it is empty: a
        # concurrent writer (write() retries on commit conflicts, so
        # concurrency is supported) may still have its own staging dir
        # in flight — rmtree of the parent would silently discard its
        # files and make it commit an empty add list
        try:
            os.rmdir(os.path.dirname(staging))
        except OSError:
            pass
        return entries

    def _merged_schema_json(self, df: DataFrame) -> str:
        """Schema-merge an incoming frame with the table schema
        (mergeSchema/autoMerge: SURVEY.md §1.4; spark_streaming.py:297)."""
        current = self.schema() if self.log.exists() else None
        if current is None:
            return df.schema.json()
        names = {f.name for f in current.fields}
        new_fields = [f for f in df.schema.fields if f.name not in names]
        if new_fields and self._mapping_enabled():
            # fresh physical names for columns added under mapping: the
            # logical name may collide with a renamed/dropped column's
            # physical data still present in old files
            stamped = []
            for f in new_fields:
                md = dict(f.metadata or {})
                md.setdefault("physicalName",
                              f"{f.name}_{uuid.uuid4().hex[:8]}")
                stamped.append(StructField(f.name, f.dataType,
                                           f.nullable, md))
            new_fields = stamped
        merged = StructType(current.fields + new_fields)
        return merged.json()

    def _publish(self, c: Commit, snap: Snapshot | None,
                 table_level: bool = False,
                 cleanup_on_fail: tuple[str, ...] = ()) -> Commit:
        """Publish a commit under optimistic concurrency
        (TableLog.write_commit_with_rebase). CDF change files and DV
        sidecars are staged in unique directories recorded IN the
        commit (c.change_dir / c.dv_updates), so rebase needs no file
        moves and racing writers can never clobber each other's staged
        output. ``cleanup_on_fail`` lists rel dirs this operation
        staged — removed if the commit loses a conflict so aborted
        writers leave no orphans."""
        try:
            return self.log.write_commit_with_rebase(
                c, read_version=snap.version if snap is not None else None,
                table_level=table_level)
        except ConcurrentWriteError:
            for rel in cleanup_on_fail:
                shutil.rmtree(self.log.abs_path(rel), ignore_errors=True)
            raise

    def write(self, df: DataFrame, mode: str = "append",
              stats_cols: list[str] | None = None,
              extra_params: dict | None = None) -> Commit:
        """Append/overwrite (S3, S11; reference: write_deltalake mode=
        append/overwrite delta_handler.py:107-112, df.write.format('delta')).
        Schema merge is always on (matching the reference's global
        spark.databricks.delta.schema.autoMerge.enabled=true)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"bad mode {mode}")
        exists = self.log.exists()
        snap = self.snapshot() if exists else None
        schema_json = self._merged_schema_json(df)
        pb = self.partition_columns(snap) if snap else []
        committed = StructType.fromJson(json.loads(schema_json))
        mapping = {f.name: self._physical(f) for f in committed.fields}
        from deltalake_poc_spark.tables.constraints import (
            apply_generated, enforce,
        )

        df = apply_generated(df, committed)
        if snap is not None:
            df = enforce(df, snap.properties, self.schema(snap))
        entries = self._materialize(df, stats_cols, partition_by=pb or None,
                                    mapping=mapping)
        op = "APPEND" if (mode == "append" and exists) else (
            "OVERWRITE" if exists else "WRITE")
        os.makedirs(self.log.data_dir(), exist_ok=True)
        commit = Commit(
            version=self.log.next_version(),
            timestamp=self.log.monotonic_now_ms(),
            operation=op,
            operation_parameters={"mode": mode, **(extra_params or {})},
            add=entries,
            remove=snap.file_paths if (mode == "overwrite" and snap) else [],
            schema_json=schema_json,
            properties=None if exists else {},
            metrics={"numOutputRows": sum(e.num_records for e in entries),
                     "numFiles": len(entries)},
        )
        # appends are blind (no read-set): they rebase freely past
        # concurrent commits — unless schema/properties moved under us,
        # in which case our merged schema_json is stale and re-issuing
        # it would clobber the other writer's evolution (the conflict
        # check in write_commit_with_rebase catches exactly that).
        # overwrite replaces the table it READ: never rebases.
        return self._publish(commit, snap, table_level=(op == "OVERWRITE"))

    def set_properties(self, props: dict) -> Commit:
        """M8 — ALTER TABLE SET TBLPROPERTIES (create-delta-tables.py:119-137)."""
        snap = self.snapshot()
        merged = dict(snap.properties)
        merged.update(props)
        c = Commit(
            version=self.log.next_version(),
            timestamp=self.log.monotonic_now_ms(),
            operation="SET TBLPROPERTIES",
            operation_parameters={"properties": props},
            properties=merged,
        )
        return self._publish(c, snap)

    def add_constraint(self, name: str, expr: str) -> Commit:
        """ALTER TABLE ADD CONSTRAINT (Delta parity): store a CHECK
        constraint and enforce it on every subsequent write/MERGE/
        UPDATE. Existing rows must already satisfy it (validated here
        with one early-terminating probe, like Delta's full-scan
        check). Constraint expressions reference LOGICAL column names;
        renaming a constrained column is rejected."""
        from deltalake_poc_spark.tables.constraints import (
            CONSTRAINT_PREFIX, constraints_of,
        )

        snap = self.snapshot()
        if name in constraints_of(snap.properties):
            raise ValueError(f"constraint {name} already exists")
        bad = (self.read()
               .filter(F.expr(expr).cast("boolean").eqNullSafe(F.lit(False)))
               .limit(1).collect())
        if bad:
            raise ValueError(
                f"cannot add constraint {name}: existing row violates "
                f"{expr!r}: {bad[0].asDict()}")
        merged = dict(snap.properties)
        merged[f"{CONSTRAINT_PREFIX}{name}"] = expr
        c = Commit(
            version=self.log.next_version(),
            timestamp=self.log.monotonic_now_ms(),
            operation="ADD CONSTRAINT",
            operation_parameters={"name": name, "expr": expr},
            properties=merged,
        )
        # table_level: the validation probe read EVERY row, so the
        # read-set is the whole table — a concurrent blind append
        # could contain violating rows, and rebasing past it would
        # publish an already-violated constraint (Delta conflicts
        # metadata changes with all concurrent commits)
        return self._publish(c, snap, table_level=True)

    def drop_constraint(self, name: str) -> Commit:
        """ALTER TABLE DROP CONSTRAINT."""
        from deltalake_poc_spark.tables.constraints import CONSTRAINT_PREFIX

        snap = self.snapshot()
        key = f"{CONSTRAINT_PREFIX}{name}"
        if key not in snap.properties:
            raise ValueError(f"no such constraint: {name}")
        remaining = {k: v for k, v in snap.properties.items() if k != key}
        c = Commit(
            version=self.log.next_version(),
            timestamp=self.log.monotonic_now_ms(),
            operation="DROP CONSTRAINT",
            operation_parameters={"name": name},
            properties=remaining,
        )
        return self._publish(c, snap)

    def _stamped_fields(self, schema: StructType) -> list[StructField]:
        """Every field with an explicit physicalName (idempotent) — the
        lazy 'enable column mapping' step: existing data files already
        use the current logical names, so physical defaults to them."""
        out = []
        for f in schema.fields:
            md = dict(f.metadata or {})
            md.setdefault("physicalName", f.name)
            out.append(StructField(f.name, f.dataType, f.nullable, md))
        return out

    def rename_column(self, old: str, new: str) -> Commit:
        """ALTER TABLE RENAME COLUMN via column mapping (reference
        README.md:149-162): a metadata-only commit — the logical name
        changes, the physicalName keeps pointing at the existing
        parquet columns, NO data files are rewritten. Time travel to
        pre-rename versions resolves through those versions' own
        schemas, so old logical names keep working there."""
        snap = self.snapshot()
        schema = self.schema(snap)
        if schema is None:
            raise ValueError("table has no declared schema")
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(f"no such column: {old}")
        if new in names:
            raise ValueError(f"column already exists: {new}")
        if old in self.partition_columns(snap):
            raise ValueError("cannot rename a partition column")
        from deltalake_poc_spark.tables.constraints import constraints_of

        referenced = [n for n, e in constraints_of(snap.properties).items()
                      if re.search(rf"\b{re.escape(old)}\b", e)]
        if referenced:
            raise ValueError(
                f"cannot rename column {old}: referenced by "
                f"constraint(s) {referenced}; drop them first")
        fields = []
        for f in self._stamped_fields(schema):
            if f.name == old:
                f = StructField(new, f.dataType, f.nullable, f.metadata)
            fields.append(f)
        props = dict(snap.properties)
        props[self.COLUMN_MAPPING_PROP] = "name"
        # bloom columns are configured by LOGICAL name: follow the
        # rename so future files keep their blooms (already-written
        # files keep old-name keys — conservative no-prune, still
        # correct)
        if props.get(BLOOM_COLS_PROP):
            props[BLOOM_COLS_PROP] = ",".join(
                new if cc.strip() == old else cc.strip()
                for cc in str(props[BLOOM_COLS_PROP]).split(","))
        c = Commit(
            version=self.log.next_version(),
            timestamp=self.log.monotonic_now_ms(),
            operation="RENAME COLUMN",
            operation_parameters={"oldName": old, "newName": new},
            schema_json=StructType(fields).json(),
            properties=props,
        )
        return self._publish(c, snap)

    def drop_column(self, name: str) -> Commit:
        """ALTER TABLE DROP COLUMN via column mapping: metadata-only —
        the field leaves the logical schema; its physical data stays in
        the files (readers never select it) until files are naturally
        rewritten. Time travel before the drop still sees it."""
        snap = self.snapshot()
        schema = self.schema(snap)
        if schema is None:
            raise ValueError("table has no declared schema")
        if name not in [f.name for f in schema.fields]:
            raise ValueError(f"no such column: {name}")
        if name in self.partition_columns(snap):
            raise ValueError("cannot drop a partition column")
        fields = [f for f in self._stamped_fields(schema) if f.name != name]
        if not fields:
            raise ValueError("cannot drop the last column")
        props = dict(snap.properties)
        props[self.COLUMN_MAPPING_PROP] = "name"
        c = Commit(
            version=self.log.next_version(),
            timestamp=self.log.monotonic_now_ms(),
            operation="DROP COLUMN",
            operation_parameters={"name": name},
            schema_json=StructType(fields).json(),
            properties=props,
        )
        return self._publish(c, snap)

    # ----------------------------------------------------- merge and delete

    def merge(self, source: DataFrame, on: str | list[str]):
        """MERGE builder (J4/M1; reference: DeltaTable.merge
        spark_streaming.py:345-359, SQL MERGE spark_delta_handler.py:218-236)."""
        from deltalake_poc_spark.tables.merge import MergeBuilder

        return MergeBuilder(self, source, on)

    def delete(self, predicate) -> Commit:
        """DELETE by predicate (J5/M3; reference: delta_table.delete
        spark_streaming.py:385, SQL DELETE spark_delta_handler.py:160-169).

        One distributed pass finds the files containing matches
        (pushdown-friendly), then only those files are rewritten —
        unlike the reference's collect()-ids-to-driver approach
        (spark_streaming.py:367-389), nothing large hits the driver.
        """
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        snap = self.snapshot()
        if not snap.files:
            return self._noop_commit("DELETE", {"predicate": str(predicate)})
        cand = self._candidate_paths(snap, predicate)
        if not cand:
            return self._noop_commit("DELETE", {"predicate": str(predicate)})
        if str(snap.properties.get(DV_PROP, "false")).lower() == "true":
            return self._delete_dv(pred, str(predicate), snap, cand)
        df = self._read_files(cand, snap, with_position=True).drop("__pos")
        touched_rows = df.filter(pred)
        touched = [
            r["__file"] for r in
            touched_rows.select("__file").distinct().collect()
        ]
        if not touched:
            return self._noop_commit("DELETE", {"predicate": str(predicate)})
        rel_touched = [self._rel_of(p) for p in touched]
        schema = self.schema(snap)
        touched_df = self._plain_read(rel_touched, schema, dvs=snap.dvs)
        # SQL DELETE semantics: remove rows where pred IS TRUE; keep false/null
        keep = touched_df.filter(~F.coalesce(pred, F.lit(False)))
        staged_changes = None
        if self.cdf_enabled(snap):
            deleted = touched_df.filter(pred)
            staged_changes = self._stage_changes(
                deleted.withColumn("_change_type", F.lit("delete")))
        entries = self._materialize(
            keep, partition_by=self.partition_columns(snap) or None)
        touched_set = set(rel_touched)
        n_before = sum(e.num_records for e in snap.files if e.path in touched_set)
        n_after = sum(e.num_records for e in entries)
        c = Commit(
            version=snap.version + 1,
            timestamp=self.log.monotonic_now_ms(),
            operation="DELETE",
            operation_parameters={"predicate": str(predicate)},
            add=entries,
            remove=rel_touched,
            metrics={"numDeletedRows": n_before - n_after,
                     "numRemovedFiles": len(rel_touched),
                     "numAddedFiles": len(entries)},
            change_dir=staged_changes,
        )
        return self._publish(
            c, snap,
            cleanup_on_fail=(staged_changes,) if staged_changes else ())

    def _dv_sidecar_from(self, matches: DataFrame, snap: Snapshot
                         ) -> tuple[str | None, list[str], int, int]:
        """Build one consolidated DV sidecar from ``matches`` (a frame
        carrying ``__file``/``__pos``): the new (file, pos) rows plus
        every prior active DV row, written under a fresh unique dir.
        Returns (dv_rel, dv'd file list, total rows, prior rows);
        dv_files empty means nothing matched (caller no-ops and the
        empty sidecar is removed).

        File URIs map back to log-relative paths by BASENAME
        (uuid-unique within the table) joined against the snapshot's
        file list — _metadata.file_path is URL-encoded, so any
        prefix/substring arithmetic on the raw URI silently mismatches
        for roots containing spaces etc. The unique sidecar dir (not
        v=<planned>) keeps two racing DV writers from overwriting each
        other's staged sidecar."""
        base_map = self.spark.createDataFrame(
            [(p.rsplit("/", 1)[-1], p) for p in snap.file_paths],
            "__bname string, file string")
        new_rows = (
            matches.select(
                F.element_at(F.split(F.col("__file"), "/"), -1)
                .alias("__bname"),
                F.col("__pos").cast("long").alias("pos"))
            .join(F.broadcast(base_map), "__bname")
            .select("file", "pos"))
        prior_dirs = sorted(set(snap.dvs.values()))
        # tag provenance BEFORE the dedup so one cached frame serves
        # the sidecar write AND every stat the commit needs — the
        # historical shape re-read the written parquet twice and
        # re-scanned the prior dirs a second time for n_prior: 4 jobs
        # (plus 2 disk re-reads) where 2 suffice. A (file, pos) row
        # present in both new and prior has __p=1, so sum(__p) is
        # exactly |distinct(prior)| and count(*) is the consolidated
        # total — identical numbers, one pass.
        tagged = new_rows.withColumn("__p", F.lit(0))
        if prior_dirs:
            prior = (self.spark.read.schema("file string, pos long").parquet(
                        *[self.log.abs_path(d) for d in prior_dirs])
                     .filter(F.col("file").isin(list(snap.dvs)))
                     .select("file", F.col("pos").cast("long").alias("pos")))
            tagged = tagged.unionByName(prior.withColumn("__p", F.lit(1)))
        # stats ride the sidecar write via observe(): the write is the
        # single consumer of the dedup'd frame, so the historical
        # persist + separate stats-agg job (cache fill barrier + one
        # extra job per DV commit) collapse into the one write pass
        from pyspark.sql import Observation

        obs = Observation()
        dedup = (tagged.groupBy("file", "pos")
                 .agg(F.max("__p").alias("__p"))
                 .observe(obs,
                          F.count(F.lit(1)).alias("n"),
                          F.coalesce(F.sum("__p"), F.lit(0)).alias("np"),
                          F.collect_set("file").alias("fs")))
        dv_rel = f"{DV_DIR}/{uuid.uuid4().hex}"
        out_dir = self.log.abs_path(dv_rel)
        dedup.select("file", "pos").coalesce(1) \
            .write.mode("overwrite").parquet(out_dir)
        stats = obs.get
        dv_files = list(stats["fs"])
        if not dv_files:
            shutil.rmtree(out_dir, ignore_errors=True)
            return None, [], 0, 0
        return dv_rel, dv_files, int(stats["n"]), int(stats["np"])

    def _delete_dv(self, pred, pred_str: str, snap: Snapshot,
                   paths: list[str] | None = None) -> Commit:
        """DELETE via deletion vectors (Delta parity:
        delta.enableDeletionVectors): record the (file, row position)
        of every matching row in a sidecar parquet under ``_dv/v=N``
        instead of rewriting data files — deleting 1 row from a 1 GB
        file costs one tiny sidecar write, not a 1 GB rewrite. Readers
        anti-join the DV rows during the scan (broadcast-sized until
        purged); OPTIMIZE and purge_deletion_vectors() materialize.

        Each DV commit CONSOLIDATES: the new sidecar carries the fresh
        positions plus all prior active DV rows, and every DV'd file
        re-maps to it — one active DV dir at a time, no fragment chain
        for readers to union."""
        df = self._read_files(paths if paths is not None
                              else snap.file_paths, snap,
                              with_position=True)
        matches = df.filter(F.coalesce(pred, F.lit(False)))
        staged_changes = None
        if self.cdf_enabled(snap):
            staged_changes = self._stage_changes(
                matches.drop("__file", "__pos").withColumn(
                    "_change_type", F.lit("delete")))
        dv_rel, dv_files, n_total, n_prior = self._dv_sidecar_from(
            matches, snap)
        if not dv_files:
            if staged_changes:
                shutil.rmtree(self.log.abs_path(staged_changes),
                              ignore_errors=True)
            return self._noop_commit("DELETE", {"predicate": pred_str})
        c = Commit(
            version=snap.version + 1,
            timestamp=self.log.monotonic_now_ms(),
            operation="DELETE",
            operation_parameters={"predicate": pred_str,
                                  "deletionVectors": True},
            dv_updates={f: dv_rel for f in dv_files},
            metrics={"numDeletedRows": n_total - n_prior,
                     "numRemovedFiles": 0, "numAddedFiles": 0,
                     "numDeletionVectorRows": n_total},
            change_dir=staged_changes,
        )
        cleanup = (dv_rel,) + ((staged_changes,) if staged_changes else ())
        return self._publish(c, snap, cleanup_on_fail=cleanup)

    def purge_deletion_vectors(self, target_file_rows: int = 1_000_000) -> Commit:
        """REORG TABLE ... APPLY (PURGE) parity: rewrite every DV'd
        file without its deleted rows and drop the vectors. Run when
        DVs grow past broadcast size or before deltaexport (standard
        Delta's DV encoding is a different binary format)."""
        snap = self.snapshot()
        if not snap.dvs:
            return self._noop_commit("PURGE", {})
        rels = sorted(snap.dvs)
        live = self._read_files(rels, snap)
        total = sum(e.num_records for e in snap.files if e.path in snap.dvs)
        nparts = max(1, (total + target_file_rows - 1) // target_file_rows)
        entries = self._materialize(
            live.repartition(nparts),
            partition_by=self.partition_columns(snap) or None)
        c = Commit(
            version=self.log.next_version(),
            timestamp=self.log.monotonic_now_ms(),
            operation="PURGE",
            operation_parameters={"purgedFiles": len(rels)},
            add=entries,
            remove=rels,
            metrics={"numRemovedFiles": len(rels),
                     "numAddedFiles": len(entries)},
        )
        return self._publish(c, snap)

    def update(self, set_exprs: dict, predicate=None) -> Commit:
        """UPDATE (M2 analogue — the reference expresses conditional
        update through MERGE; provided for API completeness). With
        ``enableDeletionVectors``, matched rows are DV'd in place and
        their updated images append as new files — no rewrite of the
        untouched rows (Delta's DV-enabled UPDATE)."""
        pred = (F.expr(predicate) if isinstance(predicate, str) else predicate) \
            if predicate is not None else F.lit(True)
        snap = self.snapshot()
        if not snap.files:
            return self._noop_commit("UPDATE", {})
        cand = self._candidate_paths(snap, predicate) \
            if predicate is not None else snap.file_paths
        if not cand:
            return self._noop_commit("UPDATE", {})
        if str(snap.properties.get(DV_PROP, "false")).lower() == "true":
            return self._update_dv(set_exprs, pred, str(predicate), snap,
                                   cand)
        df = self._read_files(cand, snap, with_position=True).drop("__pos")
        touched = [r["__file"] for r in
                   df.filter(pred).select("__file").distinct().collect()]
        if not touched:
            return self._noop_commit("UPDATE", {})
        rel_touched = [self._rel_of(p) for p in touched]
        schema = self.schema(snap)
        touched_df = self._plain_read(rel_touched, schema, dvs=snap.dvs)
        cols = []
        for f in schema.fields:
            if f.name in set_exprs:
                expr = set_exprs[f.name]
                expr = F.expr(expr) if isinstance(expr, str) else expr
                cols.append(F.when(pred, expr).otherwise(F.col(f.name))
                            .cast(f.dataType).alias(f.name))
            else:
                cols.append(F.col(f.name))
        updated = touched_df.select(*cols)
        from deltalake_poc_spark.tables.constraints import enforce

        updated = enforce(updated, snap.properties, schema)
        staged_changes = None
        if self.cdf_enabled(snap):
            pre = touched_df.filter(pred).withColumn("_change_type",
                                                     F.lit("update_preimage"))
            post = updated.filter(pred).withColumn("_change_type",
                                                   F.lit("update_postimage"))
            staged_changes = self._stage_changes(pre.unionByName(post))
        entries = self._materialize(
            updated, partition_by=self.partition_columns(snap) or None)
        c = Commit(
            version=snap.version + 1,
            timestamp=self.log.monotonic_now_ms(),
            operation="UPDATE",
            operation_parameters={"predicate": str(predicate)},
            add=entries,
            remove=rel_touched,
            metrics={"numAddedFiles": len(entries),
                     "numRemovedFiles": len(rel_touched)},
            change_dir=staged_changes,
        )
        return self._publish(
            c, snap,
            cleanup_on_fail=(staged_changes,) if staged_changes else ())

    def _update_dv(self, set_exprs: dict, pred, pred_str: str,
                   snap: Snapshot, paths: list[str] | None = None) -> Commit:
        """UPDATE via deletion vectors: the matched rows' (file, pos)
        go into a consolidated sidecar (same mechanism as _delete_dv)
        and their post-images land as NEW appended files — updating 10
        rows in a 1 GB file costs a tiny sidecar plus a 10-row file,
        not a 1 GB rewrite. One commit: dv_updates + add, so readers
        atomically see old rows vanish and new images appear; OCC
        treats it like any DV-bearing commit (conflicts with rivals
        whose read set it invalidates)."""
        schema = self.schema(snap)
        df = self._read_files(paths if paths is not None
                              else snap.file_paths, snap,
                              with_position=True)
        # persisted: consumed by the sidecar write, the post-image
        # materialize, and (optionally) the CDF stage — the matched
        # set is the sparse-update case DVs exist for
        matches = df.filter(F.coalesce(pred, F.lit(False))).persist()
        try:
            if matches.limit(1).count() == 0:
                return self._noop_commit("UPDATE", {"predicate": pred_str})
            cols = []
            for f in schema.fields:
                if f.name in set_exprs:
                    expr = set_exprs[f.name]
                    expr = F.expr(expr) if isinstance(expr, str) else expr
                    cols.append(expr.cast(f.dataType).alias(f.name))
                else:
                    cols.append(F.col(f.name))
            updated = matches.select(*cols)
            from deltalake_poc_spark.tables.constraints import enforce

            updated = enforce(updated, snap.properties, schema)
            staged_changes = None
            if self.cdf_enabled(snap):
                pre = matches.drop("__file", "__pos").withColumn(
                    "_change_type", F.lit("update_preimage"))
                post = updated.withColumn(
                    "_change_type", F.lit("update_postimage"))
                staged_changes = self._stage_changes(pre.unionByName(post))
            dv_rel, dv_files, n_total, n_prior = self._dv_sidecar_from(
                matches, snap)
            if not dv_files:  # unreachable after the match probe; safety
                if staged_changes:
                    shutil.rmtree(self.log.abs_path(staged_changes),
                                  ignore_errors=True)
                return self._noop_commit("UPDATE", {"predicate": pred_str})
            entries = self._materialize(
                updated, partition_by=self.partition_columns(snap) or None)
            c = Commit(
                version=snap.version + 1,
                timestamp=self.log.monotonic_now_ms(),
                operation="UPDATE",
                operation_parameters={"predicate": pred_str,
                                      "deletionVectors": True},
                add=entries,
                dv_updates={f: dv_rel for f in dv_files},
                metrics={"numUpdatedRows": n_total - n_prior,
                         "numRemovedFiles": 0,
                         "numAddedFiles": len(entries),
                         "numDeletionVectorRows": n_total},
                change_dir=staged_changes,
            )
            cleanup = (dv_rel,) + ((staged_changes,)
                                   if staged_changes else ())
            return self._publish(c, snap, cleanup_on_fail=cleanup)
        finally:
            matches.unpersist()

    def _read_files_with_filename(self, snap: Snapshot) -> DataFrame:
        return self._read_files(snap.file_paths, snap,
                                with_position=True).drop("__pos")

    def _rel_of(self, abs_uri: str) -> str:
        import urllib.parse

        p = abs_uri
        if p.startswith("file:"):
            p = p[len("file:"):]
            while p.startswith("//"):
                p = p[1:]
            # _metadata.file_path is a URI: percent-decode so roots
            # with spaces etc. still resolve to real relative paths
            # (unquote, not unquote_plus — '+' is literal in paths)
            p = urllib.parse.unquote(p)
        root = os.path.abspath(self.log.root)
        return os.path.relpath(os.path.abspath(p), root)

    def _noop_commit(self, op: str, params: dict) -> Commit:
        # no data effects, so losing a version race just replans
        for _ in range(20):
            c = Commit(
                version=self.log.next_version(),
                timestamp=self.log.monotonic_now_ms(),
                operation=op,
                operation_parameters=params,
                metrics={"numDeletedRows": 0},
            )
            try:
                self.log.write_commit(c)
                return c
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"{self.log.root}: lost the no-op commit race 20 times")

    def _stage_changes(self, change_df: DataFrame) -> str:
        """Write CDF change files into a UNIQUE staging dir under
        _changes/ and return its rel path — the caller records it in
        the commit (Commit.change_dir). Unique naming (not v=<planned>)
        is load-bearing for OCC: two writers racing for one version
        would otherwise mode('overwrite') the same contested directory
        and the winner's committed change files could be the loser's."""
        # change files use PHYSICAL names too (like data files), so CDF
        # reads across later renames realign via the same mapping
        mapping = self.column_mapping() if self.log.exists() else {}
        nontrivial = {k: v for k, v in mapping.items() if k != v}
        if nontrivial:
            change_df = change_df.select(*[
                F.col(c).alias(nontrivial.get(c, c))
                for c in change_df.columns])
        rel = f"{TableLog.CHANGES_DIR}/{uuid.uuid4().hex}"
        change_df.write.mode("overwrite").parquet(self.log.abs_path(rel))
        return rel

    # ----------------------------------------------------------- maintenance

    def history(self) -> list[dict]:
        """M6 — DESCRIBE HISTORY (delta_handler.py:227-234, notebook 11/22/27)."""
        return [c.to_json() for c in reversed(self.log.commits())]

    def history_df(self) -> DataFrame:
        rows = [
            (c["version"], c["timestamp"], c["operation"],
             json.dumps(c["operationParameters"]), json.dumps(c["metrics"]))
            for c in self.history()
        ]
        return self.spark.createDataFrame(
            rows, "version long, timestamp long, operation string, "
                  "operationParameters string, operationMetrics string")

    def optimize(self, target_file_rows: int = 1_000_000,
                 zorder_by: list[str] | None = None,
                 partitions: dict[str, str] | None = None) -> Commit:
        """M5 — OPTIMIZE compaction (spark_delta_handler.py:282-289).
        Rewrites the current snapshot into ~target-sized files. With
        ``zorder_by``: Morton bit-interleaved clustering (tables/
        zorder.py) so per-file min/max stats prune on EVERY clustered
        column, not just the leading one — the Delta OPTIMIZE ZORDER
        equivalent. With ``partitions`` (column -> value), only files
        of matching partitions rewrite (Delta's OPTIMIZE ... WHERE) —
        at scale you compact the hot partition, not the table."""
        snap = self.snapshot()
        files = snap.files
        if partitions:
            pcols = self.partition_columns(snap)
            unknown = set(partitions) - set(pcols)
            if unknown:
                raise ValueError(
                    f"optimize partitions filter on non-partition cols: {unknown}")
            files = [e for e in files
                     if all(e.partition.get(k) == str(v)
                            for k, v in partitions.items())]
        if not files:
            return self._noop_commit("OPTIMIZE", {})
        df = self._read_files([e.path for e in files], snap)
        total = sum(e.num_records for e in files)
        nparts = max(1, (total + target_file_rows - 1) // target_file_rows)
        pb = self.partition_columns(snap) or None
        if zorder_by:
            from deltalake_poc_spark.tables.zorder import apply_zorder

            df = apply_zorder(df, zorder_by, nparts)
            entries = self._materialize(df, partition_by=pb)
        else:
            df = df.repartition(nparts)
            entries = self._materialize(df, partition_by=pb)
        c = Commit(
            version=self.log.next_version(),
            timestamp=self.log.monotonic_now_ms(),
            operation="OPTIMIZE",
            operation_parameters={"zorderBy": zorder_by or [],
                                  "partitions": partitions or {}},
            add=entries,
            remove=[e.path for e in files],
            metrics={"numRemovedFiles": len(files),
                     "numAddedFiles": len(entries)},
        )
        return self._publish(c, snap)

    def clone(self, new_root: str, version: int | None = None,
              timestamp_ms: int | None = None) -> "VersionedTable":
        """Zero-copy CLONE (Delta's shallow/cheap clone, done one
        better: hard links instead of absolute-path references, so the
        clone is self-contained and survives the source's deletion).
        The chosen snapshot's data files hard-link into the new root
        under the same relative paths — no data movement, O(files)
        metadata work — and a single v0 commit carries the schema,
        properties, partition layout, and per-file stats. Writes to
        either table diverge independently; VACUUM unlinks only its
        own directory entries (the shared inode lives until the last
        link is gone). CDF history does not carry over (the clone's
        change feed starts at its own v0), matching Delta clones."""
        snap = self.snapshot(version, timestamp_ms)
        new_log = TableLog(new_root)
        if new_log.exists():
            raise FileExistsError(f"table already exists at {new_root}")
        linked = copied = 0

        def _link_or_copy(src: str, dst: str) -> None:
            # hard link when possible; EXDEV/EPERM (cross-filesystem
            # destination, link-restricted mount) degrade to a copy
            # instead of failing the clone partway through
            nonlocal linked, copied
            try:
                os.link(src, dst)
                linked += 1
            except OSError:
                shutil.copy2(src, dst)
                copied += 1

        created_root = not os.path.isdir(new_root)
        try:
            os.makedirs(new_log.data_dir(), exist_ok=True)
            for fe in snap.files:
                src = self.log.abs_path(fe.path)
                dst = new_log.abs_path(fe.path)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                _link_or_copy(src, dst)
            for dv_rel in sorted(set(snap.dvs.values())):
                src_dir = self.log.abs_path(dv_rel)
                for dirpath, _dirs, files in os.walk(src_dir):
                    for name in files:
                        sp = os.path.join(dirpath, name)
                        rel = os.path.relpath(sp, self.log.root)
                        dp = new_log.abs_path(rel)
                        os.makedirs(os.path.dirname(dp), exist_ok=True)
                        _link_or_copy(sp, dp)
            new_log.write_commit(Commit(
                version=0,
                timestamp=new_log.monotonic_now_ms(),
                operation="CLONE",
                operation_parameters={"source": self.log.root,
                                      "sourceVersion": snap.version},
                add=list(snap.files),
                schema_json=snap.schema_json,
                properties=dict(snap.properties),
                dv_updates=dict(snap.dvs),
                metrics={"numCopiedFiles": copied,
                         "numLinkedFiles": linked},
            ))
        except BaseException:
            # never leave a half-built table (files but no v0 commit)
            if created_root:
                shutil.rmtree(new_root, ignore_errors=True)
            else:
                for sub in (TableLog.DATA_DIR, DV_DIR, TableLog.LOG_DIR):
                    shutil.rmtree(os.path.join(new_root, sub),
                                  ignore_errors=True)
            raise
        return VersionedTable(self.spark, new_root)

    def count_rows(self, snap: Snapshot | None = None) -> int:
        """Metadata-only COUNT(*): per-file numRecords from the commit
        log minus the cardinality of active deletion vectors — no data
        scan, no Spark job (Delta answers count(*) from stats the same
        way). The DV sidecars are tiny positional parquets, read
        driver-side with pyarrow; at 100 TB this is O(log) arithmetic
        against a full-corpus scan."""
        import pyarrow.parquet as pq_

        if snap is None:
            snap = self.snapshot()
        total = sum(e.num_records for e in snap.files)
        if snap.dvs:
            by_dir: dict[str, set] = {}
            for data_rel, dv_rel in snap.dvs.items():
                by_dir.setdefault(dv_rel, set()).add(data_rel)
            for dv_rel, data_files in by_dir.items():
                base = self.log.abs_path(dv_rel)
                for dirpath, _dirs, files in os.walk(base):
                    for name in files:
                        if not name.endswith(".parquet"):
                            continue
                        t = pq_.read_table(os.path.join(dirpath, name),
                                           columns=["file"])
                        col = t.column("file").to_pylist()
                        total -= sum(1 for f in col if f in data_files)
        return total

    def detail(self) -> dict:
        """DESCRIBE DETAIL parity: one metadata-only dict of table
        facts (format, location, version, file/byte counts, partition
        columns, properties, active deletion vectors, constraints)."""
        from deltalake_poc_spark.tables.constraints import constraints_of

        snap = self.snapshot()
        size = 0
        for e in snap.files:
            try:
                size += os.path.getsize(self.log.abs_path(e.path))
            except OSError:
                pass
        return {
            "format": "parquet+jsonlog",
            "location": self.log.root,
            "version": snap.version,
            "numFiles": len(snap.files),
            "sizeInBytes": size,
            "numRecords": sum(e.num_records for e in snap.files),
            "partitionColumns": self.partition_columns(snap),
            "properties": dict(snap.properties),
            "numDeletionVectors": len(snap.dvs),
            "constraints": constraints_of(snap.properties),
            "createdAt": self.log.read_commit(0).timestamp,
            "lastModified": snap.timestamp,
        }

    def vacuum(self, retention_hours: float = 168.0) -> list[str]:
        """M4 — VACUUM (delta_handler.py:275-285; default 168h retention
        shared/config.py:109). Physically deletes data files that are
        not in the current snapshot and were removed longer than the
        retention window ago, plus change-data-feed files of commits
        older than the retention (Delta's CDF files age out with vacuum
        the same way). Returns deleted relative paths."""
        import time as _time

        snap = self.snapshot()
        active = set(snap.file_paths)
        removed_at: dict[str, int] = {}
        commit_ts: dict[int, int] = {}
        # replay DV references so uuid-named sidecar dirs age from the
        # commit that last dropped them out of the active set (every
        # DV commit consolidates, so prior dirs fall out at the next
        # DV commit / purge / restore)
        dv_active: dict[str, str] = {}  # data file -> dv dir
        dv_removed_at: dict[str, int] = {}  # dv dir -> ts it went inactive
        dv_seen: set[str] = set()
        ever_added: set[str] = set()  # data files any commit referenced
        change_dir_version: dict[str, int] = {}  # change dir rel -> version
        for c in self.log.commits():
            commit_ts[c.version] = c.timestamp
            for r in c.remove:
                removed_at[r] = c.timestamp
                dv_active.pop(r, None)
            for a in c.add:  # re-added (e.g. RESTORE) -> no longer removed
                removed_at.pop(a.path, None)
                dv_active.pop(a.path, None)
                ever_added.add(a.path)
            for fp, dv in c.dv_updates.items():
                if dv is None:
                    dv_active.pop(fp, None)
                else:
                    dv_active[fp] = dv
                    dv_seen.add(dv)
            live_dirs = set(dv_active.values())
            for d in dv_seen - live_dirs:
                dv_removed_at.setdefault(d, c.timestamp)
            for d in live_dirs:
                dv_removed_at.pop(d, None)  # re-referenced (RESTORE)
            if c.change_dir:
                change_dir_version[c.change_dir] = c.version
        cutoff = int(_time.time() * 1000) - int(retention_hours * 3600 * 1000)

        def _orphan_expired(path: str) -> bool:
            # staged by a writer that lost its commit race and crashed
            # before cleanup: never referenced by any commit — age it
            # by filesystem mtime so an in-flight writer's fresh
            # staging is never swept
            try:
                return int(os.path.getmtime(path) * 1000) <= cutoff
            except OSError:
                return False
        deleted = []
        data_dir = self.log.data_dir()
        if os.path.isdir(data_dir):
            for dirpath, _dirs, files in os.walk(data_dir):
                for name in files:
                    abs_p = os.path.join(dirpath, name)
                    rel = os.path.relpath(abs_p, self.log.root)
                    if rel in active:
                        continue
                    ts = removed_at.get(rel)
                    # <=: a removal in the same millisecond as the
                    # cutoff is still "older than the retention window"
                    if ts is not None and ts <= cutoff:
                        os.unlink(abs_p)
                        deleted.append(rel)
                    elif ts is None and rel not in ever_added \
                            and _orphan_expired(abs_p):
                        # materialized by a writer whose commit lost a
                        # conflict: referenced by no commit, aged by
                        # mtime (an in-flight writer's fresh files
                        # always survive)
                        os.unlink(abs_p)
                        deleted.append(rel)
        dv_root = os.path.join(self.log.root, DV_DIR)
        if os.path.isdir(dv_root):
            referenced = set(snap.dvs.values())
            for name in os.listdir(dv_root):
                rel = f"{DV_DIR}/{name}"
                if rel in referenced:
                    continue
                if rel in dv_seen:
                    ts = dv_removed_at.get(rel)
                    expired = ts is not None and ts <= cutoff
                elif name.startswith("v="):  # legacy version-keyed dir
                    ts = commit_ts.get(int(name[2:]))
                    expired = ts is not None and ts <= cutoff
                else:  # orphaned staging from an aborted writer
                    expired = _orphan_expired(os.path.join(dv_root, name))
                if expired:
                    shutil.rmtree(os.path.join(dv_root, name),
                                  ignore_errors=True)
                    deleted.append(rel)
        # staging dirs abandoned by crashed writers (a crash between
        # the staging write and the commit leaves <root>/_staging/<id>
        # with full data files): age by mtime like the other orphans —
        # fresh dirs of in-flight writers are never swept
        staging_root = os.path.join(self.log.root, TableLog.STAGING_DIR)
        if os.path.isdir(staging_root):
            for name in os.listdir(staging_root):
                if _orphan_expired(os.path.join(staging_root, name)):
                    shutil.rmtree(os.path.join(staging_root, name),
                                  ignore_errors=True)
                    deleted.append(f"{TableLog.STAGING_DIR}/{name}")
            try:
                os.rmdir(staging_root)  # remove the parent if now empty
            except OSError:
                pass
        changes_root = os.path.join(self.log.root, TableLog.CHANGES_DIR)
        if os.path.isdir(changes_root):
            for name in os.listdir(changes_root):
                rel = f"{TableLog.CHANGES_DIR}/{name}"
                if name.startswith("v="):  # legacy version-keyed dir
                    v = int(name[2:])
                elif rel in change_dir_version:
                    v = change_dir_version[rel]
                else:  # orphaned staging from an aborted writer
                    if _orphan_expired(os.path.join(changes_root, name)):
                        shutil.rmtree(os.path.join(changes_root, name),
                                      ignore_errors=True)
                        deleted.append(rel)
                    continue
                ts = commit_ts.get(v)
                # keep the current version's changes regardless
                if ts is not None and ts <= cutoff and v < snap.version:
                    shutil.rmtree(os.path.join(changes_root, name),
                                  ignore_errors=True)
                    deleted.append(rel)
        return deleted

    def restore(self, version: int) -> Commit:
        """M7 — RESTORE TABLE TO VERSION AS OF (README.md:145)."""
        target = self.snapshot(version)
        current = self.snapshot()
        cur_paths = set(current.file_paths)
        tgt_paths = set(target.file_paths)
        # restore DVs too: files kept across the restore revert to the
        # target version's vector (or an explicit clear if it had none)
        dv_updates: dict = dict(target.dvs)
        for p_ in cur_paths & tgt_paths:
            if p_ in current.dvs and p_ not in target.dvs:
                dv_updates[p_] = None
        c = Commit(
            version=self.log.next_version(),
            timestamp=self.log.monotonic_now_ms(),
            operation="RESTORE",
            operation_parameters={"version": version},
            add=[f for f in target.files if f.path not in cur_paths],
            remove=[p for p in current.file_paths if p not in tgt_paths],
            schema_json=target.schema_json,
            dv_updates=dv_updates,
            metrics={"restoredVersion": version},
        )
        return self._publish(c, current, table_level=True)
