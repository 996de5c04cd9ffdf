"""Read-only interop with the STANDARD Delta Lake protocol.

The engine's own ``VersionedTable`` uses a private commit log; but a
user migrating from the reference stack has real Delta tables on disk
(the reference ships committed ones under ``deltalake/*/_delta_log/``,
written by delta-spark — e.g. customers with a WRITE + MERGE history
and CDF files). This module replays the public Delta transaction-log
protocol (https://github.com/delta-io/delta/blob/master/PROTOCOL.md)
so those tables are readable — snapshot, time travel, history, and
change-data-feed — without the delta-spark package.

Scope and scale notes:

- Log replay (JSON actions + parquet checkpoint) is DRIVER-side, like
  every Delta client's metadata path: actions are per-FILE, ~hundreds
  of bytes each; a 100 TB table with 1 M files is ~100 MB of metadata,
  which is what checkpoints + ``_last_checkpoint`` keep bounded. Data
  reads stay fully distributed (``spark.read.parquet`` over the active
  file set, one scan per partition-value group).
- Supported: reader version 1 (basic) and 2 (column mapping by name or
  id). Reader version 3 tables are readable iff their reader features
  are a subset of {columnMapping, timestampNtz, vacuumProtocolCheck,
  deletionVectors, v2Checkpoint-absent}.
- Deletion vectors (readerVersion 3 tables, increasingly delta-spark's
  default for DELETE/UPDATE/MERGE): the ``deletionVector`` field of
  add actions is decoded driver-side (``tables/roaring.py`` — Z85 +
  portable RoaringBitmapArray + CRC-checked sidecar layout, all from
  the public protocol spec) and applied distributed as a broadcast
  anti-join of ``_metadata.row_index`` against the deleted positions —
  the same mechanism the engine's own private-log DVs use
  (tables/table.py:_read_files). The DV side is metadata-sized
  (deleted positions per file, bounded by purge/OPTIMIZE policy), so
  the data scan stays one distributed pass.
"""

from __future__ import annotations

import json
import os
import urllib.parse
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from . import roaring

LOG_DIR = "_delta_log"

# reader-version-3 table features this replayer actually implements
_SUPPORTED_READER_FEATURES = {"columnMapping", "timestampNtz",
                              "vacuumProtocolCheck", "deletionVectors"}


@dataclass
class DeltaSnapshot:
    version: int
    schema: StructType
    partition_columns: list[str]
    configuration: dict[str, str]
    min_reader_version: int
    reader_features: set[str]
    # path -> partitionValues (string map, per the protocol)
    files: dict[str, dict[str, str]] = field(default_factory=dict)
    # path -> deletionVector descriptor dict (only files that have one)
    dvs: dict[str, dict] = field(default_factory=dict)
    # path -> {column: [min, max]} parsed from the add action's stats
    # (keys are PHYSICAL names under column mapping, like the protocol)
    stats: dict[str, dict] = field(default_factory=dict)

    @property
    def column_mapping_mode(self) -> str:
        return self.configuration.get("delta.columnMapping.mode", "none")


def _parse_add_stats(raw) -> dict:
    """{col: [min, max]} from an add action's ``stats`` JSON string
    (top-level scalar columns only; nested structs and missing bounds
    simply contribute no skipping)."""
    if not raw:
        return {}
    try:
        d = json.loads(raw) if isinstance(raw, str) else dict(raw)
    except (ValueError, TypeError):
        return {}
    mins = d.get("minValues") or {}
    maxs = d.get("maxValues") or {}
    out = {}
    for col, lo in mins.items():
        hi = maxs.get(col)
        if lo is None or hi is None or isinstance(lo, dict) \
                or isinstance(hi, dict):
            continue
        out[col] = [lo, hi]
    return out


class DeltaLakeReader:
    """Replays ``_delta_log`` and reads standard Delta tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.log_dir = os.path.join(root, LOG_DIR)
        if not os.path.isdir(self.log_dir):
            raise FileNotFoundError(f"not a Delta table (no {LOG_DIR}): {root}")

    # ------------------------------------------------------------- log scan

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".json") and name[:-5].isdigit():
                out.append(int(name[:-5]))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        ck = self._last_checkpoint()
        if not vs and ck is None:
            raise FileNotFoundError(f"empty Delta log: {self.log_dir}")
        return max(vs) if vs else ck["version"]

    def _last_checkpoint(self) -> dict | None:
        p = os.path.join(self.log_dir, "_last_checkpoint")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _commit_file(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.json")

    def _commit_actions(self, version: int) -> list[dict]:
        with open(self._commit_file(version)) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _commit_timestamp_ms(self, version: int) -> int:
        """commitInfo.timestamp when present, else log-file mtime —
        the same fallback order delta-spark uses for time travel."""
        for a in self._commit_actions(version):
            if "commitInfo" in a and "timestamp" in a["commitInfo"]:
                return int(a["commitInfo"]["timestamp"])
        return int(os.path.getmtime(self._commit_file(version)) * 1000)

    def _checkpoint_actions(self, ck: dict) -> list[dict]:
        """Checkpoint parquet rows -> action dicts (add/remove/metaData/
        protocol columns, one non-null per row)."""
        import pyarrow.parquet as pq

        v = ck["version"]
        if ck.get("parts"):
            paths = [
                os.path.join(
                    self.log_dir,
                    f"{v:020d}.checkpoint.{i + 1:010d}.{ck['parts']:010d}.parquet")
                for i in range(ck["parts"])
            ]
        else:
            paths = [os.path.join(self.log_dir, f"{v:020d}.checkpoint.parquet")]
        actions: list[dict] = []
        for p in paths:
            for row in pq.read_table(p).to_pylist():
                for kind in ("metaData", "protocol", "add", "remove"):
                    if row.get(kind) is not None:
                        actions.append({kind: row[kind]})
        return actions

    # ------------------------------------------------------------- snapshot

    def snapshot(self, version: int | None = None,
                 timestamp_ms: int | None = None) -> DeltaSnapshot:
        if version is not None and timestamp_ms is not None:
            raise ValueError("pass version OR timestamp, not both")
        if timestamp_ms is not None:
            eligible = [v for v in self.versions()
                        if self._commit_timestamp_ms(v) <= timestamp_ms]
            if not eligible:
                raise ValueError(
                    f"no commit at or before timestamp {timestamp_ms}")
            version = max(eligible)
        target = self.latest_version() if version is None else version

        ck = self._last_checkpoint()
        start = 0
        actions: list[dict] = []
        if ck is not None and ck["version"] <= target:
            actions.extend(self._checkpoint_actions(ck))
            start = ck["version"] + 1
        for v in range(start, target + 1):
            if not os.path.exists(self._commit_file(v)):
                raise FileNotFoundError(
                    f"missing Delta log version {v} (vacuumed?): {self.root}")
            actions.extend(self._commit_actions(v))

        schema = None
        part_cols: list[str] = []
        conf: dict[str, str] = {}
        min_reader = 1
        reader_features: set[str] = set()
        # Action reconciliation is keyed by (path, DV uniqueId), NOT by
        # path alone (PROTOCOL.md "Action Reconciliation"): a DV update
        # commits remove(path, oldDV) + add(path, newDV) atomically, and
        # the remove must only tombstone the OLD incarnation even when
        # it follows the add within the same commit file.
        entries: dict[tuple[str, str | None],
                      tuple[dict, dict | None, dict]] = {}

        def _norm_dv(dv: dict | None) -> dict | None:
            # checkpoint parquet rows materialize an absent descriptor
            # as a struct of all-None fields — treat that as no DV
            return dv if dv and dv.get("storageType") else None

        def _dv_uid(dv: dict | None) -> str | None:
            if not dv:
                return None
            return (f"{dv['storageType']}{dv['pathOrInlineDv']}"
                    f"@{dv.get('offset') or 0}")

        for a in actions:
            if "metaData" in a:
                md = a["metaData"]
                schema = StructType.fromJson(json.loads(md["schemaString"]))
                part_cols = list(md.get("partitionColumns") or [])
                conf = dict(md.get("configuration") or {})
            elif "protocol" in a:
                p = a["protocol"]
                min_reader = int(p.get("minReaderVersion", 1))
                reader_features = set(p.get("readerFeatures") or [])
            elif "add" in a:
                ad = a["add"]
                dv = _norm_dv(ad.get("deletionVector"))
                entries[(ad["path"], _dv_uid(dv))] = (
                    dict(ad.get("partitionValues") or {}), dv,
                    _parse_add_stats(ad.get("stats")))
            elif "remove" in a:
                rm = a["remove"]
                entries.pop(
                    (rm["path"], _dv_uid(_norm_dv(rm.get("deletionVector")))),
                    None)
        files: dict[str, dict[str, str]] = {}
        dvs: dict[str, dict] = {}
        stats: dict[str, dict] = {}
        for (path, _uid), (pvals, dv, st) in entries.items():
            files[path] = pvals
            if st:
                stats[path] = st
            if dv:
                dvs[path] = dv
            else:
                dvs.pop(path, None)
        if schema is None:
            raise ValueError(f"Delta log has no metaData action: {self.root}")
        unsupported = reader_features - _SUPPORTED_READER_FEATURES
        if min_reader > 3 or (min_reader == 3 and unsupported):
            raise NotImplementedError(
                f"unsupported Delta reader requirement: version {min_reader}, "
                f"features {sorted(unsupported)}")
        return DeltaSnapshot(target, schema, part_cols, conf,
                             min_reader, reader_features, files, dvs, stats)

    def history(self) -> list[dict]:
        """commitInfo per version, newest first (M6 parity for foreign
        Delta tables)."""
        out = []
        for v in sorted(self.versions(), reverse=True):
            info = {}
            for a in self._commit_actions(v):
                if "commitInfo" in a:
                    info = a["commitInfo"]
                    break
            out.append({"version": v, **info})
        return out

    # ----------------------------------------------------------------- read

    def _physical_fields(self, snap: DeltaSnapshot) -> list[tuple[str, str]]:
        """(logical, physical) names honoring column mapping. With
        mapping by name/id the parquet files store physical names from
        field metadata (delta.columnMapping.physicalName)."""
        pairs = []
        for f_ in snap.schema.fields:
            md = f_.metadata or {}
            phys = (md.get("delta.columnMapping.physicalName", f_.name)
                    if snap.column_mapping_mode in ("name", "id") else f_.name)
            pairs.append((f_.name, phys))
        return pairs

    def read(self, version: int | None = None,
             timestamp_ms: int | None = None,
             where: str | None = None) -> DataFrame:
        """Snapshot read (optionally time-traveled): distributed parquet
        scan of the active file set; partition values come from the log
        and are attached as typed literal columns per partition group;
        files carrying a deletion vector have their deleted row indexes
        anti-joined out.

        ``where`` enables protocol data skipping on MIGRATED tables:
        the add actions' stats (minValues/maxValues, written by
        delta-spark and friends) and partitionValues prune files for
        the provable conjuncts, then the full predicate filters the
        surviving rows — same contract as VersionedTable.read(where=).
        Predicate columns are logical names; under column mapping they
        translate to the physical stats keys."""
        snap = self.snapshot(version, timestamp_ms)
        files = snap.files
        if where is not None:
            from .stats import (file_may_match, parse_skipping_predicates,
                                partition_may_match)

            preds = parse_skipping_predicates(where)
            phys = dict(self._physical_fields(snap))
            preds = [(phys.get(c, c), op, v) for c, op, v in preds]
            if preds:
                files = {
                    p: pv for p, pv in files.items()
                    if partition_may_match(pv, preds)
                    and file_may_match(snap.stats.get(p, {}), preds)
                }
        dv_sub = {p: d for p, d in snap.dvs.items() if p in files}
        total_card = sum(int(d.get("cardinality", 0)) for d in dv_sub.values())
        if dv_sub and total_card > self.dv_driver_positions_max:
            # pervasive DVs: O(deleted rows) positions neither decode
            # on the driver nor broadcast — descriptors (O(files))
            # ship to executors, decode distributed, and the anti-join
            # strategy is left to the planner (guide §3/§5)
            out = self._read_files(snap, files, drop_descriptors=dv_sub)
        else:
            out = self._read_files(
                snap, files, drop_positions=self._dv_positions(dv_sub))
        return out.filter(where) if where is not None else out

    # above this many total deleted positions (descriptor cardinality,
    # known without decoding) the read switches from driver-decoded
    # broadcast position frames to executor-side sidecar decode + a
    # planner-chosen join: a 100 TB table with pervasive DVs has
    # O(deleted rows) positions, which must not hit driver memory or a
    # broadcast. 4M positions ~= 64 MB as (file, pos) pairs.
    dv_driver_positions_max: int = 4_000_000

    def _dv_positions(self, dvs: dict[str, dict]) -> dict[str, list[int]]:
        """Decode each file's DV descriptor to its deleted row indexes
        (driver-side metadata work, like every Delta client)."""
        return {path: roaring.read_descriptor(self.root, d)
                for path, d in dvs.items()}

    def _descriptor_pairs_df(self, dvs: dict[str, dict]) -> DataFrame:
        """(file basename, deleted row index) pairs decoded ON THE
        EXECUTORS: the driver ships only the descriptor dicts
        (O(files), ~hundreds of bytes each); each task reads its
        sidecar bytes / inline payload and explodes to positions.
        This is the scale regime of DV application — the pair count
        is O(deleted rows) and never exists driver-side."""
        import json as _json

        root = self.root
        rows = [(os.path.basename(urllib.parse.unquote(p)), _json.dumps(d))
                for p, d in dvs.items()]
        par = max(1, min(len(rows),
                         self.spark.sparkContext.defaultParallelism))
        desc = self.spark.createDataFrame(
            rows, "__dvf string, __desc string").repartition(par)

        def _decode(batches):
            import pandas as pd

            from deltalake_poc_spark.tables import roaring as _r
            for pdf in batches:
                for f, dj in zip(pdf["__dvf"], pdf["__desc"]):
                    pos = _r.read_descriptor(root, _json.loads(dj))
                    yield pd.DataFrame(
                        {"__dvf": pd.Series([f] * len(pos), dtype="object"),
                         "__dvp": pd.Series(pos, dtype="int64")})

        return desc.mapInPandas(_decode, "__dvf string, __dvp long")

    def _data_path(self, rel: str, subdir: str = "") -> str:
        """Log ``path`` fields are URL-encoded per the protocol."""
        return os.path.join(self.root, subdir, urllib.parse.unquote(rel))

    @staticmethod
    def _basename_col(col):
        return F.element_at(F.split(col, "/"), -1)

    def _positions_df(self, positions: dict[str, list[int]]) -> DataFrame:
        """(file basename, row index) pairs for the join side of DV
        filtering. Basenames are unique within a table (uuid-named part
        files) and, unlike full ``_metadata.file_path`` URIs, carry no
        URL-encodable characters. The pair count is the deleted-row
        count of the touched files — metadata-sized, so AQE broadcasts
        it and the data scan stays a single pass."""
        rows = [(os.path.basename(urllib.parse.unquote(p)), int(i))
                for p, idxs in positions.items() for i in idxs]
        return self.spark.createDataFrame(
            rows, "__dvf string, __dvp long")

    def _read_files(self, snap: DeltaSnapshot,
                    files: dict[str, dict[str, str]],
                    subdir: str = "",
                    drop_positions: dict[str, list[int]] | None = None,
                    keep_positions: dict[str, list[int]] | None = None,
                    drop_descriptors: dict[str, dict] | None = None,
                    ) -> DataFrame:
        """``drop_positions``: per-file row indexes to EXCLUDE (deletion
        vectors). ``keep_positions``: per-file row indexes to KEEP
        (CDF replay of a DV delta). ``drop_descriptors``: per-file DV
        DESCRIPTORS to exclude — decoded on the executors for tables
        whose total DV cardinality is too large for driver decode +
        broadcast. All keyed by log-relative path."""
        fields = self._physical_fields(snap)
        types = {f_.name: f_.dataType for f_ in snap.schema.fields}
        if not files:
            return self.spark.createDataFrame([], snap.schema)
        drop_positions = {p: v for p, v in (drop_positions or {}).items()
                          if p in files and v}
        drop_descriptors = {p: d for p, d in (drop_descriptors or {}).items()
                            if p in files}
        keep_positions = ({p: v for p, v in keep_positions.items()
                           if p in files}
                          if keep_positions is not None else None)
        with_pos = (bool(drop_positions) or bool(drop_descriptors)
                    or keep_positions is not None)
        # group by partition values: each group is one distributed scan
        # with its literal partition columns; groups then union (at
        # scale the group count is the partition count, not file count)
        groups: dict[tuple, list[str]] = {}
        for path, pvals in files.items():
            key = tuple(pvals.get(c) for c in snap.partition_columns)
            groups.setdefault(key, []).append(self._data_path(path, subdir))
        # explicit PHYSICAL read schema (non-partition fields): no
        # schema-inference footer job per partition group — the log
        # already declares the schema, and files missing a column
        # (add-only evolution) read it as null natively
        from pyspark.sql.types import StructField as _SF
        from pyspark.sql.types import StructType as _ST
        read_schema = _ST([
            _SF(phys, types[logical], True)
            for logical, phys in fields
            if logical not in snap.partition_columns])
        parts = []
        for key, paths in sorted(groups.items()):
            df = self.spark.read.schema(read_schema).parquet(*paths)
            present = set(df.columns)
            cols = []
            for logical, phys in fields:
                if logical in snap.partition_columns:
                    val = key[snap.partition_columns.index(logical)]
                    cols.append(F.lit(val).cast(types[logical]).alias(logical))
                elif phys in present:
                    cols.append(F.col(phys).cast(types[logical]).alias(logical))
                else:
                    cols.append(F.lit(None).cast(types[logical]).alias(logical))
            if with_pos:
                cols.append(self._basename_col(
                    F.col("_metadata.file_path")).alias("__dvfile"))
                cols.append(F.col("_metadata.row_index").alias("__dvpos"))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if with_pos:
            # broadcast the position frames: they are createDataFrame
            # products of driver-decoded roaring bitmaps — bounded by
            # construction (they already fit on the driver) — but
            # Catalyst has no size estimate for local relations and
            # planned SortMergeJoins, shuffling and sorting the DATA
            # table by (file, pos) just to drop a handful of rows
            # (delta_dv_read: 10 SMJs -> broadcast hash joins).
            if keep_positions is not None:
                pairs = self._positions_df(keep_positions)
                out = out.join(
                    F.broadcast(pairs),
                    (F.col("__dvfile") == F.col("__dvf"))
                    & (F.col("__dvpos") == F.col("__dvp")), "left_semi")
            if drop_positions:
                pairs = self._positions_df(drop_positions)
                out = out.join(
                    F.broadcast(pairs),
                    (F.col("__dvfile") == F.col("__dvf"))
                    & (F.col("__dvpos") == F.col("__dvp")), "left_anti")
            if drop_descriptors:
                # executor-decoded pairs: O(deleted rows) — NO
                # broadcast hint; the planner picks the join from
                # measured sizes (SMJ/shuffled-hash once it is big)
                pairs = self._descriptor_pairs_df(drop_descriptors)
                out = out.join(
                    pairs,
                    (F.col("__dvfile") == F.col("__dvf"))
                    & (F.col("__dvpos") == F.col("__dvp")), "left_anti")
            out = out.drop("__dvfile", "__dvpos")
        return out

    # ------------------------------------------------------------------ CDF

    def read_change_feed(self, starting_version: int = 0,
                         ending_version: int | None = None) -> DataFrame:
        """Delta CDF semantics: commits carrying ``cdc`` actions emit
        exactly those files (they already contain _change_type).
        Otherwise the change set is derived from add/remove actions,
        deletion-vector aware:

        - a dataChange add of a NEW file emits its live rows (minus its
          DV, if born with one) as inserts;
        - a dataChange add that RE-adds a path active in the previous
          snapshot is a DV update (the data file itself is immutable):
          rows at ``new DV minus old DV`` positions are deletes, rows at
          ``old DV minus new DV`` are re-inserts (restores);
        - a dataChange remove of a path NOT re-added in the same commit
          emits the file's surviving rows (minus its old DV) as deletes;
          removes of re-added paths are part of the DV update above.
        """
        end = self.latest_version() if ending_version is None else ending_version
        frames = []
        prev_snap: DeltaSnapshot | None = None
        for v in range(starting_version, end + 1):
            if not os.path.exists(self._commit_file(v)):
                continue
            snap_v = self.snapshot(v)
            actions = self._commit_actions(v)
            ts = self._commit_timestamp_ms(v)
            cdc_files = {a["cdc"]["path"]: dict(a["cdc"].get("partitionValues")
                                                or {})
                         for a in actions if "cdc" in a}
            if cdc_files:
                # cdc parquet carries _change_type alongside the data
                # columns, so read it directly (not via _read_files,
                # which projects exactly the declared schema); explicit
                # schema skips the footer-inference job (same rule as
                # _read_files)
                from pyspark.sql.types import StringType as _St
                from pyspark.sql.types import StructField as _SF
                from pyspark.sql.types import StructType as _ST
                paths = [self._data_path(p) for p in cdc_files]
                phys = dict(self._physical_fields(snap_v))
                raw = self.spark.read.schema(_ST(
                    [_SF(phys[f_.name], f_.dataType, True)
                     for f_ in snap_v.schema.fields
                     if f_.name not in snap_v.partition_columns]
                    + [_SF("_change_type", _St(), True)])).parquet(*paths)
                cols = [F.col(phys[f_.name]).cast(f_.dataType).alias(f_.name)
                        for f_ in snap_v.schema.fields
                        if phys[f_.name] in raw.columns]
                df = raw.select(*cols, F.col("_change_type"))
            else:
                if prev_snap is None and v > 0:
                    prev_snap = self.snapshot(v - 1)
                prev_files = prev_snap.files if prev_snap else {}
                prev_dvs = prev_snap.dvs if prev_snap else {}
                adds = {a["add"]["path"]:
                        (dict(a["add"].get("partitionValues") or {}),
                         a["add"].get("deletionVector"))
                        for a in actions
                        if "add" in a and a["add"].get("dataChange", True)}
                rems = {a["remove"]["path"]:
                        dict(a["remove"].get("partitionValues") or {})
                        for a in actions
                        if "remove" in a
                        and a["remove"].get("dataChange", True)}
                new_files: dict[str, dict[str, str]] = {}
                new_file_dvs: dict[str, dict] = {}
                del_rows: dict[str, list[int]] = {}   # DV-update deletes
                ins_rows: dict[str, list[int]] = {}   # DV-update restores
                upd_pvals: dict[str, dict[str, str]] = {}
                for path, (pvals, dv) in adds.items():
                    if path in prev_files:
                        old = set(roaring.read_descriptor(self.root,
                                                          prev_dvs[path])
                                  if path in prev_dvs else [])
                        new = set(roaring.read_descriptor(self.root, dv)
                                  if dv else [])
                        if new - old:
                            del_rows[path] = sorted(new - old)
                        if old - new:
                            ins_rows[path] = sorted(old - new)
                        upd_pvals[path] = pvals
                    else:
                        new_files[path] = pvals
                        if dv:
                            new_file_dvs[path] = dv
                full_rems = {p: pv for p, pv in rems.items() if p not in adds}
                subs = []
                if new_files:
                    subs.append(self._read_files(
                        snap_v, new_files,
                        drop_positions=self._dv_positions(new_file_dvs),
                    ).withColumn("_change_type", F.lit("insert")))
                if del_rows:
                    subs.append(self._read_files(
                        snap_v, {p: upd_pvals[p] for p in del_rows},
                        keep_positions=del_rows,
                    ).withColumn("_change_type", F.lit("delete")))
                if ins_rows:
                    subs.append(self._read_files(
                        snap_v, {p: upd_pvals[p] for p in ins_rows},
                        keep_positions=ins_rows,
                    ).withColumn("_change_type", F.lit("insert")))
                if full_rems:
                    subs.append(self._read_files(
                        snap_v, full_rems,
                        drop_positions={
                            p: roaring.read_descriptor(self.root,
                                                       prev_dvs[p])
                            for p in full_rems if p in prev_dvs},
                    ).withColumn("_change_type", F.lit("delete")))
                if not subs:
                    prev_snap = snap_v
                    continue
                df = subs[0]
                for s in subs[1:]:
                    df = df.unionByName(s)
            prev_snap = snap_v
            frames.append(
                df.withColumn("_commit_version", F.lit(v).cast("long"))
                .withColumn("_commit_timestamp",
                            F.timestamp_millis(F.lit(ts))))
        if not frames:
            raise ValueError(
                f"no change data between versions {starting_version}..{end}")
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out
