"""PostgreSQL logical-decoding (WAL) CDC source adapter.

The reference's CDC chain is postgres -> Debezium -> Kafka -> Spark
(consumer/spark-streaming/spark_streaming.py; S1/S14 in SURVEY.md §2).
This adapter taps the FIRST link directly: PostgreSQL's built-in
``test_decoding`` logical replication plugin (no Debezium/Kafka
process needed) and converts the decoded WAL lines into
Debezium-shaped Kafka messages, so the engine's existing parse
(:func:`deltalake_poc_spark.cdc.parse.parse_debezium`) and apply
(:class:`deltalake_poc_spark.cdc.CDCApplier`) path runs UNCHANGED —
real database commits flow into versioned snapshot tables end-to-end
(exercised against a live PostgreSQL 15 in
tests/test_live_postgres.py).

Deliberately driver-side Python: a replication slot is a SERIAL WAL
stream read by exactly one consumer — this module replaces the
out-of-process Debezium connector task, not a distributed operator.
Everything downstream of the message list (envelope parse, per-table
typing, key-dedup, MERGE) is the engine's JVM-side path, identical to
the Kafka route. Scale comes from the same place it does for
Debezium: per-table/per-slot parallelism upstream, Spark parallelism
downstream.

Field-level encoding matches the Debezium config the reference runs
("time.precision.mode": "connect", "decimal.handling.mode": "double";
database.py:20-27): timestamps become epoch-MICROSECOND longs, dates
become epoch-day ints, numerics become doubles.
"""

from __future__ import annotations

import datetime
import json
import re

_LINE_RE = re.compile(
    r"^table (?P<schema>[^.]+)\.(?P<table>[^:]+): "
    r"(?P<op>INSERT|UPDATE|DELETE): (?P<rest>.*)$")
# name[type]:value — name is a bare or double-quoted identifier (""
# escapes a quote), type may carry array brackets ("integer[]"), value
# is a single-quoted literal ('' escapes a quote) or a bare token
# (numbers, true/false, null, unchanged-toast-datum)
_COL_RE = re.compile(
    r"(?P<name>\w+|\"(?:[^\"]|\"\")*\")"
    r"\[(?P<type>[^\]]+(?:\[\])?)\]:"
    r"(?P<lit>'(?:[^']|'')*'|[^\s]+)")

_INT_TYPES = {"smallint", "integer", "bigint", "oid"}
_FLOAT_TYPES = {"real", "double precision", "numeric"}
_OPS = {"INSERT": "c", "UPDATE": "u", "DELETE": "d"}


_TZ_SUFFIX_RE = re.compile(r"(?P<sign>[+-])(?P<h>\d{2})(?::(?P<m>\d{2}))?"
                           r"(?::(?P<s>\d{2}))?$")


def _ts_micros(text: str) -> int:
    """'2024-01-01 10:00:00[.ffffff][+HH[:MM[:SS]]]' -> epoch µs.

    timestamptz output carries the session-TZ offset ('+00' under the
    fixture's pinned UTC, but any offset parses); plain timestamp has
    none and is taken as UTC (the fixture pins the session TZ)."""
    offset_us = 0
    m = _TZ_SUFFIX_RE.search(text)
    if m is not None:
        sign = -1 if m.group("sign") == "-" else 1
        offset_us = sign * 1_000_000 * (
            int(m.group("h")) * 3600 + int(m.group("m") or 0) * 60
            + int(m.group("s") or 0))
        text = text[:m.start()]
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
        try:
            dt = datetime.datetime.strptime(text, fmt)
            return int(dt.replace(
                tzinfo=datetime.timezone.utc).timestamp()
                * 1_000_000) - offset_us
        except ValueError:
            continue
    raise ValueError(f"unparseable timestamp {text!r}")


def _value(col_type: str, lit: str):
    """Decode one test_decoding literal into its Debezium JSON value.

    Parse-or-explicit-reject: the unchanged-TOAST marker raises (a
    row image holding it is NOT a full after-image — silently writing
    the sentinel string into a snapshot would corrupt the column;
    callers wanting TOAST support must use REPLICA IDENTITY FULL).
    Array (``integer[]``) and other untyped values pass through in
    their PostgreSQL text form, losslessly."""
    if lit == "null":
        return None
    if lit == "unchanged-toast-datum":
        raise ValueError(
            f"unchanged TOAST datum for {col_type} column: the row "
            f"image is incomplete (set REPLICA IDENTITY FULL upstream)")
    quoted = lit.startswith("'")
    text = lit[1:-1].replace("''", "'") if quoted else lit
    if col_type in _INT_TYPES:
        return int(text)
    if col_type in _FLOAT_TYPES:
        return float(text)
    if col_type == "boolean":
        return text == "true"
    if col_type.startswith("timestamp"):
        return _ts_micros(text)
    if col_type == "date":
        d = datetime.date.fromisoformat(text)
        return (d - datetime.date(1970, 1, 1)).days
    return text


def _scan_cols(segment: str, stop: str | None = None):
    """STRICT left-to-right column tokenizer: every non-space span
    must be a well-formed ``name[type]:value`` column (or the ``stop``
    marker) — anything else raises instead of silently dropping the
    column (a dropped column would corrupt the downstream MERGE row
    image). Quoted literals absorb spaces/markers, so a text value
    containing ``new-tuple:`` cannot derail an UPDATE split.

    Returns (cols, remainder-after-stop-marker | None).
    """
    out: dict = {}
    pos, n = 0, len(segment)
    while pos < n:
        if segment[pos] == " ":
            pos += 1
            continue
        if stop is not None and segment.startswith(stop, pos):
            return out, segment[pos + len(stop):]
        m = _COL_RE.match(segment, pos)
        if m is None:
            raise ValueError(
                f"undecodable test_decoding column at "
                f"{segment[pos:pos + 60]!r}")
        name = m.group("name")
        if name.startswith('"'):
            name = name[1:-1].replace('""', '"')
        out[name] = _value(m.group("type"), m.group("lit"))
        pos = m.end()
    return out, None


def _cols(segment: str) -> dict:
    return _scan_cols(segment)[0]


def parse_wal_line(line: str):
    """One decoded WAL data line -> (schema, table, op, before, after)
    or None for non-row lines (BEGIN/COMMIT/messages). Malformed row
    lines raise ValueError (explicit reject, never a silent drop or a
    mangled row image)."""
    m = _LINE_RE.match(line)
    if m is None:
        return None
    op = _OPS[m.group("op")]
    rest = m.group("rest")
    before = after = None
    if op == "c":
        after = _cols(rest)
    elif op == "d":
        # replica identity key (or the full row with REPLICA IDENTITY
        # FULL) — either way it is the BEFORE image
        before = _cols(rest)
    else:
        # UPDATE: "old-key: ... new-tuple: ..." only when the replica
        # identity changed (or FULL); otherwise just the new tuple
        if rest.startswith("old-key:"):
            before, after_part = _scan_cols(
                rest[len("old-key:"):], stop="new-tuple:")
            if after_part is None:
                raise ValueError(
                    f"UPDATE with old-key but no new-tuple: {line!r}")
            after = _cols(after_part)
        else:
            after = _cols(rest)
    return m.group("schema"), m.group("table"), op, before, after


def _lsn_int(lsn: str) -> int:
    hi, lo = lsn.split("/")
    return (int(hi, 16) << 32) | int(lo, 16)


def wal_to_kafka_messages(changes, source_name: str = "pgwal",
                          db: str = "postgres",
                          key_col: str = "id") -> list[dict]:
    """Convert ``pg_logical_slot_get_changes`` rows — (lsn, xid,
    data) — into the Kafka-record dicts ``parse_debezium`` consumes:
    {key, value, topic, partition, offset}. The LSN (a 64-bit WAL
    position, strictly increasing within the slot) becomes the Kafka
    offset, so the applier's latest-event-per-key ordering
    (source_lsn, offset) is the true commit order.

    An UPDATE that CHANGES the replica-identity key is split into a
    delete of the old key followed by an insert of the new key — the
    same two-event model Debezium emits for key changes — so the
    per-key MERGE downstream retires the old-key row instead of
    leaving it stale. (test_decoding surfaces the old key as the
    ``old-key:`` before-image exactly when it differs or REPLICA
    IDENTITY FULL is set.)"""
    out = []

    def emit(schema, table, op, before, after, lsn_i, xid):
        now_ms = lsn_i  # deterministic envelope ts; the engine keys
        # ordering off source.lsn + offset, never ts_ms
        payload = {
            "op": op,
            "ts_ms": now_ms,
            "before": before,
            "after": after,
            "source": {
                "version": "pgwal-1", "connector": "test_decoding",
                "name": source_name, "ts_ms": now_ms,
                "snapshot": "false", "db": db, "schema": schema,
                "table": table, "txId": int(xid), "lsn": lsn_i,
                "xmin": None,
            },
        }
        row = (before if op == "d" else after) or {}
        key = ({"payload": {key_col: row.get(key_col)}}
               if key_col in row else None)
        out.append({
            "key": (json.dumps(key).encode() if key is not None else None),
            "value": json.dumps({"payload": payload}).encode(),
            "topic": f"{source_name}.{schema}.{table}",
            "partition": 0,
            "offset": lsn_i,
        })

    for lsn, xid, data in changes:
        parsed = parse_wal_line(data)
        if parsed is None:
            continue  # BEGIN/COMMIT markers carry no row data
        schema, table, op, before, after = parsed
        lsn_i = _lsn_int(lsn) if isinstance(lsn, str) else int(lsn)
        if (op == "u" and before is not None and key_col in before
                and before.get(key_col) != (after or {}).get(key_col)):
            # key change: retire the old key, then create the new one
            # (both at this LSN; keys differ, so per-key ordering and
            # the applier's latest-per-key dedup are unharmed)
            emit(schema, table, "d", before, None, lsn_i, xid)
            emit(schema, table, "c", None, after, lsn_i, xid)
        else:
            emit(schema, table, op, before, after, lsn_i, xid)
    return out


def kafka_shape_df(spark, messages: list[dict]):
    """Materialize adapter messages with the exact column contract of
    ``spark.read.format('kafka')`` so parse_debezium is reused
    verbatim."""
    from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                                   StringType, StructField, StructType)

    schema = StructType([
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
    ])
    rows = [(m["key"], m["value"], m["topic"], m["partition"], m["offset"])
            for m in messages]
    return spark.createDataFrame(rows, schema)


def apply_wal_batch(spark, applier, changes, tables=None,
                    source_name: str = "pgwal", db: str = "postgres"):
    """One peeked WAL batch through the CDC applier, exactly-once.

    The continuous-follow protocol (mirrors Debezium's offset commit):
    PEEK the slot (``pg_logical_slot_peek_changes`` — non-destructive),
    apply here with the batch's max LSN as the batch id, and only then
    ADVANCE the slot (``pg_replication_slot_advance``) to that LSN. A
    crash between apply and advance re-peeks the same changes — the
    applier's batchId commit markers skip the already-appended audit
    batch, and the per-table MERGEs are idempotent by construction, so
    replays re-converge instead of double-applying (the same
    at-least-once-delivery / idempotent-sink contract as the Kafka
    path's checkpointed foreachBatch).

    Returns (metrics, upto_lsn_text) — ``upto_lsn_text`` is the LSN to
    advance the slot to, or None when the batch held no row changes.
    """
    msgs = wal_to_kafka_messages(changes, source_name=source_name, db=db)
    if not msgs:
        return {}, None
    from deltalake_poc_spark.cdc.parse import parse_debezium

    events = parse_debezium(kafka_shape_df(spark, msgs))
    upto_int = max(m["offset"] for m in msgs)
    upto_text = f"{upto_int >> 32:X}/{upto_int & 0xFFFFFFFF:X}"
    metrics = applier.apply_batch(events, tables=tables,
                                  batch_id=f"wal-{upto_text}")
    return metrics, upto_text
