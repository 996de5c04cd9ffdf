"""Property tests for the WAL (test_decoding) line decoder.

cdc/pgwal.py carries live-database trust: every decoded value lands
in a snapshot table through the engine's Debezium-shaped envelope
path (reference contract: /root/reference/shared/models.py:42-88).
These tests fuzz generated test_decoding lines — quoted quotes,
whitespace and marker strings inside literals, nulls, quoted
identifiers, array/bytea types, timestamptz offsets, unchanged-TOAST
markers, multi-statement transactions — and assert the decoder
either parses to exactly the planted row image or rejects with
ValueError. Never a silent drop and never a mangled value.
"""

from __future__ import annotations

import datetime
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deltalake_poc_spark.cdc.pgwal import parse_wal_line, wal_to_kafka_messages

# -- value strategies, paired with their test_decoding rendering --------


def _q(text: str) -> str:
    return "'" + text.replace("'", "''") + "'"


_TEXT = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\n\r"),
    max_size=40)

_COLS = st.sampled_from([
    # (type, value-strategy, renderer, expected-decoder)
    ("bigint", st.integers(-2**62, 2**62), str, int),
    ("integer", st.integers(-2**31, 2**31 - 1), str, int),
    ("double precision", st.floats(allow_nan=False, allow_infinity=False,
                                   width=64), repr, float),
    ("numeric", st.decimals(allow_nan=False, allow_infinity=False,
                            places=4).map(str),
     _q, float),
    ("boolean", st.booleans(), lambda b: "true" if b else "false",
     lambda b: b),
    ("text", _TEXT, _q, lambda s: s),
    ("date", st.dates(datetime.date(1970, 1, 2), datetime.date(2200, 1, 1)),
     lambda d: _q(d.isoformat()),
     lambda d: (d - datetime.date(1970, 1, 1)).days),
    ("integer[]", st.lists(st.integers(-99, 99), max_size=4).map(
        lambda xs: "{" + ",".join(map(str, xs)) + "}"),
     _q, lambda s: s),  # arrays pass through in PG text form
    ("bytea", st.binary(max_size=12).map(lambda b: "\\x" + b.hex()),
     _q, lambda s: s),
])

_NAME = st.one_of(
    st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True),
    _TEXT.filter(lambda s: '"' not in s and s.strip()).map(
        lambda s: '"' + s + '"'),
)


@st.composite
def _row(draw, min_cols=1):
    names = draw(st.lists(_NAME, min_size=min_cols, max_size=5,
                          unique_by=lambda n: n.strip('"')))
    cols = []
    for n in names:
        typ, vstrat, render, expect = draw(_COLS)
        is_null = draw(st.booleans()) and draw(st.booleans())
        if is_null:
            cols.append((n, typ, "null", None))
        else:
            v = draw(vstrat)
            cols.append((n, typ, render(v), expect(v)))
    return cols


def _segment(cols) -> str:
    return " ".join(f"{n}[{t}]:{lit}" for n, t, lit, _ in cols)


def _expected(cols) -> dict:
    return {n.strip('"').replace('""', '"'): exp for n, _, _, exp in cols}


@settings(max_examples=200, deadline=None)
@given(_row())
def test_insert_roundtrip(cols):
    line = f"table public.t1: INSERT: {_segment(cols)}"
    parsed = parse_wal_line(line)
    assert parsed is not None
    sch, tbl, op, before, after = parsed
    assert (sch, tbl, op, before) == ("public", "t1", "c", None)
    assert after == _expected(cols)


@settings(max_examples=200, deadline=None)
@given(_row(), _row())
def test_update_with_old_key_roundtrip(key_cols, new_cols):
    """The old-key/new-tuple split must survive literals that CONTAIN
    the marker strings — the quoted-literal scan absorbs them."""
    line = (f"table public.t1: UPDATE: old-key: {_segment(key_cols)} "
            f"new-tuple: {_segment(new_cols)}")
    parsed = parse_wal_line(line)
    assert parsed is not None
    _, _, op, before, after = parsed
    assert op == "u"
    assert before == _expected(key_cols)
    assert after == _expected(new_cols)


@settings(max_examples=100, deadline=None)
@given(_row())
def test_delete_roundtrip(cols):
    parsed = parse_wal_line(f"table public.t1: DELETE: {_segment(cols)}")
    _, _, op, before, after = parsed
    assert op == "d" and after is None
    assert before == _expected(cols)


def test_marker_strings_inside_literals():
    """Adversarial literals that LOOK like protocol markers stay plain
    data (the regex consumes quoted literals atomically)."""
    line = ("table public.t: UPDATE: old-key: id[bigint]:1 "
            "note[text]:'x new-tuple: y[bigint]:2 old-key: z' "
            "new-tuple: id[bigint]:1 note[text]:'it''s a trap'")
    _, _, op, before, after = parse_wal_line(line)
    assert op == "u"
    assert before == {"id": 1, "note": "x new-tuple: y[bigint]:2 old-key: z"}
    assert after == {"id": 1, "note": "it's a trap"}


def test_timestamp_variants_and_rejections():
    base = 1704103200000000  # 2024-01-01 10:00:00 UTC
    for typ, lit, want in [
        ("timestamp without time zone", "'2024-01-01 10:00:00'", base),
        ("timestamp without time zone", "'2024-01-01 10:00:00.000001'",
         base + 1),
        ("timestamp with time zone", "'2024-01-01 10:00:00+00'", base),
        ("timestamp with time zone", "'2024-01-01 11:30:00+01:30'", base),
    ]:
        _, _, _, _, after = parse_wal_line(
            f"table public.t: INSERT: ts[{typ}]:{lit}")
        assert after == {"ts": want}, (typ, lit)
    with pytest.raises(ValueError):
        parse_wal_line("table public.t: INSERT: "
                       "ts[timestamp without time zone]:'not a time'")


def test_unchanged_toast_is_explicit_reject():
    """A row image holding unchanged-toast-datum is incomplete;
    writing the sentinel into a snapshot would corrupt the column, so
    the decoder must raise, not pass the marker through as text."""
    with pytest.raises(ValueError, match="TOAST"):
        parse_wal_line("table public.t: UPDATE: id[bigint]:1 "
                       "blob[text]:unchanged-toast-datum")


def test_malformed_columns_are_explicit_reject():
    """Anything that is not a well-formed column must raise — a
    silently dropped column would feed a partial row image to MERGE."""
    bad = [
        "table public.t: INSERT: id[bigint]:1 garbage-token",
        "table public.t: INSERT: id[bigint:1",
        "table public.t: DELETE: (no-tuple-data)",
        "table public.t: UPDATE: old-key: id[bigint]:1",  # no new-tuple
    ]
    for line in bad:
        with pytest.raises(ValueError):
            parse_wal_line(line)
    # non-row protocol lines are None (skipped), not errors
    assert parse_wal_line("BEGIN 99") is None
    assert parse_wal_line("COMMIT 99 (at 2024-01-01)") is None


@settings(max_examples=50, deadline=None)
@given(st.lists(_row(min_cols=1), min_size=1, max_size=5))
def test_multi_statement_transaction_ordering(rows):
    """BEGIN/COMMIT markers interleave freely; every row line becomes
    exactly one message (or two for a key-change UPDATE) and LSN
    order is preserved end-to-end."""
    changes, lsn = [], 0x100
    changes.append((f"0/{lsn:X}", "7", "BEGIN 7"))
    expected = 0
    for cols in rows:
        lsn += 16
        changes.append((f"0/{lsn:X}", "7",
                        f"table public.t: INSERT: {_segment(cols)}"))
        expected += 1
    lsn += 16
    changes.append((f"0/{lsn:X}", "7", "COMMIT 7"))
    msgs = wal_to_kafka_messages(changes, key_col="id")
    assert len(msgs) == expected
    offs = [m["offset"] for m in msgs]
    assert offs == sorted(offs)
    for m in msgs:
        payload = json.loads(m["value"])["payload"]
        assert payload["op"] == "c"
        assert payload["source"]["table"] == "t"


# -- end-to-end applier replay (restored per r6 ADVICE: the decoder
# fuzz above and this exercise DIFFERENT layers — this one pins
# CDCApplier batch-boundary semantics: within-batch LSN dedup,
# cross-batch MERGE ordering, delete-of-absent-key no-ops) ----------

from pyspark.sql.types import (  # noqa: E402
    DoubleType, LongType, StringType, StructField, StructType,
)

from deltalake_poc_spark.cdc import CDCApplier, parse_debezium  # noqa: E402

_PROP_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("val", DoubleType()),
    StructField("name", StringType()),
])


def _envelope(op, id_, lsn, val, name):
    payload = {"op": op, "ts_ms": 1700000000000 + lsn,
               "source": {"version": "1", "connector": "p", "name": "cdc",
                          "ts_ms": 1700000000000 + lsn, "snapshot": "false",
                          "db": "d", "schema": "public", "table": "props",
                          "txId": lsn, "lsn": lsn}}
    if op == "d":
        payload["before"] = {"id": id_}
    else:
        payload["after"] = {"id": id_, "val": val, "name": name}
    return (json.dumps({"payload": {"id": id_}}),
            json.dumps({"payload": payload}), "cdc.public.props", 0, lsn)


@settings(max_examples=6, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5),         # key
                  st.sampled_from(["c", "u", "d"]),
                  st.floats(min_value=0, max_value=9, allow_nan=False),
                  st.sampled_from(["x", "y", "z"])),
        min_size=1, max_size=24),
    n_batches=st.integers(min_value=1, max_value=3),
)
def test_cdc_apply_matches_model(spark, tmp_path_factory, events, n_batches):
    """Random upsert/delete streams with monotone LSNs, chopped into
    contiguous batches through envelope -> parse_debezium -> dedup ->
    MERGE, must equal a last-writer-wins dict replay."""
    tmp = tmp_path_factory.mktemp("cdcprop")
    applier = CDCApplier(spark, str(tmp),
                         table_schemas={"props": _PROP_SCHEMA},
                         enable_cdf=False)
    msgs = [_envelope(op, k, lsn, round(v, 2), nm)
            for lsn, (k, op, v, nm) in enumerate(events)]
    size = max(1, len(msgs) // n_batches)
    for i in range(0, len(msgs), size):
        raw = spark.createDataFrame(
            msgs[i:i + size],
            "key string, value string, topic string, "
            "partition int, offset long")
        applier.apply_batch(parse_debezium(raw), tables=["props"])
    model: dict[int, tuple] = {}
    for lsn, (k, op, v, nm) in enumerate(events):
        if op == "d":
            model.pop(k, None)
        else:
            model[k] = (round(v, 2), nm)
    got = {r["id"]: (r["val"], r["name"])
           for r in applier.snapshot_table("props").read().collect()}
    assert got == model
