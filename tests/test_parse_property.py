"""Property tests for the Debezium envelope parse (cdc/parse.py).

Companion to tests/test_cdc_property.py (which fuzzes the WAL text
decoder): here the fuzz target is the JSON envelope path every Kafka
message takes. Contract pinned:

- every message whose value parses as JSON with a non-null
  ``payload.op`` appears in the output EXACTLY once, with the planted
  op, source coordinates, ts_ms, and byte-identical before/after row
  images (round-tripped through the re-serialized JSON subtree);
- everything else — tombstones (null value), truncated JSON, junk
  bytes, envelopes without op — is dropped, never crashes the batch,
  and never produces a partial row (P2: the reference drops
  non-envelope messages, consumer.py:152-162);
- event_id is always "topic-partition-offset" and unique.
"""

from __future__ import annotations

import calendar
from datetime import timezone

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deltalake_poc_spark.cdc.parse import parse_debezium
from deltalake_poc_spark.cdc.pgwal import kafka_shape_df

# scalar JSON values a Debezium row image carries ("connect"
# precision mode: timestamps/decimals already rendered to long/double
# upstream)
_SCALAR = st.one_of(
    st.none(), st.booleans(), st.integers(-2**53, 2**53),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20))

_ROW = st.one_of(
    st.none(),
    st.dictionaries(
        st.text(st.characters(codec="ascii", min_codepoint=97,
                              max_codepoint=122), min_size=1, max_size=8),
        _SCALAR, max_size=5))


@st.composite
def _message(draw, offset):
    """(kafka_record, expectation) — expectation is the planted
    payload dict for parseable envelopes, or None for dropped ones."""
    kind = draw(st.sampled_from(
        ["ok", "ok", "ok", "tombstone", "no_op", "truncated", "junk"]))
    topic = draw(st.sampled_from(["s.public.t1", "s.public.t2"]))
    rec = {"key": None, "topic": topic, "partition": 0, "offset": offset}
    if kind == "tombstone":
        rec["value"] = None
        return rec, None
    payload = {
        "op": draw(st.sampled_from(["c", "u", "d", "r", "x"])),
        "ts_ms": draw(st.integers(0, 2**41)),
        "before": draw(_ROW),
        "after": draw(_ROW),
        "source": {"db": "db", "schema": "public",
                   "table": topic.rsplit(".", 1)[-1],
                   "lsn": draw(st.integers(0, 2**40)),
                   "txId": draw(st.integers(0, 2**31))},
    }
    if kind == "no_op":
        del payload["op"]
    body = json.dumps({"payload": payload})
    if kind == "truncated":
        cut = draw(st.integers(1, max(1, len(body) - 1)))
        body = body[:cut]
    elif kind == "junk":
        body = draw(st.sampled_from(
            ["{", "[1,2,3]", "null", "\xff\xfe binary-ish", "{}",
             '{"payload": 17}', '{"payload": null}']))
    rec["value"] = body.encode()
    expect = payload if kind == "ok" else None
    if expect is not None:
        try:  # a truncation-free envelope must still be valid JSON
            json.loads(body)
        except Exception:  # pragma: no cover - generator bug guard
            expect = None
    return rec, expect


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_envelope_parse_roundtrip(spark, data):
    msgs = [data.draw(_message(i)) for i in range(10)]
    records = [m for m, _ in msgs]
    expected = {f"{m['topic']}-0-{m['offset']}": e
                for m, e in msgs if e is not None}
    out = parse_debezium(kafka_shape_df(spark, records)).collect()
    got = {r["event_id"]: r for r in out}
    assert set(got) == set(expected)
    for eid, want in expected.items():
        r = got[eid]
        assert r["operation"] == want["op"]
        assert r["operation_name"] == {
            "c": "INSERT", "u": "UPDATE", "d": "DELETE",
            "r": "SNAPSHOT"}.get(want["op"], "UNKNOWN")
        assert r["source_table"] == want["source"]["table"]
        assert r["table_name"] == "public." + want["source"]["table"]
        assert r["source_lsn"] == want["source"]["lsn"]
        assert r["source_txid"] == want["source"]["txId"]
        # exact ms from the datetime fields — .timestamp()*1000 is a
        # float round-trip that truncates (hypothesis found
        # ts_ms=542004925341 -> ...340.9999 -> int() off by one; the
        # parsed datetime itself was exact, microsecond=341000)
        ts = r["event_timestamp"].replace(tzinfo=timezone.utc)
        got_ms = (calendar.timegm(ts.timetuple()) * 1000
                  + ts.microsecond // 1000)
        assert got_ms == want["ts_ms"]
        for col, image in (("before_data", want["before"]),
                           ("after_data", want["after"])):
            if image is None:
                assert r[col] is None
            else:
                # the re-serialized subtree must hold the same VALUES
                # (key order may differ; floats round-trip exactly)
                assert json.loads(r[col]) == image


def test_empty_batch(spark):
    out = parse_debezium(kafka_shape_df(spark, []))
    assert out.count() == 0
