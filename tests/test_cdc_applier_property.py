"""Property-based CDC applier replay: random event sequences
(upserts/deletes with monotonically increasing LSNs), randomly
chopped into contiguous batches and run through the FULL pipeline
(envelope synth -> parse_debezium -> dedup -> MERGE), must equal a
dict replay of the same events.

This exercises a different layer than tests/test_cdc_property.py
(which fuzzes the WAL test_decoding line DECODER): here the fuzz is
over CDCApplier batch-boundary semantics — last-event-per-key dedup
within a batch, MERGE idempotence across batches, delete-then-
reinsert of the same key, and keys whose entire life happens inside
one batch. Reference contract: the consumer applies Debezium batches
with identical replay semantics
(/root/reference/consumer/spark-streaming/spark_streaming.py).
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from deltalake_poc_spark.cdc import CDCApplier, parse_debezium

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("val", DoubleType()),
    StructField("name", StringType()),
])


def _msg(op, id_, lsn, val, name):
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


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
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
    tmp = tmp_path_factory.mktemp("cdcprop")
    applier = CDCApplier(spark, str(tmp), table_schemas={"props": SCHEMA},
                         enable_cdf=False)
    msgs = [_msg(op, k, lsn, round(v, 2), nm)
            for lsn, (k, op, v, nm) in enumerate(events)]
    # chop the ordered event stream into n_batches contiguous batches
    size = max(1, len(msgs) // n_batches)
    model: dict[int, tuple] = {}
    for i in range(0, len(msgs), size):
        chunk = msgs[i:i + size]
        raw = spark.createDataFrame(
            chunk,
            "key string, value string, topic string, partition int, offset long")
        applier.apply_batch(parse_debezium(raw), tables=["props"])
    for lsn, (k, op, v, nm) in enumerate(events):
        if op == "d":
            model.pop(k, None)
        else:
            model[k] = (round(v, 2), nm)
    got = {r["id"]: (r["val"], r["name"])
           for r in applier.snapshot_table("props").read().collect()}
    assert got == model
