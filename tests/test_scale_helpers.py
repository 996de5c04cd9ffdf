"""Auto-compaction policy, salted aggregation, approx sketches."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from deltalake_poc_spark.analytics.queries import approx_stats
from deltalake_poc_spark.cdc import CDCApplier, parse_debezium
from deltalake_poc_spark.perf import salted_aggregate


def _msg(id_, lsn, email):
    payload = {"op": "u", "ts_ms": 1700000000000,
               "source": {"version": "1", "connector": "p", "name": "cdc",
                          "ts_ms": 1700000000000, "snapshot": "false", "db": "d",
                          "schema": "public", "table": "customers",
                          "txId": lsn, "lsn": lsn},
               "after": {"id": id_, "first_name": "A", "last_name": "B",
                         "email": email, "phone": None, "address": "x",
                         "created_at": 1700000000_000000,
                         "updated_at": 1700000000_000000}}
    return (json.dumps({"payload": {"id": id_}}),
            json.dumps({"payload": payload}), "cdc.public.customers", 0, lsn)


def test_auto_compaction_bounds_file_count(spark, tmp_path):
    """8 micro-batches of merges without compaction leave many small
    files; with auto_compact_every=4 the file count stays bounded and
    contents are identical."""
    applier = CDCApplier(spark, str(tmp_path), enable_cdf=False,
                         auto_compact_every=4)
    lsn = 0
    for b in range(8):
        msgs = [_msg(i, (lsn := lsn + 1), f"b{b}-{i}@x") for i in range(5)]
        raw = spark.createDataFrame(
            msgs, "key string, value string, topic string, partition int, offset long")
        applier.apply_batch(parse_debezium(raw), tables=["customers"])
    t = applier.snapshot_table("customers")
    ops = [h["operation"] for h in t.history()]
    assert ops.count("OPTIMIZE") == 2          # after batches 4 and 8
    assert len(t.snapshot().files) <= 2        # compacted
    rows = {r["id"]: r["email"] for r in t.read().collect()}
    assert rows == {i: f"b7-{i}@x" for i in range(5)}


def test_salted_aggregate_matches_plain(spark):
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 5 != 0, F.lit("hot")).otherwise(F.lit("cold"))
        .alias("k"),
        (F.col("id") % 100).alias("x"))
    got = {r["k"]: (r["count_x"], r["sum_x"], r["min_x"], r["max_x"])
           for r in salted_aggregate(
               df, ["k"], {"x": "count"} | {}, n_salts=8)
           .join(salted_aggregate(df, ["k"], {"x": "sum"}), "k")
           .join(salted_aggregate(df, ["k"], {"x": "min"}), "k")
           .join(salted_aggregate(df, ["k"], {"x": "max"}), "k").collect()}
    want = {r["k"]: (r["c"], r["s"], r["mn"], r["mx"])
            for r in df.groupBy("k").agg(
                F.count("x").alias("c"), F.sum("x").alias("s"),
                F.min("x").alias("mn"), F.max("x").alias("mx")).collect()}
    assert got == want


def test_approx_stats_accuracy(spark):
    df = spark.range(0, 20_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 997).alias("d"),
        (F.col("id") % 1000).cast("double").alias("v"))
    approx = {r["g"]: r for r in approx_stats(df, "g", "v", "d").collect()}
    exact = {r["g"]: r for r in df.groupBy("g").agg(
        F.count_distinct("d").alias("nd"),
        F.expr("percentile(v, 0.5)").alias("med")).collect()}
    for g in ("0", "1"):
        assert abs(approx[g]["approx_distinct"] - exact[g]["nd"]) / exact[g]["nd"] < 0.1
        assert abs(approx[g]["approx_median"] - exact[g]["med"]) <= 25


def test_mixture_threshold_formula_exact_and_overflow_free():
    """Pure-integer property check of mixture_sample's rescaled
    threshold (no Spark needed): for random (target, total) pairs up
    to 10^16 tokens, the formula (1) never leaves int64, (2) is EXACT
    whenever total < 2^31 (the naive formula's domain), and (3) stays
    within 1e-6 relative error of the true floor(target*M/total)
    elsewhere — python bigints provide the truth the engines cannot
    compute in 64 bits."""
    import random

    M = 2**31 - 1
    rnd = random.Random(99)

    def formula(target, total):
        tgt = min(target, total)
        scale = 1 + total // M
        num = (tgt // scale) * M
        assert -2**63 <= num < 2**63, "int64 overflow"
        return min(M, num // max(1, total // scale))

    for _ in range(20000):
        total = rnd.randrange(1, 10**16)
        target = rnd.randrange(0, 10**16)
        got = formula(target, total)
        true = min(M, target * M // total)  # python bigint, exact
        if total < M:
            assert got == true, (target, total)
        else:
            assert abs(got - true) <= max(1, true * 1e-6), (target, total)
    # the documented failure of the naive formula: targets past
    # ~2^63/M wrap int64 negative — the rescaled one returns M (keep
    # all), the correct saturation
    assert formula(10**13, 2000) == M
