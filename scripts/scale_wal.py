#!/usr/bin/env python3
"""Live-PostgreSQL WAL CDC at scale (round-8, verdict item 7).

The gate query wal_cdc_pipeline proves the live chain end-to-end but
is tiny (40 rows / ~66 WAL ops). This drives the SAME chain — real
server, test_decoding slot, peek -> decode -> Debezium shape ->
CDCApplier MERGE -> advance — at 10x/100x/1000x the gate's op count,
in micro-batches of 10,000 changes (the reference's
maxOffsetsPerTrigger, BASELINE.md), and records per-micro-batch
decode+apply latency against the reference's 10 s trigger interval.

Exactly-once protocol is the production one from cdc/pgwal.py:
peek_changes (non-destructive) -> apply with max-LSN batch id ->
slot_advance; a crash replays idempotently.

Verification: the final snapshot's row count and exact integer-cents
balance sum must equal the Python-computed expected state (float8
arithmetic is IEEE double on both sides).

Writes SCALE_RUN_WAL.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/SCALE_RUN_WAL.json"
BATCH = 10_000          # reference maxOffsetsPerTrigger
TIERS = [("10x", 400), ("100x", 4000), ("1000x", 40000)]


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from deltalake_poc_spark.cdc import CDCApplier, pglive
    from deltalake_poc_spark.cdc.pgwal import apply_wal_batch
    from deltalake_poc_spark.analytics.money import units
    from deltalake_poc_spark.session import EngineConfig, get_spark

    if not pglive.available():
        print(json.dumps({"skipped": "no postgres server in env"}))
        return
    spark = get_spark(EngineConfig(app_name="scale_wal",
                                   master="local[32]",
                                   shuffle_partitions=32))
    pg = pglive.EphemeralPostgres()
    res: dict = {"batch_changes": BATCH,
                 "reference_trigger_sec": 10.0, "tiers": {}}

    # Warm the MERGE path OUTSIDE the timed window (r9, verdict #6):
    # the first micro-batch of a fresh session pays JVM JIT + codegen
    # + Python worker pool spin-up (~8 s measured), which the r8
    # artifact mis-read as a 10x-tier trigger violation. A steady
    # consumer (the thing the tiers model) has paid this long ago; a
    # cold one pays it ONCE, recorded here as warmup_sec.
    t0 = time.time()
    wtbl = f"wal_warm_{uuid.uuid4().hex[:6]}"
    wslot = f"slot_{wtbl}"
    pg.sql(f"CREATE TABLE public.{wtbl} (id BIGINT PRIMARY KEY, "
           f"name TEXT, mkt TEXT, acctbal DOUBLE PRECISION);"
           f"SELECT pg_create_logical_replication_slot("
           f"'{wslot}', 'test_decoding');")
    pg.sql(f"INSERT INTO public.{wtbl} SELECT g, 'w', 'SEG0', 1.25 "
           f"FROM generate_series(1, 50) g;"
           f"UPDATE public.{wtbl} SET acctbal = 2.5 WHERE id % 2 = 0;")
    raw = pg.sql(f"SELECT lsn::text, xid::text, data FROM "
                 f"pg_logical_slot_peek_changes('{wslot}', NULL, NULL);",
                 sep="\x1f")
    import tempfile as _tf
    warm_applier = CDCApplier(spark, _tf.mkdtemp(prefix="walwarm_"),
                              infer_unknown_tables=True)
    apply_wal_batch(spark, warm_applier,
                    [ln.split("\x1f", 2) for ln in raw.splitlines() if ln],
                    tables=[wtbl])
    pg.sql(f"SELECT pg_drop_replication_slot('{wslot}');"
           f"DROP TABLE public.{wtbl};")
    res["warmup_sec"] = round(time.time() - t0, 2)
    print(json.dumps({"warmup_sec": res["warmup_sec"]}), flush=True)

    for tier, n in TIERS:
        tbl = f"wal_scale_{int(time.time())}_{uuid.uuid4().hex[:6]}"
        slot = f"slot_{tbl}"
        tres: dict = {"rows": n}
        expected: dict[int, float] = {}
        try:
            pg.sql(f"CREATE TABLE public.{tbl} (id BIGINT PRIMARY KEY, "
                   f"name TEXT, mkt TEXT, acctbal DOUBLE PRECISION);"
                   f"SELECT pg_create_logical_replication_slot("
                   f"'{slot}', 'test_decoding');")
            t0 = time.time()
            for lo in range(1, n + 1, 10_000):
                hi = min(lo + 10_000, n + 1)
                values = ", ".join(
                    f"({i}, 'cust_{i}', 'SEG{i % 5}', {(i % 9973) + 0.25!r})"
                    for i in range(lo, hi))
                pg.sql(f"INSERT INTO public.{tbl} VALUES {values};")
            pg.sql(f"UPDATE public.{tbl} SET acctbal = acctbal + 100 "
                   f"WHERE id % 3 = 0;")
            pg.sql(f"DELETE FROM public.{tbl} WHERE id % 7 = 0;")
            tres["ingest_sec"] = round(time.time() - t0, 2)
            for i in range(1, n + 1):
                if i % 7 == 0:
                    continue
                b = (i % 9973) + 0.25
                expected[i] = b + 100 if i % 3 == 0 else b

            applier = CDCApplier(spark, tempfile.mkdtemp(prefix="walsc_"),
                                 infer_unknown_tables=True)
            batches = []
            t_all = time.time()
            while True:
                t0 = time.time()
                raw = pg.sql(
                    f"SELECT lsn::text, xid::text, data FROM "
                    f"pg_logical_slot_peek_changes("
                    f"'{slot}', NULL, {BATCH});", sep="\x1f")
                changes = [ln.split("\x1f", 2)
                           for ln in raw.splitlines() if ln]
                t_peek = time.time() - t0
                if not changes:
                    break
                t0 = time.time()
                metrics, upto = apply_wal_batch(spark, applier, changes,
                                                tables=[tbl])
                t_apply = time.time() - t0
                # advance past EVERYTHING peeked (incl. trailing
                # BEGIN/COMMIT markers that carry no row data)
                last = changes[-1][0]
                pg.sql(f"SELECT pg_replication_slot_advance("
                       f"'{slot}', '{last}');")
                batches.append({"changes": len(changes),
                                "peek_sec": round(t_peek, 2),
                                "decode_apply_sec": round(t_apply, 2)})
            tres["e2e_consume_sec"] = round(time.time() - t_all, 2)
            tres["micro_batches"] = batches
            tres["max_batch_apply_sec"] = max(
                b["decode_apply_sec"] for b in batches)
            tres["within_reference_trigger"] = (
                tres["max_batch_apply_sec"] < 10.0)

            snap = (applier.snapshot_table(tbl).read()
                    .select("id", units("acctbal").alias("cents")))
            got_n = snap.count()
            got_sum = snap.agg(F.sum("cents")).collect()[0][0]
            exp_sum = sum(math.floor(v * 100 + 0.5)
                          for v in expected.values())
            tres["rows_match"] = (got_n == len(expected))
            tres["cents_match"] = (int(got_sum) == int(exp_sum))
            tres["snapshot_rows"] = got_n
            assert tres["rows_match"] and tres["cents_match"], tres
        finally:
            pg.sql(f"SELECT pg_drop_replication_slot(slot_name) "
                   f"FROM pg_replication_slots "
                   f"WHERE slot_name = '{slot}';"
                   f"DROP TABLE IF EXISTS public.{tbl};")
        res["tiers"][tier] = tres
        print(json.dumps({tier: tres}), flush=True)

    # Concurrent multi-table tier (r9, verdict #6): the reference
    # consumes 4 tables (customer/orders/lineitem/supplier) from one
    # stream. One slot carries ALL tables' interleaved changes; each
    # micro-batch fans out through CDCApplier to 4 MERGE targets —
    # the per-batch cost should stay ~flat vs single-table because
    # the MERGEs share the batch's decode and run against partitioned
    # targets.
    n_per = 10_000
    stamp = f"{int(time.time())}_{uuid.uuid4().hex[:6]}"
    names = [f"wal_mt{i}_{stamp}" for i in range(4)]
    slot = f"slot_mt_{stamp}"
    tres = {"tables": 4, "rows_per_table": n_per}
    expected_mt: dict[str, dict[int, float]] = {t: {} for t in names}
    try:
        ddl = "".join(
            f"CREATE TABLE public.{t} (id BIGINT PRIMARY KEY, name TEXT, "
            f"mkt TEXT, acctbal DOUBLE PRECISION);" for t in names)
        pg.sql(ddl + f"SELECT pg_create_logical_replication_slot("
                     f"'{slot}', 'test_decoding');")
        t0 = time.time()
        for lo in range(1, n_per + 1, 5_000):
            hi = min(lo + 5_000, n_per + 1)
            stmts = []
            for ti, t in enumerate(names):
                values = ", ".join(
                    f"({i}, 'r_{ti}_{i}', 'SEG{i % 5}', "
                    f"{(i % 9973) + 0.25 + ti!r})"
                    for i in range(lo, hi))
                stmts.append(f"INSERT INTO public.{t} VALUES {values};")
            pg.sql("".join(stmts))
        pg.sql("".join(
            f"UPDATE public.{t} SET acctbal = acctbal + 100 "
            f"WHERE id % 3 = 0;" for t in names))
        pg.sql("".join(
            f"DELETE FROM public.{t} WHERE id % 7 = 0;" for t in names))
        tres["ingest_sec"] = round(time.time() - t0, 2)
        for ti, t in enumerate(names):
            for i in range(1, n_per + 1):
                if i % 7 == 0:
                    continue
                b = (i % 9973) + 0.25 + ti
                expected_mt[t][i] = b + 100 if i % 3 == 0 else b

        applier = CDCApplier(spark, tempfile.mkdtemp(prefix="walmt_"),
                             infer_unknown_tables=True)
        batches = []
        t_all = time.time()
        while True:
            t0 = time.time()
            raw = pg.sql(
                f"SELECT lsn::text, xid::text, data FROM "
                f"pg_logical_slot_peek_changes("
                f"'{slot}', NULL, {BATCH});", sep="\x1f")
            changes = [ln.split("\x1f", 2)
                       for ln in raw.splitlines() if ln]
            t_peek = time.time() - t0
            if not changes:
                break
            t0 = time.time()
            metrics, upto = apply_wal_batch(spark, applier, changes,
                                            tables=names)
            t_apply = time.time() - t0
            pg.sql(f"SELECT pg_replication_slot_advance("
                   f"'{slot}', '{changes[-1][0]}');")
            batches.append({"changes": len(changes),
                            "peek_sec": round(t_peek, 2),
                            "decode_apply_sec": round(t_apply, 2)})
        tres["e2e_consume_sec"] = round(time.time() - t_all, 2)
        tres["micro_batches"] = batches
        tres["max_batch_apply_sec"] = max(
            b["decode_apply_sec"] for b in batches)
        tres["within_reference_trigger"] = (
            tres["max_batch_apply_sec"] < 10.0)

        tres["tables_verified"] = 0
        for t in names:
            snap = (applier.snapshot_table(t).read()
                    .select("id", units("acctbal").alias("cents")))
            got_n = snap.count()
            got_sum = snap.agg(F.sum("cents")).collect()[0][0]
            exp_sum = sum(math.floor(v * 100 + 0.5)
                          for v in expected_mt[t].values())
            assert got_n == len(expected_mt[t]), (t, got_n)
            assert int(got_sum) == int(exp_sum), (t, got_sum, exp_sum)
            tres["tables_verified"] += 1
    finally:
        pg.sql(f"SELECT pg_drop_replication_slot(slot_name) "
               f"FROM pg_replication_slots "
               f"WHERE slot_name = '{slot}';"
               + "".join(f"DROP TABLE IF EXISTS public.{t};"
                         for t in names))
    res["tiers"]["multi_table_4x"] = tres
    print(json.dumps({"multi_table_4x": tres}), flush=True)

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
