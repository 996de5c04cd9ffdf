#!/usr/bin/env python3
"""Scaling run: the most expensive operators at sf0.1 vs the 10x
derivative (scripts/make_scale_data.py), same session, same
methodology as bench.py (noop sink forces full computation, no
driver collect). Emits one JSON line per (query, sf) with wall time,
result rows, and /proc/stat steal deltas, plus a summary with the
sf1/sf0.1 ratio per query; SCALE.md is written from this output.

A ratio near the 10x data ratio (or below it — more rows amortize
fixed job overhead better) means the operator's shuffle/agg shape
holds a decade up; a super-linear ratio names a scale problem.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "ngram_jaccard", "minhash_dedup", "simhash_dedup", "winnow_dedup",
    "dedup_group_assign", "canonical_selection", "incremental_dedup",
    "span_dedup", "chunk_dedup", "source_overlap", "tf_idf",
    "cohort_retention", "funnel_steps", "skewed_agg",
    "pq_batch_topk", "embedding_neardup", "cdc_pipeline",
    "q1_pricing_summary", "q3_shipping_priority", "q9_product_revenue",
]

SF_SMALL = os.environ.get("SPARK_GRAFT_SCALE_SMALL", "/root/testdata/sf0.1")
SF_BIG = os.environ.get("SPARK_GRAFT_SCALE_OUT", "/root/repo/.scale/sf1")
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
RATIO = int(os.environ.get("SPARK_GRAFT_SCALE_RATIO", "10"))
OUT_JSON = os.environ.get("SPARK_GRAFT_SCALE_JSON",
                          "/root/repo/SCALE_RUN.json")
if os.environ.get("SPARK_GRAFT_SCALE_QUERIES"):
    QUERIES = os.environ["SPARK_GRAFT_SCALE_QUERIES"].split(",")


def _steal() -> int:
    try:
        vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return vals[7] if len(vals) > 7 else 0
    except Exception:
        return 0


def main() -> None:
    from deltalake_poc_spark.session import EngineConfig, get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    # at the 1000x tier a 32-partition shuffle holds ~100M gram rows
    # per partition; widen so per-task spill stays bounded (AQE
    # coalesces the small stages back down, so the extra partitions
    # cost nothing at the sf0.1 side)
    shuffle = int(os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", cpus))
    # zstd shuffle/spill compression: the 1000x tier's shuffles (600M-row
    # fact joins, 3B-token gram explosions) are disk-bound on this VM —
    # zstd roughly halves spill bytes vs lz4 for these token-heavy rows,
    # which is the difference between fitting the scratch disk and ENOSPC.
    spark = get_spark(EngineConfig(
        app_name="scale_run", master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
        extra_conf={"spark.io.compression.codec":
                    os.environ.get("SPARK_GRAFT_SCALE_CODEC", "zstd")}))

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warmups (JVM, parquet footers, Python worker pool) as in bench.py
    for d in (SF_SMALL, SF_BIG):
        spark.read.parquet(os.path.join(d, "region.parquet")).count()
    spark.range(0, int(cpus), 1, int(cpus)).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    results: dict[str, dict] = {}
    for name in QUERIES:
        fn = qs[name]
        entry: dict[str, dict] = {}
        small_label = os.path.basename(os.path.normpath(SF_SMALL))
        big_label = os.path.basename(os.path.normpath(SF_BIG))
        try:
            _run_one(spark, fn, entry, small_label, big_label)
        except Exception as exc:  # e.g. scratch-disk ENOSPC at a tier
            entry["error"] = f"{type(exc).__name__}: {exc}"[:500]
            results[name] = entry
            print(json.dumps({"q": name, "error": entry["error"][:200]}),
                  flush=True)
            continue
        ratio = entry[big_label]["min"] / max(entry[small_label]["min"],
                                              1e-9)
        row_ratio = (entry[big_label]["rows"] /
                     max(entry[small_label]["rows"], 1))
        entry["time_ratio"] = round(ratio, 2)
        entry["row_ratio"] = round(row_ratio, 2)
        results[name] = entry
        print(json.dumps({"q": name, "time_ratio": entry["time_ratio"],
                          "row_ratio": entry["row_ratio"]}), flush=True)

    out = {"data_ratio": RATIO, "small": SF_SMALL, "big": SF_BIG,
           "cpus": int(cpus), "reps": REPS, "queries": results}
    with open(OUT_JSON, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"WROTE {OUT_JSON}", flush=True)


def _run_one(spark, fn, entry, small_label, big_label) -> None:
    name = fn.__name__.lstrip("_")
    for label, sf_dir in ((small_label, SF_SMALL), (big_label, SF_BIG)):
        times, rows = [], None
        for rep in range(REPS):
            s0 = _steal()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times.append(round(dt, 3))
            if rows is None:
                rows = df.count()
            print(json.dumps({"q": name, "sf": label, "rep": rep,
                              "sec": round(dt, 3),
                              "steal_jiffies": _steal() - s0}),
                  flush=True)
        entry[label] = {"times": times, "min": min(times),
                        "rows": rows}


if __name__ == "__main__":
    main()
