#!/usr/bin/env python3
"""Stage-level audit of split_safety's sf100 tier wall (r12, ordered
by the r11 verdict: 527 s / 96.8x was the largest non-ingest tier row
— find the dominant stage and trim or adjudicate it).

Times the gate query's three sequential legs SEPARATELY at each tier:

  1. pairs    — ngram_jaccard_pairs(threshold=0.15, capless) +
                eager localCheckpoint (the posting self-join).
  2. split    — leakage_safe_split(docs, pairs) materialized
                (connected components + keeper-hash assignment).
  3. verify   — the crossing-pair recount (two joins of the
                checkpointed pairs against the split) + the per-split
                group-count aggregate, i.e. the rest of the gate
                query.

Stage 2+3 consume the CHECKPOINTED pair set (exactly like the gate
query), so their times are incremental, not cumulative. This script
produces the stage DECOMPOSITION only; the r12 variant A/Bs
(carried-counts vs count-join, df>=2 prefilter on/off, the capped
branch) were run as separate interleaved same-session jobs and are
recorded — together with one run of this script — in the curated
committed artifact SCALE_RUN_SPLIT_SAFETY.json.

Emits one JSON summary to SPARK_GRAFT_SCALE_JSON (default
SCALE_RUN_SPLIT_SAFETY_STAGES.json — deliberately NOT the curated
artifact's name, so a re-run cannot clobber the committed A/B
evidence; point SPARK_GRAFT_SCALE_JSON elsewhere to redirect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = [
    ("sf0.1", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
    ("sf100", "/root/repo/.scale/sf100"),
]
OUT_JSON = os.environ.get("SPARK_GRAFT_SCALE_JSON",
                          "/root/repo/SCALE_RUN_SPLIT_SAFETY_STAGES.json")


def main() -> None:
    from pyspark.sql import functions as F

    from deltalake_poc_spark.pipeline.dedup import ngram_jaccard_pairs
    from deltalake_poc_spark.pipeline.sample import leakage_safe_split
    from deltalake_poc_spark.session import EngineConfig, get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(EngineConfig(
        app_name="scale_split_safety", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus)))

    summary: dict = {"cpus": int(cpus), "tiers": {}}
    for tier, sf_dir in TIERS:
        if not os.path.isdir(sf_dir):
            summary["tiers"][tier] = {"skipped": "no data dir"}
            continue
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

        t0 = time.perf_counter()
        pairs = ngram_jaccard_pairs(docs, threshold=0.15).localCheckpoint()
        n_pairs = pairs.count()
        t_pairs = time.perf_counter() - t0

        t0 = time.perf_counter()
        sp = leakage_safe_split(docs, pairs).localCheckpoint()
        n_docs = sp.count()
        t_split = time.perf_counter() - t0

        t0 = time.perf_counter()
        crossing = (
            pairs
            .join(sp.select(F.col("doc_id").alias("doc_a"),
                            F.col("split").alias("__sa")), "doc_a")
            .join(sp.select(F.col("doc_id").alias("doc_b"),
                            F.col("split").alias("__sb")), "doc_b")
            .filter(F.col("__sa") != F.col("__sb"))
            .agg(F.count(F.lit(1)).cast("long").alias("cross_pairs")))
        rows = (sp.groupBy("split")
                .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                     F.countDistinct("keep_doc_id").cast("long")
                     .alias("n_groups"))
                .crossJoin(F.broadcast(crossing))
                .orderBy("split")).collect()
        t_verify = time.perf_counter() - t0
        # NOTE: the gate query does NOT checkpoint sp — its verify leg
        # re-runs the split plan (docs scan + join vs the driver-local
        # comp frame) once per consumer. Time that too, so the
        # uncheckpointed gate shape is priced, not just the staged one.
        t0 = time.perf_counter()
        sp_raw = leakage_safe_split(docs, pairs)
        (sp_raw.groupBy("split")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.countDistinct("keep_doc_id").alias("n_groups"))
         .collect())
        t_split_reexec = time.perf_counter() - t0

        summary["tiers"][tier] = {
            "n_docs": n_docs, "n_pairs": n_pairs,
            "cross_pairs": int(rows[0]["cross_pairs"]) if rows else None,
            "t_pairs_sec": round(t_pairs, 3),
            "t_split_sec": round(t_split, 3),
            "t_verify_sec": round(t_verify, 3),
            "t_split_reexec_sec": round(t_split_reexec, 3),
        }
        print(json.dumps({tier: summary["tiers"][tier]}), flush=True)
        # no explicit release: DataFrame.unpersist() is a CacheManager
        # call and does NOTHING for localCheckpoint's RDD-level blocks
        # — those are freed by the ContextCleaner once the frames are
        # garbage-collected (the loop rebinds pairs/sp, dropping the
        # only references). The sf0.1 tier's blocks are KB-scale, so
        # carrying them into the sf100 tier is harmless.

    with open(OUT_JSON, "w") as fh:
        json.dump(summary, fh, indent=1)
    print("wrote", OUT_JSON, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
