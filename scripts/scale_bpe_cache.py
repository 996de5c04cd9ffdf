#!/usr/bin/env python3
"""Measure bpe_segment_prod's per-partition encode-cache footprint.

The r10 verdict's one flagged soft spot: the production segmenter
keeps an unbounded word -> symbol-count dict per partition. This
script runs the SAME eligibility + encode loop as bpe_segment_prod
(word trim/split/fullmatch, rank-loop _count_symbols) over the
largest scale tier present, but yields one row PER PARTITION with the
cache's entry count and measured byte footprint (getsizeof of the
dict's hash table + every key string + a CPython int object per
value), instead of the per-doc counts. That turns the memory model
into a recorded number rather than an argument.

Why the cache is vocab-bounded, not corpus-bounded: keys are the
partition's DISTINCT eligible words, so the per-partition ceiling is
min(partition distinct words, corpus vocabulary). Zipf makes the
realistic number tiny (~31k words at the 22 GB 1000x derivative); the
pathological ceiling is a 10^9-distinct-word corpus where ONE
partition sees millions of distinct words — the measurement below
gives bytes/word so that regime can be priced directly.

Emits one JSON line per tier; summary to SPARK_GRAFT_SCALE_JSON
(default SCALE_RUN_BPE_CACHE.json).
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
                          "/root/repo/SCALE_RUN_BPE_CACHE.json")
N_MERGES = int(os.environ.get("SPARK_GRAFT_BPE_PROD_MERGES", "2000"))


def main() -> None:
    from pyspark.sql import functions as F

    from deltalake_poc_spark.analytics.io import load_table
    from deltalake_poc_spark.pipeline.bpe import bpe_learn_local
    from deltalake_poc_spark.session import EngineConfig, get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(EngineConfig(
        app_name="scale_bpe_cache", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus)))

    summary: dict = {"n_merges": N_MERGES, "cpus": int(cpus), "tiers": {}}
    skipped = []
    for tier, sf_dir in TIERS:
        if not os.path.isdir(sf_dir):
            skipped.append(tier)
            print(json.dumps({"tier": tier, "skipped": "no data dir"}),
                  flush=True)
            continue
        docs = (load_table(spark, sf_dir, "documents")
                .withColumn("text", F.translate(
                    "text", "0123456789", "abcdefghij")))
        rules = bpe_learn_local(docs, n_merges=N_MERGES)
        merges = [(left, right) for left, right, _ in rules]
        stats = _cache_stats(docs, merges)
        n_parts = len(stats)
        entries = [s["entries"] for s in stats]
        bytes_ = [s["bytes"] for s in stats]
        total_entries = sum(entries)
        total_bytes = sum(bytes_)
        row = {
            "n_merges_learned": len(merges),
            "partitions": n_parts,
            "cache_entries_max": max(entries),
            "cache_entries_mean": round(total_entries / n_parts, 1),
            "cache_bytes_max": max(bytes_),
            "cache_bytes_mean": round(total_bytes / n_parts),
            "bytes_per_word": round(total_bytes / max(total_entries, 1), 1),
        }
        summary["tiers"][tier] = row
        print(json.dumps({"tier": tier, **row}), flush=True)

    summary["written_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    out = OUT_JSON
    if skipped:
        # never clobber the committed artifact of record with a
        # partial run (the sf100 tier dir is gitignored and may be
        # absent on a fresh host)
        summary["skipped_tiers"] = skipped
        out += ".partial"
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", out)


def _cache_stats(docs, merges):
    """bpe_segment_prod's exact encode loop, yielding one
    (entries, bytes) row per partition instead of per-doc counts."""
    import re

    from deltalake_poc_spark.pipeline.bpe import _count_symbols

    ranks = {(left, right): i for i, (left, right) in enumerate(merges)}
    bc_ranks = docs.sparkSession.sparkContext.broadcast(ranks)
    word_ok = re.compile(r"[a-z]+").fullmatch

    def encode(batches):
        import pandas as pd

        ranks = bc_ranks.value
        cache: dict[str, int] = {}
        for pdf in batches:
            for text in pdf["text"]:
                if text is None:
                    continue
                for w in text.strip(" ").split(" "):
                    if not w or not word_ok(w):
                        continue
                    if w not in cache:
                        cache[w] = _count_symbols(w, ranks)
        # the dict's own getsizeof covers the hash table; keys add
        # their string storage. Values are NOT counted: symbol
        # counts are small ints (1..len(word) <= 256), which CPython
        # interns — the dict slots (already in the getsizeof) hold
        # pointers to shared singletons, not per-entry objects
        n_bytes = (sys.getsizeof(cache)
                   + sum(sys.getsizeof(k) for k in cache))
        yield pd.DataFrame({"entries": [len(cache)], "bytes": [n_bytes]})

    from deltalake_poc_spark.pipeline.dedup import spread

    return [r.asDict() for r in
            spread(docs.select("doc_id", "text"))
            .mapInPandas(encode, "entries long, bytes long").collect()]


if __name__ == "__main__":
    main()
