#!/usr/bin/env python3
"""BPE tokenizer training at 10x/100x the gate corpus.

What the 100 TB docstring claims and this script measures:

1. The FIT's only corpus-wide pass is the word-frequency collapse
   (explode + groupBy); every one of the 8 merge iterations then runs
   over the distinct-word table alone. So fit wall time should grow
   ~linearly with corpus size AND stay dominated by the first pass,
   with the 8 iterations' cost tracking the (much smaller) vocabulary.
2. SEGMENTATION with the learned merges is a row-local map-only pass
   (a chain of literal replaces inside a higher-order transform) —
   linear, no shuffle.

Derivative note: make_scale_data.py replicates documents by mapping
every token to a rotation of token+str(replica) — the embedded digit
keeps replica vocabularies disjoint for the DEDUP operators, but it
also disqualifies replica words from BPE's ^[a-z]+$ alphabet (and
merely STRIPPING digits folds every replica word back onto a rotation
of its base word, collapsing the vocabulary — measured: vocab 138 at
every tier). This script TRANSLATES digits to letters (0->a .. 9->j)
instead: replica words stay mutually distinct all-alpha strings, so
corpus bytes scale by R and the distinct-word table scales ~R too —
both scaling axes of the fit are exercised, not just the scan.

Emits one JSON line per tier; summary to SPARK_GRAFT_SCALE_JSON
(default SCALE_RUN_BPE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = [
    ("sf0.1", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
    ("sf1", "/root/repo/.scale/sf1"),
    ("sf10", "/root/repo/.scale/sf10"),
    ("sf100", "/root/repo/.scale/sf100"),
]
OUT_JSON = os.environ.get("SPARK_GRAFT_SCALE_JSON",
                          "/root/repo/SCALE_RUN_BPE.json")
N_MERGES = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "8"))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2")))


def main() -> None:
    from pyspark.sql import functions as F

    from deltalake_poc_spark.analytics.io import load_table
    from deltalake_poc_spark.pipeline.bpe import (bpe_learn_rules,
                                                  bpe_segment,
                                                  bpe_segment_prod,
                                                  word_freqs)
    from deltalake_poc_spark.session import EngineConfig, get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(EngineConfig(
        app_name="scale_bpe", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus)))

    summary: dict = {"n_merges": N_MERGES, "cpus": int(cpus),
                     "reps": REPS, "tiers": {}}
    for tier, sf_dir in TIERS:
        if not os.path.isdir(sf_dir):
            print(json.dumps({"tier": tier, "skipped": "no data dir"}),
                  flush=True)
            continue
        docs = (load_table(spark, sf_dir, "documents")
                .withColumn("text", F.translate(
                    "text", "0123456789", "abcdefghij"))
                .persist())
        n_docs = docs.count()  # materialize: time the fit, not the scan
        vocab = word_freqs(docs).count()

        fit_times, seg_times, seg_prod_times = [], [], []
        rules = None
        for _ in range(REPS):
            t0 = time.time()
            rules = bpe_learn_rules(docs, n_merges=N_MERGES)
            fit_times.append(round(time.time() - t0, 3))
        merges = [(l, r) for l, r, _ in rules]
        sums = None
        for _ in range(REPS):
            t0 = time.time()
            sums = bpe_segment(docs, merges).agg(
                F.sum("n_subwords"), F.sum("n_bpe_words")).collect()
            seg_times.append(round(time.time() - t0, 3))
        # production (mapInPandas rank-loop) segmenter at the SAME
        # merge list: overhead of the Arrow path vs the expression
        # path where both run, and a corpus-total identity check
        for _ in range(REPS):
            t0 = time.time()
            prod_sums = bpe_segment_prod(docs, merges).agg(
                F.sum("n_subwords"), F.sum("n_bpe_words")).collect()
            seg_prod_times.append(round(time.time() - t0, 3))
        assert [tuple(r) for r in prod_sums] == [tuple(r) for r in sums], \
            (tier, prod_sums, sums)
        docs.unpersist()

        row = {"docs": n_docs, "vocab": vocab,
               "fit_times": fit_times, "fit_min": min(fit_times),
               "seg_times": seg_times, "seg_min": min(seg_times),
               "seg_prod_times": seg_prod_times,
               "seg_prod_min": min(seg_prod_times),
               "top_merges": [list(x) for x in rules[:4]]}
        summary["tiers"][tier] = row
        print(json.dumps({"tier": tier, **row}), flush=True)

    # Production fit at the largest tier present: distributed word
    # count + driver-side merge loop (bpe_learn_local), at a real
    # vocabulary-scale merge count — the regime where per-iteration
    # cluster scheduling would dominate the distributed loop.
    n_prod = int(os.environ.get("SPARK_GRAFT_BPE_PROD_MERGES", "2000"))
    for tier, sf_dir in reversed(TIERS):
        if tier not in summary["tiers"]:
            continue
        from deltalake_poc_spark.pipeline.bpe import bpe_learn_local
        docs = (load_table(spark, sf_dir, "documents")
                .withColumn("text", F.translate(
                    "text", "0123456789", "abcdefghij")))
        t0 = time.time()
        prod_rules = bpe_learn_local(docs, n_merges=n_prod)
        summary["prod_fit"] = {
            "tier": tier, "n_merges_requested": n_prod,
            "n_merges_learned": len(prod_rules),
            "wall_sec": round(time.time() - t0, 3)}
        print(json.dumps({"prod_fit": summary["prod_fit"]}), flush=True)

        # SEGMENT the full tier under the production merge count —
        # the regime the expression path cannot even plan (Catalyst
        # StackOverflowError at ~512 chained replaces, r10): the
        # mapInPandas rank-loop encoder is the only path here, so
        # this row is the module's 100 TB segmentation evidence.
        prod_merges = [(l, r) for l, r, _ in prod_rules]
        docs = docs.persist()
        docs.count()
        seg2k_times = []
        totals = None
        for _ in range(REPS):
            t0 = time.time()
            totals = bpe_segment_prod(docs, prod_merges).agg(
                F.sum("n_subwords").alias("subs"),
                F.sum("n_bpe_words").alias("words"),
                F.sum("n_base_chars").alias("chars")).collect()[0]
            seg2k_times.append(round(time.time() - t0, 3))

        # identity check on a slice: re-encode a deterministic 1k-doc
        # sample with the TEXTBOOK sequential encoder (pure Python,
        # merges applied in rank order, L-to-R non-overlapping) and
        # compare all three per-doc counts.
        import re as _re

        def seq_count(word: str) -> int:
            # the INDEPENDENT referee: merges applied sequentially in
            # rank order, L-to-R non-overlapping — the textbook
            # semantics the expression path executes, NOT the
            # rank-loop encoder under test
            syms = list(word)
            present = set(syms)
            for a, b in prod_merges:
                if len(syms) == 1:
                    break  # fully merged; later ranks are all no-ops
                if a not in present or b not in present:
                    continue  # pure speedup: the L-to-R pass is a
                    # no-op when either symbol is absent
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                if len(out) < len(syms):
                    present = set(out)
                syms = out
            return len(syms)

        slice_mod = int(os.environ.get("SPARK_GRAFT_BPE_SLICE_MOD",
                                       "5003"))
        sample = (docs.filter(F.col("doc_id") % slice_mod == 0)
                  .select("doc_id", "text").collect())
        got = {r["doc_id"]: r for r in bpe_segment_prod(
            docs.filter(F.col("doc_id") % slice_mod == 0), prod_merges)
            .collect()}
        word_ok = _re.compile(r"[a-z]+").fullmatch
        seq_cache: dict[str, int] = {}
        mismatches = 0
        for row_ in sample:
            if row_["text"] is None:
                # mirror the engine contract: F.size(NULL array) is
                # NULL, so the prod encoder emits (None, None, None)
                # for NULL text — the referee must expect the same,
                # not coerce to the empty string's (0, 0, 0)
                want3 = (None, None, None)
            else:
                nw = ns = nc = 0
                for w in row_["text"].strip(" ").split(" "):
                    if w and word_ok(w):
                        nw += 1
                        if w not in seq_cache:
                            seq_cache[w] = seq_count(w)
                        ns += seq_cache[w]
                        nc += len(w)
                want3 = (nw, ns, nc)
            g = got[row_["doc_id"]]
            if (g["n_bpe_words"], g["n_subwords"],
                    g["n_base_chars"]) != want3:
                mismatches += 1
        docs.unpersist()
        summary["prod_segment"] = {
            "tier": tier, "n_merges": len(prod_merges),
            "seg_times": seg2k_times, "seg_min": min(seg2k_times),
            "total_subwords": int(totals["subs"]),
            "total_words": int(totals["words"]),
            "total_chars": int(totals["chars"]),
            "slice_docs_checked": len(sample),
            "slice_mismatches": mismatches}
        print(json.dumps({"prod_segment": summary["prod_segment"]}),
              flush=True)
        assert mismatches == 0
        break

    base = summary["tiers"].get("sf0.1")
    for tier, ratio in (("sf1", 10), ("sf10", 100), ("sf100", 1000)):
        if base and tier in summary["tiers"]:
            t = summary["tiers"][tier]
            t["fit_ratio_vs_sf0.1"] = round(t["fit_min"] / base["fit_min"], 2)
            t["seg_ratio_vs_sf0.1"] = round(t["seg_min"] / base["seg_min"], 2)
            t["data_ratio"] = ratio
    with open(OUT_JSON, "w") as f:
        json.dump(summary, f, indent=2)
    print("wrote", OUT_JSON, flush=True)


if __name__ == "__main__":
    main()
