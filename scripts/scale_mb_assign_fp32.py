#!/usr/bin/env python3
"""Round-9 follow-up to SCALE_RUN_MB_ASSIGN.json (r8 verdict #5):
measure fp32 sgemm for the sketch-regime assignment against the r8
fp64 dgemm mode — sgemm halves bandwidth and doubles FLOP rate; the
question is whether the wider (~1e-7-relative) tie window flips any
assignments on real data.

Same fit as the r8 run (minibatch k=8000, seed=7, sf100 embeddings),
then: full-corpus gemm (fp64) pass, full-corpus gemm32 (fp32) pass,
and THREE-way agreement on a deterministic 200k slice (fp32 vs fp64
gemm, and fp32 vs the exact-order arrow fold). Ship gemm32 only if
agreement is ~100%; otherwise this artifact records the why-not.

Writes SCALE_RUN_MB_ASSIGN_FP32.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")  # 32 tasks x 1 BLAS thread
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

OUT = "/root/repo/SCALE_RUN_MB_ASSIGN_FP32.json"


def main() -> None:
    from pyspark.sql import functions as F

    from deltalake_poc_spark.pipeline import cluster as C
    from deltalake_poc_spark.session import EngineConfig, get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(EngineConfig(app_name="scale_mb_assign_fp32",
                                   master="local[32]",
                                   shuffle_partitions=32))
    emb = spark.read.parquet("/root/repo/.scale/sf100/embeddings.parquet")
    n = emb.count()
    res: dict = {"n_vectors": n, "k": 8000}

    t0 = time.time()
    cents = C.kmeans_fit_minibatch(emb, k=8000, sample_size=100_000, seed=7)
    res["minibatch_fit_sec"] = round(time.time() - t0, 1)
    print(json.dumps({"stage": "fit", **res}), flush=True)

    for mode in ("gemm32", "gemm"):
        t0 = time.time()
        cnt = (C.kmeans_assign(emb, cents, mode=mode)
               .groupBy("cluster").count()
               .agg(F.count(F.lit(1)), F.sum("count")).collect())
        res[f"assign_{mode}_sec"] = round(time.time() - t0, 1)
        res[f"assign_{mode}_clusters"] = int(cnt[0][0])
        print(json.dumps({"stage": mode,
                          "sec": res[f"assign_{mode}_sec"]}), flush=True)

    sl = emb.orderBy("vec_id").limit(200_000)
    g64 = C.kmeans_assign(sl, cents, mode="gemm") \
        .withColumnRenamed("cluster", "g64")
    g32 = C.kmeans_assign(sl, cents, mode="gemm32") \
        .withColumnRenamed("cluster", "g32")
    a = C.kmeans_assign(sl, cents, mode="arrow") \
        .withColumnRenamed("cluster", "a")
    j = g64.join(g32, "vec_id").join(a, "vec_id")
    res["agree_slice_rows"] = j.count()
    res["fp32_vs_fp64_disagreements"] = j.filter(
        F.col("g32") != F.col("g64")).count()
    res["fp32_vs_exact_disagreements"] = j.filter(
        F.col("g32") != F.col("a")).count()
    res["speedup_fp32_vs_fp64"] = round(
        res["assign_gemm_sec"] / max(res["assign_gemm32_sec"], 1e-9), 2)

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
