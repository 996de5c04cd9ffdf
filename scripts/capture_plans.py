#!/usr/bin/env python3
"""Capture .explain("formatted") for every registered query.

Writes plans/r12/<query>_<tag>.txt for each entry in queries() +
bench_extra_queries(). Usage:

    python3 scripts/capture_plans.py <tag> [only,names,...]

The session mirrors bench.py (local[$SPARK_GRAFT_CPUS], engine confs)
so the captured plan is the one the bench actually runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"))
    os.makedirs(outdir, exist_ok=True)

    from deltalake_poc_spark.session import EngineConfig, get_spark
    spark = get_spark(EngineConfig(
        app_name="capture_plans", master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)),
    ))
    import __spark_entry__ as entrymod
    qs = dict(entrymod.queries())
    qs.update(entrymod.bench_extra_queries())

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {e}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(f"{name}: {time.time()-t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
