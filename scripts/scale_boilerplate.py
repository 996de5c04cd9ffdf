#!/usr/bin/env python3
"""Show what the hot-gram cap (max_df) does at scale — and why.

The driver corpus is too diverse for any gram to cross max_df=100
naturally (measured max df = 25 at sf0.1, invariant per replica by
the derivative's design), so this experiment injects the real-world
condition the cap exists for — site boilerplate — into the 10x
derivative: every Nth document gets the same 12-token header
prepended, so each header gram's document frequency is ~50000/N.

Two effects, both measured at two contamination densities:

1. SEMANTICS: without the cap, two short pages sharing only the
   boilerplate header can clear the 0.15 Jaccard threshold — tens of
   thousands of header-only "near-dup" pairs that no curation policy
   wants (the dedup literature strips boilerplate for exactly this
   reason). The cap removes those grams from the evidence, so the
   pair set returns to content-driven pairs only.
2. WORK: the inverted-index self-join emits ~sum_g C(df_g, 2)
   candidates; a gram with df=d contributes d^2/2 pairs, so
   boilerplate's cost grows QUADRATICALLY with corpus size while the
   capped operator stays on the corpus's linear pair budget. At low
   density the cap's extra DF pass costs more than it saves; at high
   density the uncapped join falls off the quadratic cliff.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BOILER = ("subscribe to our newsletter for updates and follow the "
          "official channel")
SF_BIG = os.environ.get("SPARK_GRAFT_SCALE_OUT", "/root/repo/.scale/sf1")
DENSITIES = (37, 11)  # every Nth doc contaminated: ~1.4k and ~4.5k docs


def main() -> None:
    from deltalake_poc_spark.analytics.io import load_table
    from deltalake_poc_spark.pipeline.dedup import ngram_jaccard_pairs
    from deltalake_poc_spark.session import EngineConfig, get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(EngineConfig(
        app_name="scale_boilerplate", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus)))

    out = {}
    for every_n in DENSITIES:
        docs = load_table(spark, SF_BIG, "documents").withColumn(
            "text",
            F.when(F.col("doc_id") % every_n == 0,
                   F.concat(F.lit(BOILER + " "), F.col("text")))
            .otherwise(F.col("text")))
        docs.persist().count()
        dens = {}
        for label, max_df in (("capped_df100", 100), ("uncapped", None)):
            t0 = time.time()
            pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.15,
                                        max_df=max_df)
            n = pairs.count()
            dens[label] = {"sec": round(time.time() - t0, 2), "pairs": n}
            print(json.dumps({"density": f"1/{every_n}", label: dens[label]}),
                  flush=True)
        docs.unpersist()
        dens["header_only_pairs"] = (dens["uncapped"]["pairs"]
                                     - dens["capped_df100"]["pairs"])
        dens["uncapped_over_capped_time"] = round(
            dens["uncapped"]["sec"] / dens["capped_df100"]["sec"], 2)
        out[f"every_{every_n}"] = dens

    with open("/root/repo/SCALE_BOILERPLATE.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
