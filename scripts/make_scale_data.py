#!/usr/bin/env python3
"""Build a scaled derivative of the driver's testdata for scaling runs.

The 100 TB design claims in the operator docstrings are argued from
plan shape at sf0.1; this script buys *measured* evidence one decade
up: it replicates ``/root/testdata/sf0.1`` ``REPLICAS``x (default 10x
~= sf1) with remapped keys into a local scratch dir that the ordinary
``queries()`` entry points can consume (same file names, so
``fn(spark, OUT_DIR)`` just works). The driver's testdata is
read-only and is never touched.

Replica design — the point is that per-operator OUTPUT sizes scale
LINEARLY, so a super-linear wall-time is the engine's fault, not the
workload's:

- ``documents``: replica r > 0 maps every whitespace token t to a
  character ROTATION of t + str(r) (rotate by r mod (len+1)). The
  mapping is bijective per replica and token vocabularies across
  replicas are disjoint (the replica digit is embedded), so
  n-gram/MinHash/SimHash pair structure within each replica mirrors
  sf0.1 exactly and NO cross-replica near-dup pairs appear — pair
  counts scale by exactly R rather than R^2 (naive copying would
  make every doc a 10-way duplicate and quadratically blow up every
  dedup operator). Rotation, not a plain suffix: the oracle-portable
  polynomial token hash is AFFINE under a shared suffix, so suffixed
  replicas produced correlated SimHash signatures and a 57x
  cross-replica pair blow-up; rotating the characters destroys that
  affinity (measured: simhash pair growth drops back to ~R).
- ``embeddings``: replica r flips the sign of component i where
  xxhash64(r, i) is odd. A shared sign pattern preserves every
  within-replica inner product bit-for-bit (same pair structure),
  while cross-replica cosines decorrelate into +/- sums (the
  circular-shift variant left shifted cluster centroids aligned
  across replicas: 108x near-dup pair growth; sign flips measured
  back at ~R).
- facts/dims (``customer/orders/lineitem/part/supplier/events``):
  keys get per-replica offsets, consistently across foreign keys;
  values/timestamps stay as-is, so group cardinalities scale by R
  and per-key densities (e.g. events per user) stay constant.
- ``nation``/``region``: fixed dimensions, copied once (as in TPC-H).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALE_OUT", "/root/repo/.scale/sf1")

# key offsets, all far above any base-key range at sf0.1
DOC_OFF = 10_000_000
VEC_OFF = 10_000_000
USER_OFF = 1_000_000
EVENT_OFF = 100_000_000
CUST_OFF = 10_000_000
ORDER_OFF = 100_000_000
PART_OFF = 10_000_000
SUPP_OFF = 1_000_000


def main() -> None:
    from deltalake_poc_spark.analytics.io import load_table
    from deltalake_poc_spark.session import EngineConfig, get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(EngineConfig(
        app_name="make_scale_data", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus)))

    os.makedirs(OUT, exist_ok=True)
    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("rep"))

    def fan(name):
        # replicate via a broadcast cross join against the replica ids:
        # R-way row explosion. The base tables are single parquet files,
        # so without a repartition the whole explosion (and any per-row
        # transform above it) runs in ONE task — spread the tiny base
        # across the cores first so the fan-out parallelizes.
        return (load_table(spark, SRC, name)
                .repartition(int(cpus))
                .crossJoin(F.broadcast(reps)))

    # file counts scale with the replica factor (targeting ~100-200 MB
    # per file at any REPLICAS) so the write shuffle stays wide and
    # reads get enough splits without relying on row-group splitting
    filemult = max(1, min(16, REPLICAS // 10))

    def write(df, name, files):
        files = min(256, files * filemult)
        path = os.path.join(OUT, f"{name}.parquet")
        shutil.rmtree(path, ignore_errors=True)
        (df.repartition(files).write.mode("overwrite").parquet(path))
        print(f"wrote {name}: {spark.read.parquet(path).count()} rows")

    rep = F.col("rep")
    rep_l = rep.cast("long")

    # documents: disjoint, hash-decorrelated per-replica vocabularies
    # (see module doc): token t -> rotate(t + digit, rep % (len+1))
    rot = ("transform(split(text, ' '), t -> concat("
           "substr(concat(t, cast(rep as string)),"
           "       (rep % (length(t) + 1)) + 1),"
           "substr(concat(t, cast(rep as string)), 1,"
           "       rep % (length(t) + 1))))")
    docs = fan("documents").select(
        (F.col("doc_id") + rep_l * DOC_OFF).alias("doc_id"),
        F.when(rep == 0, F.col("text")).otherwise(
            F.array_join(F.expr(rot), " ")).alias("text"),
        "lang", "source")
    docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    write(docs, "documents", 8)

    # embeddings: per-replica deterministic sign flips — within-replica
    # inner products preserved exactly, cross-replica decorrelated
    write(
        fan("embeddings").select(
            (F.col("vec_id") + rep_l * VEC_OFF).alias("vec_id"),
            F.when(rep == 0, F.col("embedding")).otherwise(F.expr(
                "transform(embedding, (x, i) -> CAST(CASE WHEN "
                "pmod(xxhash64(rep, i), 2) = 0 THEN x ELSE -x END "
                "AS FLOAT))"
            )).alias("embedding"),
            # labels are cluster/blocking ids: a bigger corpus has
            # proportionally more clusters, so replicas get disjoint
            # label spaces (keeping them shared makes within-block
            # candidate generation quadratic across replicas AND lets
            # the ~N(0, 1/sqrt(dim)) tail of decorrelated cosines leak
            # past moderate thresholds at the 10^7-candidate scale —
            # both measured before this offset existed)
            (F.col("label") + rep * 1000).alias("label")),
        "embeddings", 4)

    write(
        fan("events").select(
            (F.col("event_id") + rep_l * EVENT_OFF).alias("event_id"),
            "ts",
            (F.col("user_id") + rep_l * USER_OFF).alias("user_id"),
            "event_type", "value", "props"),
        "events", 8)

    write(
        fan("customer").select(
            (F.col("c_custkey") + rep_l * CUST_OFF).alias("c_custkey"),
            F.when(rep == 0, F.col("c_name")).otherwise(
                F.concat(F.col("c_name"), F.lit("#"),
                         rep.cast("string"))).alias("c_name"),
            "c_nationkey", "c_acctbal", "c_mktsegment"),
        "customer", 4)

    write(
        fan("orders").select(
            (F.col("o_orderkey") + rep_l * ORDER_OFF).alias("o_orderkey"),
            (F.col("o_custkey") + rep_l * CUST_OFF).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority"),
        "orders", 4)

    write(
        fan("lineitem").select(
            (F.col("l_orderkey") + rep_l * ORDER_OFF).alias("l_orderkey"),
            (F.col("l_partkey") + rep_l * PART_OFF).alias("l_partkey"),
            (F.col("l_suppkey") + rep_l * SUPP_OFF).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
        "lineitem", 16)

    part_cols = load_table(spark, SRC, "part").columns
    write(
        fan("part").select(
            (F.col("p_partkey") + rep_l * PART_OFF).alias("p_partkey"),
            *[c for c in part_cols if c != "p_partkey"]),
        "part", 2)

    supp_cols = load_table(spark, SRC, "supplier").columns
    write(
        fan("supplier").select(
            (F.col("s_suppkey") + rep_l * SUPP_OFF).alias("s_suppkey"),
            *[c for c in supp_cols if c != "s_suppkey"]),
        "supplier", 1)

    for name in ("nation", "region"):
        write(load_table(spark, SRC, name), name, 1)

    print(f"scale derivative complete at {OUT} ({REPLICAS}x {SRC})")


if __name__ == "__main__":
    main()
