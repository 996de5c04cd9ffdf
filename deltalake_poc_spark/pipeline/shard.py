"""Deterministic global shuffle + shard export for training data.

The last step of a training-data pipeline is writing the curated
corpus as N shard files in a REPRODUCIBLE pseudorandom order:
training jobs stream shards round-robin, so (a) every shard must be
a statistically uniform slice of the corpus (no source/time
clustering — the order documents were crawled or stored in must not
survive into the shard order), and (b) re-running the export must
produce byte-identical shards or training runs aren't reproducible.
``df.orderBy(rand())`` fails both (seeded rand is
partitioning-dependent); a total sort by a content key fails (a) by
clustering similar keys. The standard answer — what this module
implements — is hash-ordering: shard and within-shard position both
derive from a salted deterministic hash of the stable document key
(the same quadratic-Lehmer mix as pipeline/sample.py, so any engine
can recompute the layout).

Scale shape: assignment is row-local arithmetic at the scan; the
single exchange hash-partitions on shard id (choose ``n_shards`` so
a shard is a few GB — 100 TB => tens of thousands of shards); the
within-shard order is a sortWithinPartitions (external sort, spills
cleanly, no global total-order barrier — shards are mutually
independent, unlike a global orderBy whose range partitioner needs a
sampling pass). Position numbers come from a per-shard window over
the already-sorted partition. The salt separates the two hash roles:
with shard = order-hash % N, a shard would contain exactly the keys
congruent to its id in hash space and the within-shard order would
be a sorted hash interval — deterministic but CORRELATED; salting
makes shard choice and order independent mixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sample import key_bucket

_ORDER_SALT_OFFSET = 1_000_003  # prime offset: order-hash never the
# shard-hash (two quadratic mixes of congruent inputs stay distinct)


def shard_plan(docs: DataFrame, n_shards: int = 16,
               key_col: str = "doc_id", salt: int = 0,
               payload_cols: tuple[str, ...] = ()) -> DataFrame:
    """(key, shard, pos, *payload): the full deterministic layout.

    ``pos`` is the 0-based position within the shard in hash order
    (ties — only possible for colliding buckets — break by key, so
    the layout is total and engine-independent)."""
    shard = key_bucket(key_col, salt) % n_shards
    order = key_bucket(key_col, salt + _ORDER_SALT_OFFSET)
    w = (Window.partitionBy("shard")
         .orderBy(F.col("__ord").asc(), F.col(key_col).asc()))
    return (docs.select(key_col, *payload_cols,
                        shard.cast("int").alias("shard"),
                        order.alias("__ord"))
            .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
            .drop("__ord"))


def write_shards(docs: DataFrame, root: str, n_shards: int = 16,
                 key_col: str = "doc_id", salt: int = 0,
                 payload_cols: tuple[str, ...] = ("text",)) -> None:
    """Materialize the layout as ``shard=K/`` parquet directories,
    rows stored in shard order.

    One hash exchange on shard + an in-partition sort — no global
    sort barrier. ``repartition(n_shards, shard)`` maps each shard to
    exactly one task, so each directory holds one ordered file per
    write (plus ``pos`` for readers that need to verify or seek)."""
    plan = shard_plan(docs, n_shards=n_shards, key_col=key_col,
                      salt=salt, payload_cols=payload_cols)
    (plan.repartition(n_shards, F.col("shard"))
         .sortWithinPartitions("shard", "pos")
         .write.mode("overwrite").partitionBy("shard").parquet(root))


def shard_manifest(docs: DataFrame, n_shards: int = 16,
                   key_col: str = "doc_id", salt: int = 0,
                   token_col: str | None = None) -> DataFrame:
    """Per-shard manifest: row count, key checksum (exact int64 sum of
    order-hashes — position-sensitive layouts hash-verify without
    reading payloads), and optional token total for balance checks."""
    shard = key_bucket(key_col, salt) % n_shards
    order = key_bucket(key_col, salt + _ORDER_SALT_OFFSET)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__ord").alias("order_checksum")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    return (docs.select(shard.cast("int").alias("shard"),
                        order.alias("__ord"),
                        *([token_col] if token_col else []))
            .groupBy("shard").agg(*aggs).orderBy("shard"))
