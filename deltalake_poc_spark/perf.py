"""Scale utilities: skew-salted joins and bucketed co-located joins.

Neither appears in the reference (its joins are tiny), but both are
load-bearing at 100 TB:

- ``salted_join``: when one join key is hot, AQE's skew-join split
  handles sort-merge cases; salting is the explicit fallback that also
  works for aggregations and older planners. The skewed side gets a
  random salt in [0, n); the compact side is replicated n ways.
- ``write_bucketed`` / bucketed reads: co-locate both sides of a
  recurring equi-join by pre-hashing into the same bucket count —
  repeated joins then plan with NO Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(skewed: DataFrame, compact: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the skewed side salted and the compact side
    replicated ``n_salts`` ways; result is identical to
    ``skewed.join(compact, on, how)`` for row-level join types.

    The salt must not change row multiplicity: it's derived per-row on
    the skewed side (uniform pseudo-random), and the compact side is
    exploded across every salt value so each (key, salt) pair finds its
    match."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salted = skewed.withColumn(
        SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                     F.lit(n_salts)).cast("int"))
    replicated = compact.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = salted.join(replicated, [on, SALT], how)
    return out.drop(SALT)


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 32, sort: bool = True) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Joins between tables bucketed on the same key with the same count
    skip the shuffle entirely (test_perf.py pins the no-Exchange plan)."""
    writer = df.write.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)
