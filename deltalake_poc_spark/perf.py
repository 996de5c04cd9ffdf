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


def salted_aggregate(df: DataFrame, group_cols: list[str],
                     agg_exprs: dict[str, str], n_salts: int = 16) -> DataFrame:
    """Two-stage aggregation for hot group keys: partial-aggregate by
    (key, salt), then final-aggregate by key. Only decomposable
    aggregates are supported (count/sum/min/max). Spark's hash
    aggregate already does map-side partials; the explicit salt stage
    additionally splits a single hot REDUCER key across ``n_salts``
    tasks."""
    supported = {"count", "sum", "min", "max"}
    bad = {fn for fn in agg_exprs.values()} - supported
    if bad:
        raise ValueError(f"non-decomposable aggregates: {bad}")
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                     F.lit(n_salts)).cast("int"))
    partial_aggs, final_aggs = [], []
    for col, fn in agg_exprs.items():
        partial_name = f"__p_{col}_{fn}"
        if fn == "count":
            partial_aggs.append(F.count(col).alias(partial_name))
            final_aggs.append(F.sum(partial_name).alias(f"{fn}_{col}"))
        else:
            partial_aggs.append(getattr(F, fn)(col).alias(partial_name))
            final_fn = F.sum if fn == "sum" else getattr(F, fn)
            final_aggs.append(final_fn(partial_name).alias(f"{fn}_{col}"))
    partial = salted.groupBy(*group_cols, SALT).agg(*partial_aggs)
    return partial.groupBy(*group_cols).agg(*final_aggs)


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 32, sort: bool = True) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Joins between tables bucketed on the same key with the same count
    skip the shuffle entirely (test_perf.py pins the no-Exchange plan)."""
    writer = df.write.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)
