"""Z-order clustering for OPTIMIZE — multi-column data skipping.

Range-partitioning by (a, b) clusters files tightly on ``a`` but
leaves ``b`` spanning its full range in every file, so per-file
[min,max] stats prune only on the leading column. Interleaving the
bits of the columns' bucket numbers (Morton order) gives every
clustered column locality, so file stats become selective on ALL of
them — this is what Delta's OPTIMIZE ZORDER BY does; re-built here
with plain column expressions.

Bucketing is linear between the observed min/max (one tiny agg pass).
Rank-based bucketing (quantiles) would handle skewed distributions
better — swap ``_bucket`` for a width_bucket over approxQuantile
boundaries if that matters for your data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__zorder"


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear bucket id in [0, 2^bits) for a numeric column."""
    n = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(F.greatest((scaled * n).cast("long"), F.lit(0)),
                   F.lit(n)).cast("long")


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton (bit-interleaved) value over ``cols``. One driver-side
    min/max agg sizes the buckets; the interleave itself is a closed
    column expression (bits x ncols shift-or terms)."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    buckets = [
        _bucket(F.col(c), row[f"__lo_{c}"] or 0.0, row[f"__hi_{c}"] or 0.0, bits)
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, b in enumerate(buckets):
            src_bit = F.shiftright(b, bit).bitwiseAND(F.lit(1))
            z = z + (src_bit * F.lit(1 << (bit * len(cols) + ci))).cast("long")
    return z


def apply_zorder(df: DataFrame, cols: list[str], n_files: int,
                 bits: int = 16) -> DataFrame:
    """Repartition+sort by the Morton value so each output file covers
    a compact hyper-rectangle of the clustered columns."""
    numeric = {"int", "bigint", "smallint", "tinyint", "double", "float",
               "date", "timestamp"}
    dtypes = dict(df.dtypes)
    for c in cols:
        base = dtypes[c].split("(")[0]
        if base not in numeric:
            # non-numeric key: fall back to lexicographic clustering
            return (df.repartitionByRange(n_files, *cols)
                    .sortWithinPartitions(*cols))
    z = zorder_value(df, cols, bits)
    return (
        df.withColumn(Z_COL, z)
        .repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
    )
