"""Bulk literal-array construction in ONE py4j round trip.

The naive ``F.array(*[F.lit(x) for x in xs])`` costs one py4j call per
element (~1 ms each): a k=16 x dim=64 centroid matrix is ~1k calls,
~1-3 s of pure DRIVER time per DataFrame construction — paid again on
every call because Columns are rebuilt per query (measured: pq_encode
build 2.6 s warm, kmeans_fit 3.5 s warm, on KB-sized inputs; the
Lloyd loop and every streaming micro-batch rebuild these literals).

``F.expr`` ships the whole array as one SQL string instead: the JVM
parser materializes the identical ``CreateArray(Literal...)`` tree in
milliseconds. ``%.17e`` is a shortest-exact text round trip for IEEE
doubles (verified bit-identical through the parser for gaussians,
denormals, ±0.0 and 1e308; optimized plans equal modulo exprIds), and
exponent-form numeric literals parse as DOUBLE in Spark SQL. Integer
literals take an ``L`` suffix (BIGINT), matching the previous
``F.lit(int).cast("long")`` after constant folding.

Non-finite doubles (inf/nan) have no SQL literal form — those fall
back to the per-element path (no current caller produces them).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _finite(vals) -> bool:
    return all(math.isfinite(v) for v in vals)


def _d(v: float) -> str:
    return f"{float(v):.17e}"


def lit_double_array(vals) -> Column:
    """``array<double>`` literal column from a Python sequence."""
    vals = list(vals)
    if not vals or not _finite(vals):
        return F.array(*[F.lit(float(v)) for v in vals])
    return F.expr("array(" + ",".join(_d(v) for v in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal column (row-major)."""
    rows = [list(r) for r in rows]
    if not rows or not all(_finite(r) for r in rows):
        return F.array(*[lit_double_array(r) for r in rows])
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(_d(v) for v in r) + ")" for r in rows)
        + ")")


def lit_long_array(vals) -> Column:
    """``array<bigint>`` literal column from Python ints."""
    vals = [int(v) for v in vals]
    if not vals:
        return F.array().cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")


def sql_double_array(vals) -> str:
    """The SQL text of an ``array<double>`` literal (exact %.17e).

    Unlike lit_double_array there is no Column fallback to return, so
    non-finite values (no SQL literal form — 'nan'/'inf' tokens parse
    as unresolved identifiers) fail loudly here instead of as a
    confusing AnalysisException from generated SQL."""
    vals = list(vals)
    if not _finite(vals):
        raise ValueError(
            "sql_double_array: non-finite value has no SQL literal "
            "form; route non-finite inputs through the F.lit path")
    return "array(" + ",".join(_d(v) for v in vals) + ")"


def sql_fold_dot(vec_sql: str, weights) -> str:
    """SQL text of the canonical left-fold dot product against a
    literal weight vector — the exact expression
    ``F.aggregate(F.zip_with(vec, lit, (x, y) -> CAST(x AS DOUBLE) * y),
    0.0, (acc, x) -> acc + x)`` builds, produced in one string so a
    loop over many weight vectors costs one py4j call total instead of
    ~30 per vector."""
    return (f"aggregate(zip_with({vec_sql}, {sql_double_array(weights)}, "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)")


def sql_double_matrix(rows) -> str:
    """SQL text of an ``array<array<double>>`` literal (row-major)."""
    return "array(" + ",".join(sql_double_array(r) for r in rows) + ")"


def sql_fold_sqdist_over(vec_sql: str, rows) -> str:
    """SQL text of ``transform(<matrix literal>, c -> <left-fold squared
    distance from vec to c>)`` — the per-centroid distance array the PQ
    encode/ADC paths build per subspace. One py4j call replaces ~40."""
    return (f"transform({sql_double_matrix(rows)}, c -> "
            f"aggregate(zip_with({vec_sql}, c, (x, y) -> "
            "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            "0.0D, (acc, x) -> acc + x))")


def sql_argmin_over(vec_sql: str, rows) -> str:
    """SQL text of the first-min argmin over the same distances:
    ``array_min`` over (d, i) structs — struct comparison orders by d
    then i, so ties break to the LOWEST index exactly like
    array_position's first match. Returns an INT column expression."""
    return (f"CAST(array_min(transform({sql_double_matrix(rows)}, (c, i) -> "
            f"struct(aggregate(zip_with({vec_sql}, c, (x, y) -> "
            "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            "0.0D, (acc, x) -> acc + x) AS d, i AS i)))['i'] AS INT)")
