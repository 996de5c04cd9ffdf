"""Deterministic money/measure aggregation (cross-engine exact).

``ROUND(SUM(double), 2)`` is summation-order dependent: Spark's
partial aggregation adds in a different order than a single-threaded
engine, and at sf0.01 ~30/6332 ``order_analytics`` groups flipped the
2nd decimal against DuckDB (r1 driver gate, confirmed root cause).

The fix makes the addition exact instead of hoping the rounding hides
it:

1. cast each addend to DECIMAL — a double→decimal cast can never hit a
   rounding tie (``x.5 * 10^-s`` is not representable in binary for
   s >= 1), so the cast picks the same decimal in every engine;
2. SUM the decimals — exact integer arithmetic, order-independent;
3. round in decimal (ties are exact and both Spark's HALF_UP and
   DuckDB round half away from zero — identical for all signs);
4. cast to double only at the very end (correctly-rounded, identical).

For AVG, rounding a double quotient is NOT safe: a group of 2 orders
with an odd total in cents has an average of exactly ``x.xx5`` dollars,
and Spark (shortest-decimal-string HALF_UP) and DuckDB (scaled-float
round) disagree on which side such a quotient falls (53/6332 groups at
sf0.01).  So the rounded average is computed entirely in integer
arithmetic: with S = sum in 10^-scale units, n = count, K = 10^nd,
M = 10^scale, the half-up-rounded average is

    (2*K*S + M*n) div (2*M*n) / K        (positive domain)

— exact integer ops in both engines, bit-identical by construction.

Keep precisions tight (the defaults fit TPC-H money columns) so that
decimal products stay well inside 38 digits and remain exact.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact decimal view of a double measure column."""
    c = col if isinstance(col, Column) else F.col(col)
    return c.cast(f"decimal({precision},{scale})")


def dec_sum(col: Column | str, scale: int = 2, nd: int = 2,
            precision: int = 18) -> Column:
    """Order-independent SUM over a double column, rounded at ``nd``
    decimals, exposed as double.  Oracle mirror::

        CAST(ROUND(SUM(CAST(x AS DECIMAL(p,s))), nd) AS DOUBLE)
    """
    return F.round(F.sum(as_dec(col, scale, precision)), nd).cast("double")


def dec_avg(col: Column | str, scale: int = 2, nd: int = 2,
            precision: int = 18) -> Column:
    """Order-independent AVG rounded half-up at ``nd`` decimals, for
    POSITIVE measures (money, quantities).  All-integer arithmetic; see
    module docstring.  Oracle mirror (DuckDB ``//`` = integer div)::

        CAST((2*K*S + M*COUNT(x)) // (2*M*COUNT(x)) AS DOUBLE) / K.0
        with S = CAST(SUM(CAST(CAST(x AS DECIMAL(p,s)) * M AS BIGINT)) AS BIGINT)
    """
    c = col if isinstance(col, Column) else F.col(col)
    K, M = 10 ** nd, 10 ** scale
    s_units = F.sum((as_dec(c, scale, precision) * M).cast("long"))
    n = F.count(c)
    num = F.lit(2 * K) * s_units + F.lit(M) * n
    den = F.lit(2 * M) * n
    # integer division via (num - num % den) / den: the numerator is an
    # exact multiple of den as a long, so the double division is exact
    # (Column has no `div`; floor(double/) would be off-by-one-ulp unsafe)
    q = (num - num % den) / den
    return (q / F.lit(float(K))).alias("avg")
