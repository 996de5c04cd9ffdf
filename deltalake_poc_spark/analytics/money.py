"""Deterministic money/measure aggregation (cross-engine exact).

``ROUND(SUM(double), 2)`` is summation-order dependent: Spark's
partial aggregation adds in a different order than a single-threaded
engine, and at sf0.01 ~30/6332 ``order_analytics`` groups flipped the
2nd decimal against DuckDB (r1 driver gate, confirmed root cause).

The fix: snap each addend to INTEGER UNITS (cents) with

    floor(x * 10^scale + 0.5)        -- "units()"

then SUM the longs (exact, order-independent) and divide by 10^scale
at the very end. Why this exact formulation:

- floor(x*10^s + 0.5) is pure double arithmetic + floor — the SAME
  IEEE operations in every engine produce the SAME integer, so
  cross-engine equality holds by construction (no dependence on each
  engine's double->decimal cast or rounding-tie convention);
- long sums stay inside whole-stage codegen / vectorized exec. A
  DECIMAL formulation was measured 3.4x slower on TPC-H Q1 at sf0.1
  (per-row BigDecimal); the cents path matches the raw double sum's
  speed while being exact;
- the final integer/10^s division is one correctly-rounded double op,
  identical in both engines.

Overflow bound: a LONG holds sums to ~9.2e18 units. For the widest
expression here (charge, 10^-6 dollar units) that is ~9.2e12 dollars
per group — two orders of magnitude above a 100 TB TPC-H group. Cast
the product to decimal(38,0) before SUM if you ever exceed it. The
AVG quotient divides as DECIMAL (per group, cheap), so it is exact to
the same long bound — a long/long double division would cap it at
2^53 (~4.5e11 dollars per group at scale=2).

AVG rounds half-up at ``nd`` decimals in pure integer arithmetic
(``(2*K*S + M*n) div (2*M*n)``) because rounding a double quotient is
NOT portable: a 2-row group with an odd cent total averages exactly
``x.xx5``, and Spark (shortest-decimal-string HALF_UP) and DuckDB
(scaled-float round) disagree on which side that falls (53/6332
groups at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _col(col: Column | str) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def units(col: Column | str, scale: int = 2) -> Column:
    """x as a LONG count of 10^-scale units: floor(x*10^s + 0.5).
    Oracle mirror: ``CAST(FLOOR(x * 10^s + 0.5) AS BIGINT)``."""
    return F.floor(_col(col) * (10 ** scale) + F.lit(0.5))


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM at ``scale`` decimals, exposed as double.
    Oracle mirror::

        CAST(SUM(CAST(FLOOR(x * 10^s + 0.5) AS BIGINT)) AS BIGINT)
            / 10^s.0
    """
    return (F.sum(units(col, scale)) / float(10 ** scale))


def units_sum(unit_expr: Column, scale: int) -> Column:
    """SUM an integer-units product expression (e.g. cents * (100 -
    discount_cents)) and rescale to dollars as double."""
    return F.sum(unit_expr) / float(10 ** scale)


def dec_avg(col: Column | str, scale: int = 2, nd: int = 2) -> Column:
    """Order-independent AVG rounded half-up at ``nd`` decimals, for
    POSITIVE measures (money, quantities); requires nd >= scale.
    All-integer arithmetic. Oracle mirror (DuckDB ``//``)::

        CAST((2*K*S + M*COUNT(x)) // (2*M*COUNT(x)) AS DOUBLE) / K.0
        with S = CAST(SUM(CAST(FLOOR(x*M + 0.5) AS BIGINT)) AS BIGINT),
             M = 10^scale, K = 10^nd
    """
    if nd < scale:
        raise ValueError("dec_avg needs nd >= scale")
    c = _col(col)
    K, M = 10 ** nd, 10 ** scale
    s_units = F.sum(units(c, scale))
    n = F.count(c)
    num = F.lit(2 * K) * s_units + F.lit(M) * n
    den = F.lit(2 * M) * n
    # exact integer division: subtract the remainder (long ops, exact),
    # then divide as DECIMAL. A long/long division runs through doubles
    # and is only exact while num <= 2^53 (~4.5e11 dollars per group at
    # scale=2); the decimal quotient is exact all the way to the long
    # overflow bound. This runs once per GROUP post-aggregation, so the
    # per-row BigDecimal cost that made decimal aggregation 3.4x slower
    # does not apply.
    q = ((num - num % den).cast("decimal(38,0)") / den).cast("double")
    return q / F.lit(float(K))
