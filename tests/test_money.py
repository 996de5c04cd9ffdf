"""Property tests for the exact money-aggregation layer: the cents
formulation must agree with an exact decimal.Decimal reference for the
round-half-up semantics it claims, on any input."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from deltalake_poc_spark.analytics.money import dec_avg, dec_sum, units

# 2dp money values as cents so the *intended* value is exact
cents_lists = st.lists(st.integers(min_value=1, max_value=10_000_000),
                       min_size=1, max_size=8)


@settings(max_examples=12, deadline=None)
@given(cents_lists)
def test_dec_sum_and_avg_match_decimal_reference(spark, cents):
    vals = [float(Decimal(c) / 100) for c in cents]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = df.agg(
        dec_sum("x").alias("s"),
        dec_avg("x").alias("a"),
        F.sum(units("x")).alias("u"),
    ).collect()[0]

    exact = [Decimal(c) / 100 for c in cents]
    assert row["u"] == sum(cents)  # units() recovers the exact cents
    assert Decimal(str(row["s"])) == sum(exact)
    want_avg = (sum(exact) / len(exact)).quantize(
        Decimal("0.01"), rounding=ROUND_HALF_UP)
    assert Decimal(str(row["a"])) == want_avg


def test_dec_avg_half_up_on_exact_ties(spark):
    """The r1 killer case: 2 rows with an odd cent total -> the average
    is exactly x.xx5 and must round HALF-UP, deterministically."""
    df = spark.createDataFrame([(100.01,), (100.02,)], "x double")
    row = df.agg(dec_avg("x").alias("a")).collect()[0]
    assert row["a"] == 100.02  # 100.015 rounds up, never banker's-down
