"""TPC-H-shaped analytics over the star schema — the multi-way-join /
computed-aggregate workloads a 100 TB deployment actually runs.

The reference's queries stop at two-table joins (SURVEY.md §2.3); the
driver's testdata is TPC-H-ish precisely so deeper shapes can be
exercised. Three canonical shapes:

- Q1 pricing summary: wide scan, computed expressions, grouped agg —
  pure map-side-combine throughput
- Q3 shipping priority: selective dimension filters -> 3-way join ->
  top-k (TakeOrderedAndProject)
- Q5 local supplier volume: 5-way join with two tiny broadcast dims
  (region/nation) and co-keyed fact joins

All expressed declaratively; Catalyst orders the joins, AQE picks
broadcast for the small sides at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .money import dec_avg, dec_sum, units, units_sum

# TPC-H money expressions in exact integer cents (analytics/money.py:
# double summation is order-dependent and fails the exact-hash oracle
# gate; a decimal formulation was 3.4x slower than this on Q1).
# price cents * (100 - discount cents) -> 10^-4 dollar units, exact
# longs end to end; * (100 + tax cents) -> 10^-6 units.


def _disc_price_e4() -> Column:
    return units("l_extendedprice") * (100 - units("l_discount"))


def q1_pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    charge_e6 = _disc_price_e4() * (100 + units("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") < ship_before)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            units_sum(_disc_price_e4(), 4).alias("sum_disc_price"),
            units_sum(charge_e6, 6).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount", 2, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """Q6: highly selective scan-and-aggregate — every predicate pushes
    to the parquet scan, the aggregation is a single partial+final sum."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(units_sum(units("l_extendedprice") * units("l_discount"), 4)
             .alias("revenue"))
    )


def q3_shipping_priority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, segment: str = "BUILDING",
                         cutoff: str = "1995-03-15", k: int = 10) -> DataFrame:
    revenue = _disc_price_e4()
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(units_sum(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
    )


def q5_local_supplier_volume(region: DataFrame, nation: DataFrame,
                             customer: DataFrame, supplier: DataFrame,
                             orders: DataFrame, lineitem: DataFrame,
                             region_name: str = "ASIA") -> DataFrame:
    """Revenue by nation where customer and supplier share the nation.
    region/nation are broadcast (tiny); the fact joins carry the bulk."""
    revenue = _disc_price_e4()
    return (
        region.filter(F.col("r_name") == region_name)
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(units_sum(revenue, 4).alias("revenue"))
    )
