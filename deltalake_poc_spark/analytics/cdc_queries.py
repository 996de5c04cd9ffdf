"""The reference's analytics queries over the CDC domain tables
(customers / products / orders / order_items / cdc_events) — the three
RisingWave materialized views, the notebook join/agg queries, and the
operational stats views, each as DataFrame-in → DataFrame-out so they
run batch, as MV refreshes, or over time-travel snapshots.

These are the domain-schema twins of the generalized queries in
analytics/queries.py (which the driver gate runs on the star schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def order_analytics(orders: DataFrame) -> DataFrame:
    """RisingWave MV ``order_analytics`` (init-risingwave.sql:73-81)."""
    return (
        orders.groupBy(
            F.date_trunc("day", F.col("order_date")).alias("order_day"),
            F.col("status"),
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum("total_amount").alias("total_revenue"),
            F.avg("total_amount").alias("avg_order_value"),
        )
    )


def customer_order_summary(customers: DataFrame, orders: DataFrame) -> DataFrame:
    """RisingWave MV ``customer_order_summary`` (init-risingwave.sql:84-94)
    / notebook cell 30."""
    o = orders.select("customer_id", "id", "total_amount")
    return (
        customers.alias("c")
        .join(o.alias("o"), F.col("c.id") == F.col("o.customer_id"), "left")
        .groupBy(F.col("c.id").alias("customer_id"),
                 "c.first_name", "c.last_name", "c.email")
        .agg(
            F.count("o.id").alias("order_count"),
            F.coalesce(F.sum("o.total_amount"), F.lit(0.0)).alias("lifetime_value"),
        )
    )


def product_inventory(products: DataFrame) -> DataFrame:
    """RisingWave MV ``product_inventory`` (init-risingwave.sql:96-109):
    CASE-WHEN stock bucketing (F8)."""
    return products.select(
        F.col("id").alias("product_id"), "name", "category",
        "price", "stock_quantity",
        F.when(F.col("stock_quantity") == 0, "Out of Stock")
        .when(F.col("stock_quantity") < 10, "Low Stock")
        .otherwise("In Stock")
        .alias("stock_status"),
    )


def product_popularity(products: DataFrame, order_items: DataFrame,
                       k: int = 10) -> DataFrame:
    """Notebook cell 28: products LEFT JOIN order_items, top-k."""
    oi = order_items.select("product_id", "id", "quantity")
    return (
        products.alias("p")
        .join(oi.alias("oi"), F.col("p.id") == F.col("oi.product_id"), "left")
        .groupBy(F.col("p.id").alias("product_id"), "p.name")
        .agg(
            F.count("oi.id").alias("times_ordered"),
            F.coalesce(F.sum("oi.quantity"), F.lit(0)).alias("total_quantity"),
        )
        .orderBy(F.desc("times_ordered"), F.asc("product_id"))
        .limit(k)
    )


def order_details(orders: DataFrame, order_items: DataFrame) -> DataFrame:
    """Notebook cell 29: orders LEFT JOIN order_items."""
    oi = order_items.select("order_id", "id", "quantity")
    return (
        orders.alias("o")
        .join(oi.alias("oi"), F.col("o.id") == F.col("oi.order_id"), "left")
        .groupBy(F.col("o.id").alias("order_id"), "o.status", "o.total_amount")
        .agg(
            F.count("oi.id").alias("item_count"),
            F.coalesce(F.sum("oi.quantity"), F.lit(0)).alias("total_quantity"),
        )
    )


def cdc_statistics(cdc_events: DataFrame) -> DataFrame:
    """``cdc_statistics`` view (datalake-init.sql:116-125): event counts
    by (table, op) + first/last event timestamps (A7)."""
    return (
        cdc_events.groupBy("source_table", "operation")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.min("event_timestamp").alias("first_event"),
            F.max("event_timestamp").alias("last_event"),
        )
    )


def sync_summary(named_tables: dict[str, DataFrame]) -> DataFrame:
    """``sync_summary`` / ``analytics_summary`` views
    (target-init.sql:83-106, datalake-init.sql:90-113): per-table
    counts + last sync time, UNION ALL'd (A8/U1)."""
    parts = []
    for name, df in named_tables.items():
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("record_count"),
                F.max("__processed_at").alias("last_synced"),
            ).select(F.lit(name).alias("table_name"), "record_count", "last_synced")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
