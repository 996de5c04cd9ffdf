"""Analytics query library — the reference's query inventory, Spark-first.

Each function is DataFrame-in → DataFrame-out (no I/O, no collect), so
it is runnable as a batch query, inside ``foreachBatch`` as an
incrementally refreshed materialized view, or against time-travel /
CDF snapshots. Operator IDs (J*/A*/O*/U*/F*) refer to SURVEY.md §2.

Reference queries are re-expressed over the driver's star schema:
customers→customer, orders→orders, products→part, order_items→lineitem.

Scale notes (100 TB):
- All joins are equi-joins; Catalyst picks broadcast vs shuffled hash vs
  SMJ, and AQE re-plans at runtime (skew splitting enabled in session.py).
- All aggregations are partial (map-side combine) — expressed via
  ``groupBy().agg``, never RDDs.
- Top-k (``orderBy().limit(k)``) plans TakeOrderedAndProject: per-
  partition heap + driver merge of k rows, no global sort.
- Money aggregates go through exact decimal addition (analytics/money.py)
  so results are bit-identical across summation orders — double addition
  is not associative, and at 1000-executor parallelism partial-sum order
  is nondeterministic (r1 driver gate: 30/6332 groups flipped at 2dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .money import dec_avg, dec_sum


# ---------------------------------------------------------------------------
# Join-then-aggregate queries (J1-J3, A2-A4; reference notebook cells 28-30,
# RisingWave MVs init-risingwave.sql:73-109)
# ---------------------------------------------------------------------------

def customer_order_summary(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-customer order count + lifetime value.

    Reference: notebook cell 30 (SQL LEFT JOIN + GROUP BY) and the
    incrementally-maintained RisingWave MV ``customer_order_summary``
    (init-risingwave.sql:84-94). J1 + A2 + F10 (COALESCE).

    Plan note: the fact table is pre-aggregated BELOW the join
    (join-then-agg → agg-then-join) — Catalyst does not do this
    rewrite, and at 100 TB it shrinks both the join input and the
    shuffle from |orders| to |customers|.
    """
    from .money import units

    per_cust = orders.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("__cnt"),
        # integer cents: exact, summation-order independent (money.py)
        F.sum(units("o_totalprice")).alias("__cents"),
    )
    return customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(
        "c_custkey", "c_name",
        F.coalesce(F.col("__cnt"), F.lit(0)).alias("order_count"),
        (F.coalesce(F.col("__cents"), F.lit(0)) / 100.0).alias("lifetime_value"),
    )


def product_popularity(part: DataFrame, lineitem: DataFrame, k: int = 10) -> DataFrame:
    """Top-k most-ordered products.

    Reference: notebook cell 28 (products LEFT JOIN order_items,
    COUNT + SUM, ORDER BY DESC LIMIT 10). J2 + A3 + O1.
    Fact pre-aggregated below the join; final top-k plans
    TakeOrderedAndProject — per-partition heaps, no full sort.
    """
    per_part = lineitem.groupBy("l_partkey").agg(
        F.count("l_orderkey").alias("__cnt"),
        F.sum("l_quantity").alias("__qty"),
    )
    return (
        part.join(per_part, part.p_partkey == per_part.l_partkey, "left")
        .select(
            "p_partkey", "p_name",
            F.coalesce(F.col("__cnt"), F.lit(0)).alias("times_ordered"),
            F.round(F.coalesce(F.col("__qty"), F.lit(0.0)), 2).alias(
                "total_quantity"),
        )
        .orderBy(F.desc("times_ordered"), F.asc("p_partkey"))
        .limit(k)
    )


def order_line_summary(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Items and total quantity per order.

    Reference: notebook cell 29 (orders LEFT JOIN order_items). J3 + A4.
    Fact pre-aggregated below the join (see customer_order_summary).
    """
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count("l_linenumber").alias("__cnt"),
        F.sum("l_quantity").alias("__qty"),
    )
    return orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey, "left"
    ).select(
        "o_orderkey", "o_orderstatus",
        F.coalesce(F.col("__cnt"), F.lit(0)).alias("item_count"),
        F.round(F.coalesce(F.col("__qty"), F.lit(0.0)), 2).alias("total_quantity"),
    )


# ---------------------------------------------------------------------------
# Grouped aggregations (A1, A5-A8; RisingWave order_analytics MV, notebook
# cell 37, datalake-init.sql views)
# ---------------------------------------------------------------------------

def order_analytics(orders: DataFrame) -> DataFrame:
    """Daily order stats by status — the reference's flagship MV.

    Reference: RisingWave MV ``order_analytics`` init-risingwave.sql:73-81
    (DATE_TRUNC('day') + COUNT/SUM/AVG GROUP BY day, status). A1 + F9.
    """
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("day", F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "order_day"
            ),
            F.col("o_orderstatus"),
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            # exact decimal money aggregation (see analytics/money.py):
            # ROUND(SUM(double)) flipped 30/6332 groups vs the oracle in r1
            dec_sum("o_totalprice").alias("total_revenue"),
            dec_avg("o_totalprice").alias("avg_order_value"),
        )
    )


def priority_stats(orders: DataFrame) -> DataFrame:
    """Multi-aggregate with WHERE: COUNT / AVG / MIN by priority.

    Reference: notebook cell 37 (COUNT, AVG(salary), MIN(hire_date) by
    department WHERE is_active). A5 + P8.
    """
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            dec_avg("o_totalprice").alias("avg_price"),
            F.min("o_orderdate").alias("first_order_date"),
        )
    )


def event_stats(events: DataFrame) -> DataFrame:
    """Per-type event counts + first/last timestamps.

    Reference: ``cdc_statistics`` view datalake-init.sql:116-125
    (COUNT, MIN(event_timestamp), MAX(event_timestamp) by table+op). A7.
    Timestamps are exposed as epoch-milliseconds for engine-portable
    comparison (Spark truncates parquet ns → µs; see SURVEY.md §7.2).
    """
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.unix_millis(F.min("ts")).alias("first_ts_ms"),
        F.unix_millis(F.max("ts")).alias("last_ts_ms"),
    )


def analytics_summary(named_tables: dict[str, DataFrame], key_col: dict[str, str]) -> DataFrame:
    """Per-table record-count rollup, UNION ALL'd.

    Reference: ``analytics_summary`` datalake-init.sql:90-113 /
    ``sync_summary`` target-init.sql:83-106. A8 + A9 + U1.
    """
    parts = []
    for name, df in named_tables.items():
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("record_count"),
                F.count_distinct(F.col(key_col[name])).alias("distinct_keys"),
            ).select(F.lit(name).alias("table_name"), "record_count", "distinct_keys")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def change_type_counts(events: DataFrame) -> DataFrame:
    """Count by change/event type.

    Reference: notebook cell 62 (``cdf_df.groupBy('_change_type').count()``). A6.
    """
    return events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# Sorts / top-k (O1-O4) and set ops (U3)
# ---------------------------------------------------------------------------

def stats_moments(lineitem: DataFrame) -> DataFrame:
    """Statistical aggregates the reference lacks but a real analytics
    engine needs: exact interpolated percentiles, sample stddev,
    Pearson correlation (swap percentile for approx_percentile at
    100 TB where a sketch with bounded memory is the right trade).

    Determinism: built-in stddev/corr sum doubles (summation-order
    dependent — fails exact cross-engine comparison), so both moments
    are computed from EXACT integer sums (quantity in whole units,
    price snapped to whole dollars, keeping Σx² within long range at
    any SF) with the closed-form expressions evaluated in double — the
    identical IEEE expression on identical integers is bit-identical
    in every engine, so no output rounding is needed at all."""
    from .money import units

    # median over DOUBLED integer cents: the 0.5-interpolation (a+b)/2
    # then has an exact integer result regardless of which interpolation
    # formula the engine uses — raw-double medians land on exact .xx45
    # half-cent ties where Spark and DuckDB round different ways
    q = units("l_quantity", 0)
    p = units("l_extendedprice", 0)
    n = F.count(F.lit(1)).cast("double")
    sq = F.sum(q).cast("double")
    sq2 = F.sum(q * q).cast("double")
    sp = F.sum(p).cast("double")
    sp2 = F.sum(p * p).cast("double")
    sqp = F.sum(q * p).cast("double")
    half_cents = "CAST(FLOOR(l_extendedprice * 200 + 0.5) AS BIGINT)"
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.expr(f"percentile({half_cents}, 0.5)") / 200.0).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 2).alias("p95_price"),
        F.sqrt((n * sq2 - sq * sq) / (n * (n - F.lit(1.0)))).alias("qty_stddev"),
        ((n * sqp - sq * sp)
         / (F.sqrt(n * sq2 - sq * sq) * F.sqrt(n * sp2 - sp * sp))
         ).alias("qty_price_corr"),
    )


def order_rollup(orders: DataFrame) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (status -> priority -> grand
    total). Not in the reference; standard analytics surface. Each
    grouping level is one pass of the same partial aggregation."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            dec_sum("o_totalprice").alias("total_revenue"),
        )
    )


def price_ranks(orders: DataFrame, k: int = 100,
                salt_buckets: int = 32) -> DataFrame:
    """Ranking window functions (rank + ntile semantics) — top-k
    orders per status with quartile assignment, deterministic
    tiebreak on the key so results are engine-portable.

    NOT the naive single window: ``PARTITION BY o_orderstatus`` has 3
    distinct values, so at tier the whole table sorts inside 3 tasks
    while the rest of the cluster idles (measured: 208 s at the 150M-
    order sf100 tier, a 138× wall for 1000× data — the one
    near-linear row of the r11 sweep). Scalable shape, output
    IDENTICAL to ``RANK()/NTILE(4) OVER (PARTITION BY status ORDER BY
    price DESC, key ASC)`` filtered to rank <= k:

    1. salted local top-k: row_number <= k per (status, key mod S) —
       every global top-k row is in its own bucket's top k, and the
       sort runs at S× the partition-key parallelism;
    2. exact rank over the <= 3·S·k candidates — the sort key is a
       TOTAL order (o_orderkey is unique), so RANK == ROW_NUMBER and
       a candidate's rank over the pruned set equals its global rank;
    3. NTILE(4) in closed form from the per-status row count (one
       map-side-combinable groupBy, broadcast back): ANSI ntile gives
       the first n%4 tiles ceil(n/4) rows and the rest floor(n/4),
       which is pure arithmetic in (rank, n) — no full-partition
       window needed."""
    from pyspark.sql import Window

    order_cols = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    ws = Window.partitionBy("o_orderstatus", "__salt").orderBy(*order_cols)
    cand = (
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("__salt", F.pmod(F.col("o_orderkey"),
                                     F.lit(salt_buckets)))
        .withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    wf = Window.partitionBy("o_orderstatus").orderBy(*order_cols)
    n_per = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("__n"))
    ranked = (cand.withColumn("price_rank", F.row_number().over(wf))
              .filter(F.col("price_rank") <= k)
              .join(F.broadcast(n_per), "o_orderstatus"))
    tile_q = (F.col("__n") / 4).cast("long")     # floor(n/4)
    tile_r = F.col("__n") % 4                    # n big tiles of q+1
    pos = F.col("price_rank")
    big_span = tile_r * (tile_q + 1)
    quartile = F.when(
        pos <= big_span, F.ceil(pos / (tile_q + 1))
    ).otherwise(
        tile_r + F.ceil((pos - big_span)
                        / F.greatest(tile_q, F.lit(1)))
    )
    return ranked.select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
        "price_rank",
        quartile.cast("int").alias("quartile"),
    )


def order_cube(orders: DataFrame) -> DataFrame:
    """CUBE over (status, priority): every subtotal combination."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            dec_sum("o_totalprice").alias("total_revenue"),
        )
    )


def approx_stats(df: DataFrame, group_col: str, value_col: str,
                 distinct_col: str, rsd: float = 0.05) -> DataFrame:
    """Sketch-based aggregates for the 100 TB regime: HyperLogLog++
    distinct counts and GK approximate percentiles — bounded memory
    per group regardless of cardinality (exact percentile/distinct
    materialize per-group value sets; at scale that's the OOM). No
    DuckDB oracle (different sketch algorithms); accuracy is asserted
    against exact results in tests."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("approx_distinct"),
        F.expr(f"approx_percentile({value_col}, 0.5, 1000)").alias("approx_median"),
        F.expr(f"approx_percentile({value_col}, 0.99, 1000)").alias("approx_p99"),
    )


def top_value_events(events: DataFrame, k: int = 10) -> DataFrame:
    """Most recent / highest-value rows, deterministically tie-broken.

    Reference: notebook cell 16 (sort desc + head(10)), cell 47
    (ORDER BY price DESC LIMIT). O1 + O4.
    """
    return (
        events.select("event_id", "event_type", F.round("value", 4).alias("value"))
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(k)
    )


def version_diff_keys(df_new: DataFrame, df_old: DataFrame, key: str) -> DataFrame:
    """Keys present in one snapshot but not another.

    Reference: notebook cell 53 (pandas set difference of ids between
    two time-travel versions). U3 — expressed distributively as EXCEPT.
    """
    return df_new.select(key).distinct().exceptAll(df_old.select(key).distinct())


# ---------------------------------------------------------------------------
# Scalar-function showcase (F2-F10) and CASE bucketing (F8)
# ---------------------------------------------------------------------------

def inventory_status(part: DataFrame) -> DataFrame:
    """CASE-WHEN stock bucketing.

    Reference: RisingWave MV ``product_inventory`` init-risingwave.sql:96-109
    (CASE WHEN stock=0 / <10 / else). F8, with p_size standing in for
    stock_quantity on the driver's schema.
    """
    return part.select(
        "p_partkey",
        "p_name",
        "p_size",
        F.when(F.col("p_size") == 0, F.lit("Out of Stock"))
        .when(F.col("p_size") < 10, F.lit("Low Stock"))
        .otherwise(F.lit("In Stock"))
        .alias("stock_status"),
    )


def scalar_showcase(events: DataFrame) -> DataFrame:
    """One projection exercising the reference's scalar-function surface:
    concat_ws (F2), cast (F3), epoch-ms→timestamp (F4), CASE op-name
    mapping (F7), date_trunc (F9), coalesce (F10).

    Reference: spark_streaming.py:221-243 (event_id construction,
    ts_ms/1000 cast, op-code CASE), init-risingwave.sql:75,91.
    """
    return events.select(
        "event_id",
        F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "event_key"
        ),
        F.when(F.col("event_type") == "click", "INSERT")
        .when(F.col("event_type") == "view", "UPDATE")
        .when(F.col("event_type") == "purchase", "DELETE")
        .otherwise("SNAPSHOT")
        .alias("op_name"),
        F.round(F.coalesce(F.col("value"), F.lit(0.0)), 4).alias("value_filled"),
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("event_day"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    )


def cohort_retention(events: DataFrame,
                     epoch: str = "2024-01-01") -> DataFrame:
    """Cohort retention matrix — the classic product-analytics shape
    (users grouped by first-activity week; how many are still active
    k weeks later).

    Week numbering is pure integer arithmetic (days since ``epoch``
    DIV 7) rather than date_trunc('week', ...): engines disagree on
    week-start conventions, integer division they cannot.

    Scale shape: ONE user_id shuffle builds each user's distinct week
    SET (collect_set combines map-side, so the exchange carries
    per-task week sets, not raw events), the cohort week is a
    row-local array_min over that set, and the matrix is one more
    grouped count — two exchanges end-to-end, pinned in
    tests/test_plans.py. (A DISTINCT (user, week) + min-window
    formulation costs a third exchange: the distinct hashes on both
    columns, the window re-hashes on user_id alone.) Each user
    contributes each (cohort, offset) cell at most once by
    construction, so the final count needs no distinct.
    """
    week = F.floor(
        F.datediff(F.to_date("ts"), F.lit(epoch).cast("date")) / 7
    ).cast("long")
    per_user = (
        events.select(F.col("user_id"), week.alias("__w"))
        .filter(F.col("__w").isNotNull())
        .groupBy("user_id")
        .agg(F.collect_set("__w").alias("__weeks"))
    )
    return (
        per_user.select(
            F.array_min("__weeks").alias("cohort_week"),
            F.explode("__weeks").alias("week"))
        .groupBy("cohort_week",
                 (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def funnel_counts(events: DataFrame,
                  steps: tuple = ("view", "click", "purchase"),
                  ) -> DataFrame:
    """Sequential funnel: how many users completed step k of the
    ordered ``steps``, where each step must happen STRICTLY AFTER the
    user's completion of the previous one (min-timestamp semantics:
    t1 = first 'view'; t2 = first 'click' with ts > t1; ...).

    Scale shape: events filter to the funnel types at the scan, then
    ONE user_id shuffle feeds a chain of RUNNING-MIN window functions
    over (user_id ORDER BY ts): step k's candidate timestamps are the
    step-k events strictly later than the running minimum of step
    k-1's candidates over EARLIER rows (rows frame to -1 preserves
    the strictly-after semantics at timestamp ties), and each user's
    t_k is the plain min of those candidates. WindowExec sorts
    externally (spills) and running frames keep O(1) state per row,
    so a bot/whale user with millions of events costs disk, never
    executor memory — unlike a per-user collect_list, whose task
    state grows with the hottest user. The follow-up groupBy(user_id)
    reuses the window's hash partitioning (no second exchange).

    Why the running min converges to the true t_{k-1}: candidates
    only exist at timestamps >= the true value, and once the true
    t_{k-1} row has passed, the running min equals it — so every
    step-k event after t_{k-1} tests against exactly t_{k-1}, and no
    earlier event can falsely qualify (any running value present
    before then is >= its own row's timestamp).

    Returns one row: (step_1_users, step_2_users, ... ) as longs.
    """
    base = (
        events.filter(F.col("event_type").isin(*steps))
        .select(F.col("user_id"), F.unix_micros("ts").alias("__ts"),
                F.col("event_type").alias("__t"))
    )
    w_prev = (Window.partitionBy("user_id").orderBy("__ts")
              .rowsBetween(Window.unboundedPreceding, -1))
    out = base
    prev_run = None
    for k, s in enumerate(steps, start=1):
        if prev_run is None:
            cand = F.when(F.col("__t") == s, F.col("__ts"))
        else:
            cand = F.when(
                (F.col("__t") == s) & (F.col("__ts") > F.col(prev_run)),
                F.col("__ts"))
        out = out.withColumn(f"__c{k}", cand)
        if k < len(steps):
            prev_run = f"__r{k}"
            out = out.withColumn(prev_run, F.min(f"__c{k}").over(w_prev))
    per_user = out.groupBy("user_id").agg(*[
        F.min(f"__c{k}").alias(f"__t{k}")
        for k in range(1, len(steps) + 1)
    ])
    return per_user.agg(*[
        F.count(F.col(f"__t{k}")).cast("long").alias(f"step_{k}_users")
        for k in range(1, len(steps) + 1)
    ])
