"""Relational operator algebra over stream-backed tables.

The reference stores opaque payloads and has no relational layer
(SURVEY.md §2.7 — evidence: opcode enum rpc.fbs:111-182 contains only
stream ops).  Our engine decodes payloads into typed columns and exposes
the full Spark SQL algebra.  Each query here exercises one operator family
and is hash-checked against DuckDB:

- scan+filter+project (pushdown), hash/sort-merge/broadcast joins,
  semi/anti joins, grouped aggregation, rollup/grouping sets, window
  functions (rank, running agg, top-k per group), set operations,
  conditional pivot, as-of join (operator Spark lacks natively —
  composed from built-ins), approximate aggregates.

Scale notes (100 TB):
- dimension sides (region/nation/supplier/part at these ratios) are
  broadcast — no shuffle of the fact table; Catalyst picks this via
  autoBroadcastJoinThreshold, we hint where the stats are hidden.
- aggregations are partial (map-side combine) by construction — plain
  ``groupBy().agg`` of algebraic functions.
- the as-of join avoids a pairwise explosion: union + single sort per
  key (window last_value), not a range cross-join.
- doubles that cross the oracle boundary are rounded to 4 places; sums at
  sf0.1 carry ~1e-7 absolute float noise, far below the rounding grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from elastic_stream_spark.sources.envelope import EVENTS_NORM_SQL, load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide grouped aggregation, fully partial-aggregable.
    Whole plan is scan → partial agg → shuffle(2 keys) → final agg."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            # avg_qty: quantities are INTEGER-valued, so Σ is exact in
            # doubles (order-independent) and avg is an exact-int
            # division — published UNROUNDED (round() on such a ratio
            # can land on a decimal tie; timeseries.py note).  price/
            # disc are NON-integral doubles whose float sums differ in
            # last bits between engines — there round(,4) is what
            # ABSORBS the noise, so they stay rounded.
            F.avg("l_quantity").alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on both sides of a 3-way join,
    then top-10.  customer filter → broadcast; orders⋈lineitem shuffles on
    the join key only after filters prune (predicate pushdown)."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join; all dimensions broadcast, the
    only big shuffle is lineitem⋈orders."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window — the canonical shuffle-once
    pattern (partitionBy custkey)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "rk",
        )
        .orderBy("o_custkey", "rk")
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregation (returnflag → linestatus → total)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count("*").alias("n"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) + left-anti (NOT EXISTS) in one result: per
    nation, customers with orders vs without."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_with_orders"))
    )
    without = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_without_orders"))
    )
    return (
        with_orders.join(without, "c_nationkey", "full_outer")
        .select(
            "c_nationkey",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
        .orderBy("c_nationkey")
    )


def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: nations having customers INTERSECT nations having
    suppliers, EXCEPT nations in AMERICA."""
    cust_nations = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    sup_nations = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    america = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "AMERICA")
        .select(F.col("n_nationkey").alias("nationkey"))
    )
    return (
        cust_nations.intersect(sup_nations)
        .exceptAll(america)
        .distinct()
        .orderBy("nationkey")
    )


def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-aggregate window: cumulative monthly revenue per returnflag
    (unbounded-preceding frame)."""
    li = _t(spark, sf_dir, "lineitem")
    monthly = (
        li.groupBy(
            "l_returnflag", F.date_trunc("month", "l_shipdate").alias("month")
        )
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        monthly.withColumn("cum_revenue", F.round(F.sum("rev").over(w), 4))
        .select("l_returnflag", "month", F.round("rev", 4).alias("rev"), "cum_revenue")
        .orderBy("l_returnflag", "month")
    )


def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional aggregation form — portable to ANSI SQL)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)),
                4,
            ).alias("qty_open"),
            F.round(
                F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)),
                4,
            ).alias("qty_filled"),
        )
        .orderBy("l_returnflag")
    )


def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — operator the reference and vanilla Spark both lack;
    composed from built-ins: for each ``purchase`` event, the user's most
    recent ``click`` at or before the purchase time.

    Strategy (scales to 100 TB): tag both sides, union on the shared key,
    one window pass per key (last non-null over rows-preceding frame) —
    a single shuffle on ``user_id``, linear work, no range cross-join and
    no pairwise candidate explosion.  DuckDB's native ASOF JOIN is the
    oracle.
    """
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    tagged = purchases.withColumn("side", F.lit(1)).withColumn(
        "click_id", F.lit(None).cast("long")
    ).select("user_id", "ts", "side", "purchase_id", "purchase_value", "click_id").unionByName(
        clicks.withColumn("side", F.lit(0))
        .withColumn("purchase_id", F.lit(None).cast("long"))
        .withColumn("purchase_value", F.lit(None).cast("double"))
        .select("user_id", "ts", "side", "purchase_id", "purchase_value", "click_id")
    )
    # clicks sort before purchases at equal ts (side ascending) → "at or
    # before" semantics, matching ASOF JOIN's >= comparator.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .where((F.col("side") == 1) & F.col("last_click_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.round("purchase_value", 4).alias("purchase_value"),
            F.col("last_click_id").alias("click_id"),
        )
        .orderBy("purchase_id")
    )


def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate + exact distinct aggregation; the approx path
    (HyperLogLog++) is the 100 TB-friendly form. Exact count is the
    oracle-checked column; approx is asserted within rsd in tests."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact_parts"))
        .orderBy("l_returnflag")
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "top3_orders_per_customer": top3_orders_per_customer,
    "rollup_revenue": rollup_revenue,
    "semi_anti_customers": semi_anti_customers,
    "setops_nations": setops_nations,
    "running_revenue": running_revenue,
    "pivot_status_by_flag": pivot_status_by_flag,
    "asof_join_purchase_click": asof_join_purchase_click,
    "approx_distinct_parts": approx_distinct_parts,
}

ORACLES = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4)                                          AS sum_qty,
               round(sum(l_extendedprice), 4)                                     AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4)                  AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)    AS sum_charge,
               avg(l_quantity)                                                    AS avg_qty,
               round(avg(l_extendedprice), 4)                                     AS avg_price,
               round(avg(l_discount), 4)                                          AS avg_disc,
               count(*)                                                           AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "top3_orders_per_customer": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice, rk
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          FROM orders
        )
        WHERE rk <= 3
        ORDER BY o_custkey, rk
    """,
    "rollup_revenue": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
    "semi_anti_customers": """
        WITH w AS (
          SELECT c_nationkey, count(*) AS n_with_orders
          FROM customer
          WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          GROUP BY c_nationkey
        ), wo AS (
          SELECT c_nationkey, count(*) AS n_without_orders
          FROM customer
          WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          GROUP BY c_nationkey
        )
        SELECT COALESCE(w.c_nationkey, wo.c_nationkey) AS c_nationkey,
               COALESCE(n_with_orders, 0)  AS n_with_orders,
               COALESCE(n_without_orders, 0) AS n_without_orders
        FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey
        ORDER BY c_nationkey
    """,
    "setops_nations": """
        SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          INTERSECT
          SELECT s_nationkey AS nationkey FROM supplier
          EXCEPT
          SELECT n_nationkey AS nationkey
          FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'AMERICA'
        )
        ORDER BY nationkey
    """,
    "running_revenue": """
        WITH monthly AS (
          SELECT l_returnflag, date_trunc('month', l_shipdate) AS month,
                 sum(l_extendedprice * (1 - l_discount)) AS rev
          FROM lineitem GROUP BY l_returnflag, month
        )
        SELECT l_returnflag, month, round(rev, 4) AS rev,
               round(sum(rev) OVER (PARTITION BY l_returnflag ORDER BY month
                                    ROWS UNBOUNDED PRECEDING), 4) AS cum_revenue
        FROM monthly
        ORDER BY l_returnflag, month
    """,
    "pivot_status_by_flag": """
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 4) AS qty_open,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 4) AS qty_filled
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "asof_join_purchase_click": f"""
        WITH {EVENTS_NORM_SQL}
        SELECT p.event_id AS purchase_id, p.user_id,
               round(p.value, 4) AS purchase_value, c.event_id AS click_id
        FROM (SELECT * FROM events_n WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events_n WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY purchase_id
    """,
    "approx_distinct_parts": """
        SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
}
