"""Second TPC-H tranche over the stream-backed tables (SURVEY.md §2.7 —
relational algebra the reference lacks, provided by Spark SQL).

Seven more canonical TPC-H shapes on the columns the fixture has (no
partsupp / commitdate / receiptdate / phone / container, so q2 / q4 /
q17 / q22 are expressed on the surviving columns — same operator
shapes, same plan classes; adaptations are noted per query):

- q2  min-cost supplier: per-part argmin over a window (rank = 1)
- q4  order priority: conditional EXISTS → left-semi join
- q6  forecast revenue: single-scan filtered scalar aggregate
- q15 top supplier: aggregate → max-of-aggregate selection
- q17 small-quantity revenue: correlated per-part average threshold
- q18 large-volume customer: HAVING over a fact-key aggregate
- q22 global sales opportunity: scalar-subquery threshold + anti join

Scale notes: every dimension (part/supplier/nation/customer) broadcasts;
each query shuffles the fact table at most once, on its aggregation key.
q2's distinct (part, supp) pairs and q18's per-order aggregate are
key-partitioned shuffles that shrink the data before any join.  q15/q17/
q22 compute their thresholds as tiny aggregate DataFrames joined back by
broadcast — never a driver-side collect, never a cartesian product (the
scalar joins use a constant equi-key, which Spark plans as a 1-row
broadcast hash join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elastic_stream_spark.sources.envelope import load_table

Q2_REGION_KEY = 2  # region whose suppliers q2 ranks
Q4_FROM, Q4_TO = "1996-01-01", "1996-04-01"
Q4_LATE_DAYS = 60
Q6_FROM, Q6_TO = "1996-01-01", "1997-01-01"
Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"
Q17_BRAND = "Brand#23"
Q18_MIN_QTY = 300
Q22_CUTOFF = "2000-01-01"
Q22_NATIONS = 10  # nationkey < 10 plays the role of q22's phone prefixes


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted): for each part supplied into one region,
    the supplier with the minimum account balance — the fixture has no
    partsupp/ps_supplycost, so observed (l_partkey, l_suppkey) pairs
    stand in for partsupp and s_acctbal for the supply cost.  The argmin
    is a rank-1 window over the distinct-pair table; part/supplier/
    nation all broadcast; the only big shuffle is the pair distinct."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == Q2_REGION_KEY)
    p = _t(spark, sf_dir, "part")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    offered = (
        pairs.join(F.broadcast(s), pairs.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("l_partkey").orderBy("s_acctbal")
    best = offered.withColumn("rk", F.rank().over(w)).where(F.col("rk") == 1)
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(50)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted): priority distribution of orders that had
    at least one LATE lineitem in one quarter — the fixture has no
    commitdate/receiptdate, so "late" is l_shipdate more than 60 days
    after o_orderdate.  The EXISTS becomes a left-semi join whose
    condition spans both sides; orders filters push to the scan."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_TO).cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (
                li.l_shipdate
                > o.o_orderdate + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
            ),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase from discount elimination — a single
    filtered scan with a scalar aggregate; every predicate pushes to the
    parquet scan, no joins, no shuffle beyond the final 1-row reduce."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit(Q6_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_TO).cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        ),
        F.count("*").alias("n_lineitems"),
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue over one quarter.
    Per-supplier revenue is one key-partitioned aggregate; the max is
    taken over that tiny aggregate (supplier-cardinality) and joined
    back by broadcast — the view + scalar-subquery of the original,
    without materializing a view.  Revenue is rounded to 2 decimals
    BEFORE the max comparison so the float sum is engine-stable."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = rev.withColumn("k", F.lit(1)).join(
        F.broadcast(
            rev.agg(F.max("total_revenue").alias("max_revenue")).withColumn(
                "k", F.lit(1)
            )
        ),
        "k",
    ).where(F.col("total_revenue") == F.col("max_revenue"))
    return (
        top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (adapted): average yearly revenue lost by not
    filling small-quantity orders for one brand — the fixture has no
    p_container, so the brand predicate alone selects the part subset.
    The correlated per-part AVG becomes a per-part aggregate joined back
    by broadcast (brand-filtered, so it is dimension-sized); the fact
    scan happens once for the aggregate and once for the probe, both
    with the part filter pushed through the broadcast join."""
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == Q17_BRAND)
    li = _t(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = brand_li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    ).select(F.col("l_partkey").alias("aq_partkey"), "avg_qty")
    return (
        brand_li.join(
            F.broadcast(avg_qty), F.col("l_partkey") == F.col("aq_partkey")
        )
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders above a total-quantity threshold.
    The HAVING is a per-orderkey aggregate (one fact shuffle on the
    natural key) that shrinks to a handful of rows before the joins;
    orders joins on its key, customer broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > Q18_MIN_QTY)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 1).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted): wealthy-but-dormant customers per
    nation — the fixture has no c_phone, so n_nationkey < 10 plays the
    country-code subset and "dormant" means no order on/after the
    cutoff date (the fixture has no orderless customers at all).  The
    scalar positive-balance average is a 1-row aggregate broadcast back
    on a constant equi-key (planned as a broadcast hash join, not a
    cartesian); the NOT EXISTS is a left-anti join against the
    date-filtered orders."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_nationkey") < Q22_NATIONS)
    n = _t(spark, sf_dir, "nation")
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp")
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
        .withColumn("k", F.lit(1))
    )
    return (
        c.withColumn("k", F.lit(1))
        .join(F.broadcast(avg_bal), "k")
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


QUERIES = {
    "q2_min_acctbal_supplier": q2_min_acctbal_supplier,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customer": q18_large_volume_customer,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

ORACLES = {
    "q2_min_acctbal_supplier": f"""
        WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        offered AS (
            SELECT l_partkey, s_acctbal, s_name, n_name,
                   rank() OVER (PARTITION BY l_partkey ORDER BY s_acctbal) AS rk
            FROM pairs
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_regionkey = {Q2_REGION_KEY}
        )
        SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
               p_partkey, p_name
        FROM offered JOIN part ON l_partkey = p_partkey
        WHERE rk = 1
        ORDER BY s_acctbal DESC, p_partkey, s_name
        LIMIT 50
    """,
    "q4_order_priority": f"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{Q4_FROM}'
          AND o_orderdate < TIMESTAMP '{Q4_TO}'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
          )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q6_forecast_revenue": f"""
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q6_FROM}'
          AND l_shipdate < TIMESTAMP '{Q6_TO}'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
              AND l_shipdate < TIMESTAMP '{Q15_TO}'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q17_small_quantity_revenue": f"""
        WITH brand_li AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = '{Q17_BRAND}'
        ),
        avg_qty AS (
            SELECT l_partkey AS aq_partkey, avg(l_quantity) AS avg_qty
            FROM brand_li GROUP BY l_partkey
        )
        SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM brand_li JOIN avg_qty ON l_partkey = aq_partkey
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "q18_large_volume_customer": f"""
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > {Q18_MIN_QTY}
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(sum_qty, 1) AS sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q22_global_sales_opportunity": f"""
        SELECT n_name, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_nationkey < {Q22_NATIONS}
          AND c_acctbal > (
            SELECT avg(c_acctbal) FROM customer
            WHERE c_acctbal > 0 AND c_nationkey < {Q22_NATIONS}
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF}'
          )
        GROUP BY n_name ORDER BY n_name
    """,
}
