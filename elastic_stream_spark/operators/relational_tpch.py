"""Classic TPC-H query shapes over the stream-backed tables (SURVEY.md
§2.7 — relational algebra the reference lacks, provided by Spark SQL).

These five add the canonical multi-join / disjunct-predicate / market-
share shapes missing from ``relational.py``'s q1/q3/q5 set (the fixture
lacks shipmode/commitdate/container columns, so q12/q19 are expressed on
the columns that exist — same operator shapes, same plan classes):

- q7  volume shipping: double nation alias join, year extraction
- q8  market share: ratio-of-sums over a conditional aggregate
- q10 returned items: top-k revenue over a flagged subset
- q14 promo effect: conditional-share aggregate over part type
- q19 brand/size/quantity OR-disjunct revenue (predicate-pushdown shape)

Scale: every dimension (nation/part/customer/supplier) broadcasts; the
fact tables shuffle at most once per aggregation.  OR-disjunct predicates
in q19 reach the parquet scan as pushed filters on the conjunct-common
columns; the rest evaluate in the codegen'd filter — no join explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elastic_stream_spark.sources.envelope import load_table

NATION_A, NATION_B = "NATION_1", "NATION_2"
MKT_REGION_KEY = 1  # region whose market q8 measures
MKT_NATION = "NATION_7"  # supplier nation whose share is tracked
Q10_FROM, Q10_TO = "1996-01-01", "1996-07-01"
Q14_FROM, Q14_TO = "1996-01-01", "1997-01-01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue flow between two nations by year, both
    directions.  Supplier-nation and customer-nation come from TWO
    broadcast joins against the same nation dim (aliased); the only big
    shuffle is lineitem⋈orders."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(
            ((F.col("supp_nation") == NATION_A) & (F.col("cust_nation") == NATION_B))
            | ((F.col("supp_nation") == NATION_B) & (F.col("cust_nation") == NATION_A))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(vol), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's order revenue by
    year — a ratio of conditional to total sum inside one aggregate (no
    second pass over the fact table)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_rkey")
    )
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
        .where(F.col("c_rkey") == MKT_REGION_KEY)
    )
    share = F.sum(F.when(F.col("supp_nation") == MKT_NATION, vol).otherwise(0)) / F.sum(
        vol
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(share, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost revenue from returned items in
    a two-quarter window.  Filters push below the joins; customer/nation
    broadcast; one shuffle for the per-customer aggregate."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q10_FROM).cast("date"))
        & (F.col("o_orderdate") < F.lit(Q10_TO).cast("date"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(vol), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share per month over one year
    — conditional share inside a single monthly aggregate, part dim
    broadcast."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_TO).cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.month("l_shipdate").alias("l_month"))
        .agg(F.round(promo * 100 / F.sum(vol), 6).alias("promo_share_pct"))
        .orderBy("l_month")
    )


def q19_brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under OR-ed (brand, size, quantity-band)
    disjuncts — the multi-disjunct predicate class.  The part dim
    broadcasts; each disjunct is a codegen'd conjunction, no join
    explosion."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(vol), 4).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q14_promo_effect": q14_promo_effect,
    "q19_brand_quantity_revenue": q19_brand_quantity_revenue,
}

ORACLES = {
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = '{NATION_A}' AND n2.n_name = '{NATION_B}')
           OR (n1.n_name = '{NATION_B}' AND n2.n_name = '{NATION_A}')
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": f"""
        SELECT year(o_orderdate) AS o_year,
               round(sum(CASE WHEN ns.n_name = '{MKT_NATION}'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE nc.n_regionkey = {MKT_REGION_KEY}
        GROUP BY o_year ORDER BY o_year
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= DATE '{Q10_FROM}' AND o_orderdate < DATE '{Q10_TO}'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q14_promo_effect": f"""
        SELECT month(l_shipdate) AS l_month,
               round(100 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '{Q14_FROM}'
          AND l_shipdate < TIMESTAMP '{Q14_TO}'
        GROUP BY l_month ORDER BY l_month
    """,
    "q19_brand_quantity_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 40)
    """,
}
