"""Third TPC-H tranche over the stream-backed tables (SURVEY.md §2.7) —
the remaining classic shapes the fixture's columns can express (no
partsupp / commitdate / receiptdate / shipmode, so q9 / q12 / q16 / q21
are adapted on the surviving columns; adaptations noted per query):

- q9  product-type profit: expression-heavy multi-join aggregate over a
      LIKE-filtered part subset (supply cost proxied from p_retailprice)
- q12 priority by lateness: two conditional counts per derived bucket
- q16 supplier variety: count-distinct over observed (part, supplier)
      pairs grouped by part attributes, with NOT-IN dim exclusion
- q21 waiting supplier: the multi-correlation shape — orders with >1
      supplier where exactly ONE was late, attributed to that supplier

Scale notes: dims broadcast; q9/q12 shuffle the fact once on their
aggregation keys; q16 shuffles the distinct (partkey, suppkey) pair set
(already far smaller than lineitem); q21 is two key-partitioned
aggregates on l_orderkey — the EXISTS / NOT-EXISTS correlation of the
original is expressed as one per-order supplier/lateness profile, which
is the join-free formulation that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elastic_stream_spark.sources.envelope import load_table

Q9_NAME_LIKE = "%red%"  # part-name family whose profit q9 tracks
Q9_COST_FACTOR = 0.6  # ps_supplycost proxy: 0.6 × p_retailprice
Q12_FROM, Q12_TO = "1996-01-01", "1997-01-01"
Q12_LATE_DAYS = 90
Q12_HEAVY_QTY = 17
Q16_EXCL_BRAND = "Brand#1"
Q16_EXCL_TYPE = "PROMO"
Q21_LATE_DAYS = 60
Q21_TOP = 20


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted): profit by supplier nation and year for
    one part-name family.  The fixture has no partsupp, so supply cost
    is proxied as 0.6 × p_retailprice — the operator shape (LIKE filter
    on a dim, 4-way join, expression aggregate, two-key group) is the
    point.  part/supplier/nation broadcast; lineitem⋈orders is the one
    big join, then one aggregation shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like(Q9_NAME_LIKE))
    n = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        Q9_COST_FACTOR
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q12_priority_by_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted): high- vs low-priority order counts per
    shipping bucket for lineitems shipped late in one year.  The fixture
    has no l_shipmode/receiptdate, so the bucket is a quantity-derived
    LIGHT/HEAVY class and "late" is shipdate > orderdate + 90 days.
    Same shape: join on the order key, CASE-conditional double count,
    tiny result."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).where(
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS"))
        & (F.col("l_shipdate") >= F.lit(Q12_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_TO).cast("timestamp"))
    )
    bucket = F.when(F.col("l_quantity") < Q12_HEAVY_QTY, "LIGHT").otherwise("HEAVY")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(bucket.alias("ship_bucket"), high.alias("is_high"))
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted): distinct supplier count per (brand,
    type, size) for parts outside an excluded brand/type — observed
    (l_partkey, l_suppkey) pairs stand in for partsupp.  The pair
    distinct is the one fact-sized shuffle and shrinks the data before
    the broadcast dim join; count-distinct groups a dim-sized table."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND) & (F.col("p_type") != Q16_EXCL_TYPE)
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted): suppliers who were the SOLE late
    shipper on a multi-supplier order.  "Late" is shipdate > orderdate
    + 60 days (no receipt/commit dates in the fixture).

    The original's EXISTS (another supplier) / NOT EXISTS (another late
    supplier) correlation is re-expressed as ONE pair-level
    pre-aggregation — distinct ``(l_orderkey, l_suppkey)`` with
    ``max(late)`` — from which both the per-order profile (plain
    ``count`` / conditional count: ``n_supp``, ``n_late_supp``) and the
    late-pair set are derived.  Two ``countDistinct``s in one groupBy
    (the previous formulation) made Catalyst insert an Expand that
    DOUBLED the lineitem-sized aggregation input in the shuffle; the
    pre-aggregation shuffles each input row once and every later stage
    operates on the far smaller pair table.  r15: the pair
    pre-aggregation now runs BEFORE the orders join — ``max(late)``
    over a pair's lineitems equals ``max(l_shipdate) > o_orderdate +
    60d`` because the threshold is constant within an order, so the
    lineitem side collapses to distinct pairs (map-side-combinable
    max) first and the orders join streams pair-sized rows instead of
    lineitem-sized ones (guide §2.3 "aggregate before you shuffle").
    All stages key on l_orderkey, no correlated re-scans — the
    formulation that survives 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    pair_ship = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("max_ship")
    )
    late = F.col("max_ship") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    pairs = pair_ship.join(
        o.select("o_orderkey", "o_orderdate"),
        pair_ship.l_orderkey == o.o_orderkey,
    ).select("l_orderkey", "l_suppkey", late.alias("is_late"))
    profile = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.count(F.when(F.col("is_late"), 1)).alias("n_late_supp"),
    )
    sole_late_orders = profile.where(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    ).select(F.col("l_orderkey").alias("slo_orderkey"))
    late_pairs = pairs.where(F.col("is_late")).select("l_orderkey", "l_suppkey")
    return (
        late_pairs.join(
            sole_late_orders, late_pairs.l_orderkey == F.col("slo_orderkey")
        )
        .join(F.broadcast(s), late_pairs.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(Q21_TOP)
    )


QUERIES = {
    "q9_product_type_profit": q9_product_type_profit,
    "q12_priority_by_lateness": q12_priority_by_lateness,
    "q16_supplier_variety": q16_supplier_variety,
    "q21_waiting_supplier": q21_waiting_supplier,
}

ORACLES = {
    "q9_product_type_profit": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - {Q9_COST_FACTOR} * p_retailprice * l_quantity), 2)
                   AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '{Q9_NAME_LIKE}'
        GROUP BY n_name, o_year
        ORDER BY n_name, o_year DESC
    """,
    "q12_priority_by_lateness": f"""
        SELECT CASE WHEN l_quantity < {Q12_HEAVY_QTY} THEN 'LIGHT'
                    ELSE 'HEAVY' END AS ship_bucket,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
          AND l_shipdate >= TIMESTAMP '{Q12_FROM}'
          AND l_shipdate < TIMESTAMP '{Q12_TO}'
        GROUP BY ship_bucket ORDER BY ship_bucket
    """,
    "q16_supplier_variety": f"""
        WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM pairs JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q21_waiting_supplier": f"""
        WITH j AS (
          SELECT l_orderkey, l_suppkey,
                 (l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY)
                     AS is_late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        profile AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN is_late THEN l_suppkey END)
                     AS n_late_supp
          FROM j GROUP BY l_orderkey
        ),
        late_pairs AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM j WHERE is_late
        )
        SELECT s_name, count(*) AS numwait
        FROM late_pairs
        JOIN profile USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE n_supp > 1 AND n_late_supp = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT {Q21_TOP}
    """,
}
