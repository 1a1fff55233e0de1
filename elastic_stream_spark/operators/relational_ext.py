"""Relational algebra, second batch — operator families not covered by
``relational.py``: correlated scalar subqueries (decorrelated), outer-join
aggregation distributions, argmax aggregates, lag/lead analytics, banded
range joins, CUBE grouping sets, exact percentiles, ntile bucketing.

The reference has no relational layer at all (SURVEY.md §2.7 — opcode enum
rpc.fbs:111-182 is stream ops only); this module, like ``relational.py``,
is the query surface a reference user gains by moving to Spark.  Every
query is hash-checked against DuckDB.

Scale notes (100 TB):
- the correlated subquery is expressed as a window (one shuffle on the
  correlation key), not a per-row subplan — Catalyst would decorrelate
  anyway; writing it as a window makes the single-shuffle shape explicit.
- the range join carries an equality key (user_id) so it executes as a
  hash/sort-merge join with a residual band predicate — never a
  cross-product; skew on hot users is AQE's skew-join case.
- ntile/lag windows are all partitioned (no global ordering anywhere).
- cube/percentile are partial-aggregable built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from elastic_stream_spark.sources.envelope import EVENTS_NORM_SQL, load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17/Q22 family): orders whose
    totalprice exceeds 1.5× the average totalprice of the SAME customer.
    Decorrelated form: per-customer average via a window over the
    correlation key — one shuffle on o_custkey, no per-row subplan.
    The output carries the (integer, engine-stable) per-customer order
    count rather than the rounded average: a mean of 2-decimal prices
    frequently lands exactly on a round-half boundary where the two
    engines' summation order flips the 4th decimal."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .withColumn("n_orders", F.count("*").over(w))
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "n_orders",
        )
        .orderBy("o_orderkey")
    )


def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join customer→orders, per-customer
    order count (0 for customers with no orders), then the distribution
    of counts.  Two aggregations; the outer join preserves the zero
    bucket that an inner join would drop."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def top_balance_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregate (min_by/max_by family): per nation, the customer
    holding the maximum account balance.  Expressed as ``max(struct(...))``
    — an ALGEBRAIC aggregate (partial-aggregable, one shuffle on the
    group key), strictly cheaper than the rank-window formulation which
    must co-locate each group before ranking.  The struct's trailing
    c_custkey makes ties deterministic."""
    cust = _t(spark, sf_dir, "customer")
    m = F.max(F.struct("c_acctbal", "c_custkey")).alias("m")
    return (
        cust.groupBy("c_nationkey")
        .agg(m)
        .select(
            "c_nationkey",
            F.round(F.col("m.c_acctbal"), 4).alias("top_acctbal"),
            F.col("m.c_custkey").alias("top_custkey"),
        )
        .orderBy("c_nationkey")
    )


def event_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytics: per-user inter-event gaps (seconds), aggregated per
    event type.  The lag window shuffles once on user_id; ordering
    (ts, event_id) is unique per user so gaps are deterministic."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap_us = us - F.lag(us).over(w)  # exact integer µs diff
    # determinism: aggregate EXACT integer µs (BIGINT sum — no float
    # accumulation order), then divide once — avg = (Σµs / n) is an
    # exact-integer division (bit-identical across engines) and the
    # single /1e6 is one correctly-rounded IEEE op in both; round() on
    # such ratios is banned (timeseries.py determinism note)
    return (
        ev.withColumn("gap_us", gap_us)
        .where(F.col("gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            ((F.sum("gap_us") / F.count("*")) / F.lit(1e6)).alias("avg_gap_s"),
            (F.max("gap_us") / F.lit(1e6)).alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


def purchase_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: for each purchase, how many clicks the same
    user made in the hour BEFORE it ([ts-1h, ts)).  The equality key
    (user_id) makes this a hash join with a residual band predicate —
    never a cross-product; the left join keeps zero-click purchases."""
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    )
    return (
        joined.groupBy("purchase_id")
        .agg(F.count("c_user").alias("n_clicks_1h"))
        .orderBy("purchase_id")
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced conversion funnel over the event stream: per user, the
    earliest ``view``, the earliest ``click`` strictly after it, and the
    earliest ``purchase`` strictly after that click — per stage, how many
    users reached it and the average seconds from the previous stage
    (NULL for the entry stage).  The classic product-analytics funnel
    (the reference's event stream has no query surface at all; this is
    the first aggregation any consumer of it builds).

    Plan: three user-keyed aggregations chained by user_id equi-joins —
    each stage shuffles once on user_id and carries only (user, ts)
    rows, so the chain is |users|-sized after stage 1 regardless of
    event volume; the final output is three scalar aggregates unioned
    (3 rows).  No windows, no correlated subplans."""
    ev = _t(spark, sf_dir, "events")

    def stage(df: DataFrame, etype: str, prev: DataFrame | None, pcol: str, out: str) -> DataFrame:
        e = df.where(F.col("event_type") == etype).select("user_id", "ts")
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(out))
        return (
            e.join(prev, "user_id")
            .where(F.col("ts") > F.col(pcol))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out), F.min(pcol).alias(pcol))
        )

    s1 = stage(ev, "view", None, "", "t1")
    s2 = stage(ev, "click", s1, "t1", "t2")
    s3 = stage(ev, "purchase", s2, "t2", "t3")

    def lag_s(a: str, b: str):
        # determinism: exact integer-µs sum, one exact-int division, one
        # final /1e6 — bit-identical across engines (no round(), no
        # float-sum ordering; see event_gaps_lag)
        d = F.unix_micros(F.col(b)) - F.unix_micros(F.col(a))
        return (F.sum(d) / F.count("*")) / F.lit(1e6)

    r1 = s1.agg(F.count("*").alias("users")).select(
        F.lit(1).alias("stage"),
        F.lit("view").alias("stage_name"),
        "users",
        F.lit(None).cast("double").alias("avg_lag_s"),
    )
    r2 = s2.agg(
        F.count("*").alias("users"), lag_s("t1", "t2").alias("avg_lag_s")
    ).select(
        F.lit(2).alias("stage"),
        F.lit("click").alias("stage_name"),
        "users",
        "avg_lag_s",
    )
    r3 = s3.agg(
        F.count("*").alias("users"), lag_s("t2", "t3").alias("avg_lag_s")
    ).select(
        F.lit(3).alias("stage"),
        F.lit("purchase").alias("stage_name"),
        "users",
        "avg_lag_s",
    )
    return r1.unionByName(r2).unionByName(r3).orderBy("stage")


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day
    (cohort), then per (cohort_day, day_offset) the number of distinct
    cohort members active that many days later — the product-analytics
    retention triangle.

    Plan: one user-keyed min-aggregation assigns cohorts, a
    user-partitioned equi-join stamps each event with its user's cohort
    (both sides keyed on user_id — never a broadcast of the user
    dimension at scale), and ONE two-level distinct aggregation
    ((cohort, offset, user) dedup then rollup — single distinct group,
    no Expand) builds the matrix, whose size is bounded by days², not
    by event volume."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        # ISO string: Spark DATE surfaces as python date objects where
        # DuckDB's lands as datetime64 — the driver compare sees mixed
        # dtypes; both engines render 'YYYY-MM-DD' identically
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
            "n_active",
        )
        .orderBy("cohort_day", "day_offset")
    )


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 4 combinations of (returnflag,
    linestatus); complements rollup_revenue's hierarchy.  grouping_id
    disambiguates aggregate-null from data-null."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def price_quantiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90) per group — the interpolating
    ``percentile`` aggregate (DuckDB ``quantile_cont``).  Exact
    percentile sorts within groups; the 100 TB form is
    ``approx_percentile`` (KLL/GK sketch, partial-aggregable) — the
    exact one is the oracle-checkable correctness baseline."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


def acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: per-nation account-balance quartiles (partitioned
    window — no global sort), with per-bucket count and balance range."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("c_nationkey", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("c_acctbal"), 4).alias("lo"),
            F.round(F.max("c_acctbal"), 4).alias("hi"),
        )
        .orderBy("c_nationkey", "quartile")
    )


QUERIES = {
    "above_avg_orders": above_avg_orders,
    "order_count_distribution": order_count_distribution,
    "top_balance_per_nation": top_balance_per_nation,
    "event_gaps_lag": event_gaps_lag,
    "purchase_click_burst": purchase_click_burst,
    "event_funnel": event_funnel,
    "retention_cohorts": retention_cohorts,
    "cube_revenue": cube_revenue,
    "price_quantiles_by_flag": price_quantiles_by_flag,
    "acctbal_quartiles": acctbal_quartiles,
}

ORACLES = {
    "above_avg_orders": """
        SELECT o_orderkey, o_custkey,
               round(o_totalprice, 4) AS o_totalprice,
               n_orders
        FROM (
          SELECT o_orderkey, o_custkey, o_totalprice,
                 avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg,
                 count(*) OVER (PARTITION BY o_custkey) AS n_orders
          FROM orders
        )
        WHERE o_totalprice > 1.5 * cust_avg
        ORDER BY o_orderkey
    """,
    "order_count_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "top_balance_per_nation": """
        SELECT c_nationkey,
               round(c_acctbal, 4) AS top_acctbal,
               c_custkey AS top_custkey
        FROM (
          SELECT c_nationkey, c_acctbal, c_custkey,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
          FROM customer
        )
        WHERE rn = 1
        ORDER BY c_nationkey
    """,
    "event_gaps_lag": f"""
        WITH {EVENTS_NORM_SQL}
        SELECT event_type, count(*) AS n_gaps,
               (sum(gap_us) / count(*)) / 1e6 AS avg_gap_s,
               max(gap_us) / 1e6 AS max_gap_s
        FROM (
          SELECT event_type,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id) AS gap_us
          FROM events_n
        )
        WHERE gap_us IS NOT NULL
        GROUP BY event_type
        ORDER BY event_type
    """,
    "purchase_click_burst": f"""
        WITH {EVENTS_NORM_SQL}
        SELECT p.event_id AS purchase_id, count(c.user_id) AS n_clicks_1h
        FROM (SELECT * FROM events_n WHERE event_type = 'purchase') p
        LEFT OUTER JOIN (SELECT * FROM events_n WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts < p.ts
         AND c.ts >= p.ts - INTERVAL 1 HOUR
        GROUP BY p.event_id
        ORDER BY purchase_id
    """,
    "event_funnel": f"""
        WITH {EVENTS_NORM_SQL},
        s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events_n
          WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
          FROM events_n e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s1.t1
          GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, min(e.ts) AS t3, min(s2.t2) AS t2
          FROM events_n e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          GROUP BY e.user_id
        )
        SELECT 1 AS stage, 'view' AS stage_name, count(*) AS users,
               CAST(NULL AS DOUBLE) AS avg_lag_s
        FROM s1
        UNION ALL
        SELECT 2, 'click', count(*),
               (sum(epoch_us(t2) - epoch_us(t1)) / count(*)) / 1e6
        FROM s2
        UNION ALL
        SELECT 3, 'purchase', count(*),
               (sum(epoch_us(t3) - epoch_us(t2)) / count(*)) / 1e6
        FROM s3
        ORDER BY stage
    """,
    "retention_cohorts": f"""
        WITH {EVENTS_NORM_SQL},
        ev AS (
          SELECT user_id, CAST(ts AS DATE) AS day FROM events_n
        ), cohorts AS (
          SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
        )
        SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
               datediff('day', cohort_day, day) AS day_offset,
               count(DISTINCT ev.user_id) AS n_active
        FROM ev JOIN cohorts USING (user_id)
        GROUP BY cohorts.cohort_day, day_offset
        ORDER BY cohort_day, day_offset
    """,
    "cube_revenue": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n,
               CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
    "price_quantiles_by_flag": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
               round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "acctbal_quartiles": """
        SELECT c_nationkey, quartile, count(*) AS n,
               round(min(c_acctbal), 4) AS lo,
               round(max(c_acctbal), 4) AS hi
        FROM (
          SELECT c_nationkey, c_acctbal,
                 ntile(4) OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey) AS quartile
          FROM customer
        )
        GROUP BY c_nationkey, quartile
        ORDER BY c_nationkey, quartile
    """,
}
