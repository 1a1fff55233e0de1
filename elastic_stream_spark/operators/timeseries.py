"""Time-series analytics over the events and orders tables — hypertable
gap-fill with last-observation-carried-forward, time-RANGE rolling
aggregates, and Markov-style event-transition statistics.

The reference engine stores time-ordered records but queries them only by
offset/timestamp lookup (SURVEY.md §2 rows 2/20; pd/../handler timestamp
seek); these are the continuous-aggregate queries a metrics/observability
consumer runs on that data — the TimescaleDB `time_bucket_gapfill +
locf`, the trailing-window rollup, and per-entity sequence transitions.

Scale notes (100 TB):
- ``ts_gapfill_locf``: the hourly aggregation is one map-side-combinable
  groupBy; the bucket SPINE is generated from a broadcast scalar
  (min/max) cross the tiny type dimension — spine size = hours ×
  |types|, independent of event count, and the explode distributes.
  The LOCF window is per event_type ordered by bucket: at 100 TB you
  range-partition the spine by time and carry the per-partition seed
  (the standard parallel-prefix split); here |spine| per type is
  calendar-bounded (≤ hours-in-retention), documented and tiny relative
  to the event data.
- ``rolling_revenue_7d``: raw orders collapse to a DATE-DIMENSION-sized
  daily table first (one shuffle); the RANGE window runs on that
  calendar-bounded table (≤ days-in-retention rows), never on raw
  orders.  The window is intentionally unpartitioned-over-dates — a
  non-foldable constant key documents that the input is
  dimension-sized, same discipline as sources/envelope.py stream_dim.
- ``event_transitions``: the lag window is per user_id (user-partitioned
  shuffle, bounded per-user state); transition counts are one
  map-side-combinable aggregation over (from, to) pairs — |types|²
  output rows.
- Cross-engine determinism: counts stay integral end-to-end, and every
  published ratio is the UNROUNDED double of an exact-integer division
  (cent/milli-scaled sums ÷ counts) — both engines divide identical
  integers, so the doubles are bit-identical.  ``round()`` on a
  division result is banned here: a ratio of small integers can land
  EXACTLY on a decimal rounding tie (e.g. 123627/2400 = 51.51125),
  where Spark (BigDecimal of the shortest string, HALF_UP) and DuckDB
  (binary ×10^k then nearbyint) legitimately disagree — caught live by
  the sf0.1 gate on the gap-fill average.  Rounding exact-decimal
  VALUES (2-dp money, 3-dp interpolated bounds) stays safe because
  they can never sit on a deeper-decimal tie.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elastic_stream_spark.sources.envelope import EVENTS_NORM_SQL, load_table

ROLL_DAYS = 7  # trailing window width (days) for rolling_revenue_7d


def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-event-type rollup on a GAP-FILLED hour spine:
    ``n_events`` is zero-filled, ``avg_value_locf`` carries the last
    observed hourly average forward (NULL until a type's first
    observation) — the TimescaleDB ``time_bucket_gapfill`` + ``locf``
    semantics.

    Plan: one groupBy builds the observed hourly table; the spine is
    ``sequence(min_hour, max_hour, 1 hour)`` exploded per type (scalar
    bounds broadcast, types are a tiny distinct dim); a left join plus
    an ignorenulls ``last`` window fills the gaps."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket", F.date_trunc("hour", "ts")
    )
    # value is cent-precise in the fixture: sum exact integer cents,
    # divide once — bit-identical doubles in both engines (module
    # docstring, determinism note)
    hourly = ev.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long"))
            / (F.lit(100) * F.count("*"))
        ).alias("avg_value"),
    )
    bounds = ev.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    ).withColumn("k", F.lit(1))
    types = ev.select("event_type").distinct().withColumn("k", F.lit(1))
    spine = (
        types.join(F.broadcast(bounds), "k")
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_locf"),
        )
        .orderBy("event_type", "bucket")
    )


def rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue with a trailing ``ROLL_DAYS``-day RANGE-frame
    sum — the time-based rolling aggregate (frame = value range over
    days, NOT a row count, so calendar gaps shorten the frame).

    Plan: orders collapse to one row per order DATE first (the only
    data-sized shuffle), then the RANGE window runs over the
    calendar-bounded daily table on an integral day index."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("order_day"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .withColumn("day_idx", F.datediff("order_day", F.lit("1970-01-01")))
    )
    # constant non-foldable key: the window input is the daily dimension
    # (≤ days-in-retention rows), deliberately one partition — rationale
    # at sources/envelope.py stream_dim
    w = (
        Window.partitionBy(F.pmod(F.col("day_idx"), F.lit(1)))
        .orderBy("day_idx")
        .rangeBetween(-(ROLL_DAYS - 1), 0)
    )
    return (
        daily.select(
            "order_day",
            F.round("rev", 4).alias("day_revenue"),
            F.round(F.sum("rev").over(w), 4).alias(f"rolling_{ROLL_DAYS}d"),
        )
        .orderBy("order_day")
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix: consecutive event pairs
    (ordered by ts, event_id within each user) counted into
    (from_type, to_type, n) with row-normalized transition probability
    ``p = n / Σ_to n`` — the Markov-chain statistic behind funnel and
    session-flow analyses.

    Plan: one user-partitioned lag window, one map-side-combinable pair
    aggregation; the |types|²-row transition table normalizes against a
    window over itself."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .where(F.col("from_type").isNotNull())
        .select("from_type", F.col("event_type").alias("to_type"))
    )
    trans = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    w_from = Window.partitionBy("from_type")
    # unrounded exact-int division (module docstring, determinism note)
    return (
        trans.withColumn("p", F.col("n") / F.sum("n").over(w_from))
        .orderBy("from_type", "to_type")
    )


Z_FLAG = 2.0  # |z| threshold marking a day anomalous


def daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection on the daily event series: per
    (event_type, day) counts z-scored against that type's own
    daily-count distribution, flagged at ``|z| ≥ Z_FLAG`` — the ops
    alert behind traffic-drop / error-spike detection.

    Determinism note: mean/variance are derived from EXACT integer
    sums (Σn, Σn² over days are BIGINT arithmetic — no float
    accumulation order), so both engines compute bit-identical doubles
    from identical integers; z is published UNROUNDED (every step —
    subtract, divide, sqrt, divide — is one correctly-rounded IEEE op
    on identical inputs, so the doubles match bit-for-bit; round()
    could tie on a decimal boundary).  Degenerate types (a single
    observed day, or zero variance) publish NULL z / NULL is_anomaly
    in BOTH engines — without the guard Spark yields NULL on x/0 while
    DuckDB yields inf/nan (r7 ADVICE).

    Plan: one map-side-combinable (type, day) count, one |types|-row
    stats rollup joined back broadcast — two shuffles total, both on
    small keys."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n_days")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_days")) / (
        F.col("n_days") - 1
    )
    ok = (F.col("n_days") > 1) & (var > 0)
    z = F.when(ok, (F.col("n_events") - mean) / F.sqrt(var))
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            z.alias("z"),
            F.when(ok, F.abs(z) >= Z_FLAG).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


RFM_BUCKETS = 4


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer Recency (days since last
    order, vs the global max order date), Frequency (order count) and
    Monetary (total spend) quartiled with NTILE, rolled up to segment
    cells with customer count and average spend — the classic
    behavioral-segmentation operator.

    Determinism note: NTILE runs over CENT-ROUNDED monetary (exact tie
    semantics in both engines) with a custkey tie-break, so bucket
    boundaries cannot flip on float-sum noise.

    Plan: one per-customer aggregation of orders; the three NTILE
    windows run over the CUSTOMER-dimension-sized result (never raw
    orders); final rollup is |buckets|³ cells."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    maxd = orders.agg(F.max("o_orderdate").alias("maxd")).withColumn(
        "k", F.lit(1)
    )
    cust = (
        per_cust.withColumn("k", F.lit(1))
        .join(F.broadcast(maxd), "k")
        .withColumn("recency", F.datediff("maxd", "last_order"))
    )
    # constant non-foldable key: windows run over the customer dim
    # (rationale at sources/envelope.py stream_dim)
    const = F.pmod(F.col("o_custkey"), F.lit(1))
    w_r = Window.partitionBy(const).orderBy("recency", "o_custkey")
    w_f = Window.partitionBy(const).orderBy(F.desc("frequency"), F.asc("o_custkey"))
    w_m = Window.partitionBy(const).orderBy(F.desc("monetary"), F.asc("o_custkey"))
    scored = cust.select(
        "o_custkey",
        "monetary",
        F.ntile(RFM_BUCKETS).over(w_r).cast("long").alias("r_quartile"),
        F.ntile(RFM_BUCKETS).over(w_f).cast("long").alias("f_quartile"),
        F.ntile(RFM_BUCKETS).over(w_m).cast("long").alias("m_quartile"),
    )
    # cent-exact average: unrounded exact-int division (module
    # docstring, determinism note)
    return (
        scored.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count("*").alias("n_customers"),
            (
                F.sum(F.round(F.col("monetary") * 100).cast("long"))
                / (F.lit(100) * F.count("*"))
            ).alias("avg_monetary"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: each user's
    purchase-value changes become versioned validity intervals
    ``[valid_from, valid_to)`` with an open-ended current row — the
    temporal-table / dimension-versioning operator every warehouse
    keeps next to its fact tables (the reference stores the raw
    record stream; this derives the queryable history from it).

    Plan: ONE user-partitioned window pass (lead + row_number share the
    same sort), no self-join — the classic anti-pattern here is
    history-vs-history range join, which this shape replaces."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.row_number().over(w).cast("long").alias("version"),
            F.round("value", 4).alias("value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


def pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join: each click event gets the user's
    last purchase value AND purchase count as of that click's timestamp
    (inclusive) — the feature-store lookup that prevents label leakage
    (training features must reflect only what was known at event time).

    Plan: NO join at all — purchases and clicks union into one stream
    and a single user-partitioned window pass (ignorenulls ``last`` +
    running count) carries the feature forward; the classic
    merge-as-of-via-union shape.  At 100 TB this is one shuffle on
    user_id versus the per-event probe join a naive PIT lookup does.
    Equal-timestamp ties resolve purchase-before-click via a kind
    column in the sort key (inclusive as-of), identically in both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.round("value", 4).alias("pvalue"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind"), F.lit(None).cast("double").alias("pvalue")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = purchases.unionByName(clicks).select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last("pvalue", ignorenulls=True).over(w).alias("last_purchase_value"),
        F.count("pvalue").over(w).alias("purchases_before"),
    )
    return (
        merged.where(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
            "last_purchase_value",
            "purchases_before",
        )
        .orderBy("click_id")
    )


QUERIES = {
    "ts_gapfill_locf": ts_gapfill_locf,
    "rolling_revenue_7d": rolling_revenue_7d,
    "event_transitions": event_transitions,
    "daily_anomaly_zscore": daily_anomaly_zscore,
    "rfm_segments": rfm_segments,
    "scd2_user_history": scd2_user_history,
    "pit_feature_join": pit_feature_join,
}

ORACLES = {
    "ts_gapfill_locf": f"""
        WITH {EVENTS_NORM_SQL}, hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket,
                 count(*) AS n,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   / (100 * count(*)) AS avg_value
          FROM events_n GROUP BY event_type, bucket
        ), bounds AS (
          SELECT min(date_trunc('hour', ts)) AS lo,
                 max(date_trunc('hour', ts)) AS hi
          FROM events_n
        ), spine AS (
          SELECT t.event_type, s.bucket
          FROM (SELECT DISTINCT event_type FROM events_n) t
          CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
            FROM bounds
          ) s
        )
        SELECT spine.event_type, spine.bucket,
               CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
               last_value(h.avg_value IGNORE NULLS) OVER (
                 PARTITION BY spine.event_type ORDER BY spine.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_value_locf
        FROM spine LEFT JOIN hourly h
          ON spine.event_type = h.event_type AND spine.bucket = h.bucket
        ORDER BY spine.event_type, spine.bucket
    """,
    "rolling_revenue_7d": f"""
        WITH daily AS (
          SELECT date_trunc('day', o_orderdate) AS order_day,
                 sum(o_totalprice) AS rev,
                 datediff('day', DATE '1970-01-01',
                          date_trunc('day', o_orderdate)) AS day_idx
          FROM orders GROUP BY 1
        )
        SELECT order_day, round(rev, 4) AS day_revenue,
               round(sum(rev) OVER (
                 ORDER BY day_idx
                 RANGE BETWEEN {ROLL_DAYS - 1} PRECEDING AND CURRENT ROW
               ), 4) AS rolling_{ROLL_DAYS}d
        FROM daily
        ORDER BY order_day
    """,
    "event_transitions": f"""
        WITH {EVENTS_NORM_SQL}, pairs AS (
          SELECT lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS from_type,
                 event_type AS to_type
          FROM events_n
        ), trans AS (
          SELECT from_type, to_type, count(*) AS n
          FROM pairs WHERE from_type IS NOT NULL
          GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type) AS p
        FROM trans
        ORDER BY from_type, to_type
    """,
    "daily_anomaly_zscore": f"""
        WITH {EVENTS_NORM_SQL}, daily AS (
          SELECT event_type, date_trunc('day', ts) AS day,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events_n GROUP BY event_type, day
        ), stats AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(n_events) AS BIGINT) AS s1,
                 CAST(sum(n_events * n_events) AS BIGINT) AS s2
          FROM daily GROUP BY event_type
        ), z AS (
          SELECT d.event_type, d.day, d.n_events,
                 CASE WHEN n_days > 1
                       AND (s2 - s1 * s1 / n_days) / (n_days - 1) > 0
                      THEN (d.n_events - s1 / n_days)
                           / sqrt((s2 - s1 * s1 / n_days) / (n_days - 1))
                 END AS z
          FROM daily d JOIN stats s USING (event_type)
        )
        SELECT event_type, day, n_events, z,
               abs(z) >= {Z_FLAG} AS is_anomaly
        FROM z
        ORDER BY event_type, day
    """,
    "rfm_segments": f"""
        WITH per_cust AS (
          SELECT o_custkey,
                 max(o_orderdate) AS last_order,
                 CAST(count(*) AS BIGINT) AS frequency,
                 round(sum(o_totalprice), 2) AS monetary
          FROM orders GROUP BY o_custkey
        ), maxd AS (
          SELECT max(o_orderdate) AS maxd FROM orders
        ), scored AS (
          SELECT o_custkey, monetary,
                 CAST(ntile({RFM_BUCKETS}) OVER (
                   ORDER BY datediff('day', last_order, maxd), o_custkey
                 ) AS BIGINT) AS r_quartile,
                 CAST(ntile({RFM_BUCKETS}) OVER (
                   ORDER BY frequency DESC, o_custkey
                 ) AS BIGINT) AS f_quartile,
                 CAST(ntile({RFM_BUCKETS}) OVER (
                   ORDER BY monetary DESC, o_custkey
                 ) AS BIGINT) AS m_quartile
          FROM per_cust CROSS JOIN maxd
        )
        SELECT r_quartile, f_quartile, m_quartile,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CAST(round(monetary * 100) AS BIGINT)) AS BIGINT)
                 / (100 * count(*)) AS avg_monetary
        FROM scored
        GROUP BY r_quartile, f_quartile, m_quartile
        ORDER BY r_quartile, f_quartile, m_quartile
    """,
    "scd2_user_history": f"""
        WITH {EVENTS_NORM_SQL}
        SELECT user_id,
               CAST(row_number() OVER w AS BIGINT) AS version,
               round(value, 4) AS value,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               lead(ts) OVER w IS NULL AS is_current
        FROM events_n
        WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, version
    """,
    "pit_feature_join": f"""
        WITH {EVENTS_NORM_SQL}, merged AS (
          SELECT user_id, ts, event_id, 0 AS kind,
                 round(value, 4) AS pvalue
          FROM events_n WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, event_id, 1 AS kind,
                 CAST(NULL AS DOUBLE) AS pvalue
          FROM events_n WHERE event_type = 'click'
        ), carried AS (
          SELECT user_id, ts, event_id, kind,
                 last_value(pvalue IGNORE NULLS) OVER w
                   AS last_purchase_value,
                 CAST(count(pvalue) OVER w AS BIGINT) AS purchases_before
          FROM merged
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_id AS click_id, user_id, ts AS click_ts,
               last_purchase_value, purchases_before
        FROM carried WHERE kind = 1
        ORDER BY click_id
    """,
}
