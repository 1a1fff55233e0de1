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
- Cross-engine determinism: averages/probabilities are rounded (4 dp)
  BEFORE any carry-forward or ranking so both engines propagate
  identical doubles; counts stay integral end-to-end.
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
    hourly = ev.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
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
    return (
        trans.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(w_from), 4)
        )
        .orderBy("from_type", "to_type")
    )


QUERIES = {
    "ts_gapfill_locf": ts_gapfill_locf,
    "rolling_revenue_7d": rolling_revenue_7d,
    "event_transitions": event_transitions,
}

ORACLES = {
    "ts_gapfill_locf": f"""
        WITH {EVENTS_NORM_SQL}, hourly AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket,
                 count(*) AS n, round(avg(value), 4) AS avg_value
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
               round(CAST(n AS DOUBLE)
                     / sum(n) OVER (PARTITION BY from_type), 4) AS p
        FROM trans
        ORDER BY from_type, to_type
    """,
}
