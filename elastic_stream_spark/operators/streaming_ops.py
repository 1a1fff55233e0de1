"""Windowed / streaming-semantics operators over the event stream.

The reference's streaming surface is long-poll FETCH + retention/trim
(SURVEY.md §2.8).  Spark gives the full windowed-aggregation layer on top;
the north star requires tumbling/sliding/session windows, watermarks and
dedup.

Each aggregation here is written once as a *batch* DataFrame query using
the same window expressions Structured Streaming executes
(``F.window`` / ``F.session_window``) — so the DuckDB oracle can
hash-check the semantics — and `tests/test_streaming.py` re-runs the
identical aggregation through ``readStream`` (AvailableNow over parquet →
memory sink) asserting the streaming result equals the batch result, plus
watermark late-drop behavior.

Scale notes: windowed groupBy is partial-aggregable; session windows
shuffle once on the session key (user_id); streaming state lives in the
state store keyed by (key, window) with watermark-driven eviction — the
Spark analogue of the reference's retention-driven WAL reclaim
(wal.rs:362-377).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elastic_stream_spark.sources.envelope import EVENTS_NORM_SQL, load_table


def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + sum(value).
    The flagship query: the reference's append→fetch log expressed as
    windowed analytics over the stream."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour size, 30 minute slide — each event lands in
    2 windows.  Emits count + rounded sum, not avg: an average of
    2-decimal data over a power-of-two count lands exactly on the rounding
    boundary, where cross-engine summation-order noise flips the digit —
    sums keep a 0.005 margin over the ~1e-10 float noise."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
        .orderBy("window_start")
    )


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user: 30-minute inactivity gap.  Sessionization
    ≙ lag+cumsum in the batch/oracle formulation; ``F.session_window`` is
    the same semantics executed by the streaming state store."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup semantics (``dropDuplicates`` on a key): first event
    per (user_id, event_type) in ts order — the batch formulation of
    ``dropDuplicatesWithinWatermark``."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    )


HH_REPLAY_STREAMS = 4  # events partitioned into 4 logical streams


def stream_heavy_hitters_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of the bounded-state streaming heavy-hitters
    operator (``streaming/stateful.py`` — the space-saving sketch,
    Metwally et al.): events keyed into ``HH_REPLAY_STREAMS`` logical
    streams by ``user_id mod 4`` with ``key = event_type``, folded
    through the SAME ``space_saving_update`` the streaming operator
    runs, emitting each stream's top-5.

    Gate contract: at ``capacity (64) ≥ |event-type vocabulary|`` no
    eviction ever fires, so the sketch is provably the exact count table
    (err = 0, order-independent) and the output hash-checks against the
    exact DuckDB top-k oracle.  The bounded-state property the operator
    exists for — capacity ≪ vocabulary with the est−err ≤ true ≤ est
    guarantee — is asserted separately in tests/test_streaming.py.

    Plan: the raw events reduce through a partial-aggregable
    (stream, key) count FIRST — the only event-sized shuffle, map-side
    combined — and the Arrow-batched sketch fold then runs over the
    count table, whose per-stream group is VOCABULARY-sized, never
    event-sized (an applyInPandas directly over the events would
    materialize a whole logical stream in one task's memory — caught in
    review).  Folding pre-aggregated counts is a valid sketch fold
    (the streaming operator folds per-batch ``value_counts`` the same
    way) and is order-independent at capacity ≥ vocabulary."""
    import pandas as pd

    from elastic_stream_spark.streaming.stateful import (
        HH_CAPACITY,
        HH_TOP,
        space_saving_top,
        space_saving_update,
    )

    counts = (
        load_table(spark, sf_dir, "events")
        .select(
            F.pmod(F.col("user_id"), F.lit(HH_REPLAY_STREAMS)).alias("stream_id"),
            F.col("event_type").alias("key"),
        )
        .groupBy("stream_id", "key")
        .agg(F.count("*").alias("cnt"))
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        table: dict[str, list[int]] = {}
        space_saving_update(
            table,
            pd.Series(pdf["cnt"].to_numpy(), index=pdf["key"]),
            HH_CAPACITY,
        )
        top = space_saving_top(table, HH_TOP)
        return pd.DataFrame(
            {
                "stream_id": [int(pdf["stream_id"].iloc[0])] * len(top),
                "key": [kk for kk, _ in top],
                "est_count": [v[0] for _, v in top],
                "err": [v[1] for _, v in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return (
        counts.groupBy("stream_id")
        .applyInPandas(
            replay,
            schema="stream_id long, key string, est_count long, err long, rank int",
        )
        .orderBy("stream_id", "rank")
    )


def window_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed exact-distinct aggregation: unique users + event volume
    per tumbling hour — the cardinality-over-time panel every stream
    consumer builds first.

    Scale shape: a single COUNT DISTINCT group plans as TWO chained
    partial-aggregable hash aggregations ((window, user) dedup, then
    the window rollup) — no Expand (the q21 lesson: Expand appears only
    with ≥ 2 distinct groups).  At 100 TB the exact form shuffles the
    (window, user) pairs once; the sketch alternative
    (``approx_count_distinct`` / HLL, mergeable partials, no second
    shuffle of raw pairs) is the drop-in when ±2% error is acceptable —
    the exact form is registered because it is oracle-checkable."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "n_users", "n_events")
        .orderBy("window_start")
    )


SSJ_WINDOW_MIN = 120  # forward attribution window (minutes)


def stream_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of the watermarked stream-stream inner join — every
    (purchase, click) pair by the same user with the click inside
    ``[p_ts, p_ts + SSJ_WINDOW_MIN min]`` (forward attribution: which
    clicks a purchase led to).  ``tests/test_streaming.py::
    test_stream_stream_windowed_join`` proves the streaming execution of
    this exact join shape (both sides watermarked, state bounded by the
    watermark horizon) equals the batch result; this registered batch
    form gives the shape a driver hash gate.

    Plan: the user_id equality key makes this a hash/sort-merge join
    with a residual band predicate — never a cross-product (same
    contract as ``purchase_click_burst``, which is the backward-looking
    COUNT; this emits the forward pairs).  In streaming execution the
    state store holds only rows newer than watermark − window."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    # exact integer microseconds — a rounded float lag lands on .XXXX5
    # boundaries for micro-precise timestamps, where Spark's BigDecimal
    # HALF_UP and DuckDB's multiply-shift round diverge (caught at sf0.1)
    lag = F.unix_micros(F.col("c_ts")) - F.unix_micros(F.col("p_ts"))
    return (
        p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts"))
            & (
                F.col("c_ts")
                <= F.col("p_ts") + F.expr(f"INTERVAL {SSJ_WINDOW_MIN} MINUTES")
            ),
        )
        .select(
            "purchase_id",
            "click_id",
            F.col("p_user").alias("user_id"),
            lag.alias("lag_us"),
        )
        .orderBy("purchase_id", "click_id")
    )


QUERIES = {
    "tumbling_window_counts": tumbling_window_counts,
    "sliding_window_stats": sliding_window_stats,
    "session_windows": session_windows,
    "stream_dedup_events": stream_dedup_events,
    "stream_heavy_hitters_replay": stream_heavy_hitters_replay,
    "stream_join_replay": stream_join_replay,
    "window_unique_users": window_unique_users,
}

ORACLES = {
    "window_unique_users": f"""
        WITH {EVENTS_NORM_SQL}
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events_n
        GROUP BY window_start
        ORDER BY window_start
    """,
    "stream_join_replay": f"""
        WITH {EVENTS_NORM_SQL}
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               p.user_id AS user_id,
               epoch_us(c.ts) - epoch_us(p.ts) AS lag_us
        FROM (SELECT * FROM events_n WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events_n WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts
         AND c.ts <= p.ts + INTERVAL {SSJ_WINDOW_MIN} MINUTES
        ORDER BY purchase_id, click_id
    """,
    "tumbling_window_counts": f"""
        WITH {EVENTS_NORM_SQL}
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events_n
        GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    "sliding_window_stats": f"""
        WITH {EVENTS_NORM_SQL}, hits AS (
          SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value
          FROM events_n
          UNION ALL
          SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
                   AS window_start, value
          FROM events_n
        )
        SELECT window_start, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM hits
        GROUP BY window_start
        ORDER BY window_start
    """,
    "session_windows": f"""
        WITH {EVENTS_NORM_SQL}, gaps AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL '30 minutes'
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events_n
        ), sessions AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM gaps
        )
        SELECT min(ts) AS session_start, user_id,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM sessions
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    "stream_dedup_events": f"""
        SELECT user_id, event_type, event_id, ts
        FROM (
          SELECT user_id, event_type, event_id, ts,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM (WITH {EVENTS_NORM_SQL} SELECT * FROM events_n)
        )
        WHERE rn = 1
        ORDER BY user_id, event_type
    """,
    # exact top-k per stream: equals the sketch replay because capacity
    # ≥ vocabulary ⇒ no eviction ⇒ est_count is the exact count, err 0
    "stream_heavy_hitters_replay": """
        WITH counts AS (
          SELECT user_id % 4 AS stream_id, event_type AS key,
                 count(*) AS est_count
          FROM events GROUP BY stream_id, key
        ), ranked AS (
          SELECT stream_id, key, est_count, CAST(0 AS BIGINT) AS err,
                 CAST(row_number() OVER (PARTITION BY stream_id
                                         ORDER BY est_count DESC, key)
                      AS INT) AS rank
          FROM counts
        )
        SELECT stream_id, key, est_count, err, rank
        FROM ranked WHERE rank <= 5
        ORDER BY stream_id, rank
    """,
}
