"""Stream-surface operators over the derived record envelope.

These re-express the reference's wire operations (SURVEY.md §2.1-§2.6) as
Spark queries on the envelope view so the DuckDB oracle can hash-check
them:

- FETCH (0x1002)        → ``fetch_range``          handler/fetch.rs:48-155
- DESCRIBE_STREAM/RANGE → ``describe_streams``      stream.go:98-115
- LIST_RANGE (0x2001)   → ``list_ranges``           range.go:49-126
- TRIM_STREAM (0x3005)  → ``trim_fetch``            rpc.fbs:571-581
- offset accounting     → ``offset_accounting``     replication_stream.rs:241-300
- KV Range scan         → ``kv_range_scan``         rpc.fbs:788-819
- schema-on-read decode → ``payload_decode``        (opaque payload → typed
  columns at query time, the Kafka-source convention — SURVEY.md §1.2)

Plan shape at scale: every query filters on ``stream_id`` (partition
pruning in the physical layout of ``log.py``) and/or aggregates per
(stream_id, range_index); offset predicates push to parquet row-group
stats.  None of these collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elastic_stream_spark.sources.envelope import ENVELOPE_SQL, events_envelope

# Fixed fetch window exercised by the correctness gate.
FETCH_STREAM, FETCH_LO, FETCH_HI = 1, 50, 150
TRIM_AT = 120


def fetch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FETCH stream=1 offsets [50, 150) in offset order, envelope +
    decoded columns (payload bytes excluded from compare — see
    envelope.ENVELOPE_SQL note)."""
    env = events_envelope(spark, sf_dir)
    return (
        env.where(
            (F.col("stream_id") == FETCH_STREAM)
            & (F.col("offset") >= FETCH_LO)
            & (F.col("offset") < FETCH_HI)
        )
        .select("stream_id", "range_index", "offset", "ts", "event_id", "user_id", "value")
        .orderBy("offset")
    )


def describe_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE_STREAM over every stream: start/next offsets + record count.
    start_offset = 0 (untrimmed fixture), next_offset = count."""
    env = events_envelope(spark, sf_dir)
    return (
        env.groupBy("stream_id")
        .agg(
            F.min("offset").alias("start_offset"),
            (F.max("offset") + 1).alias("next_offset"),
            F.count("*").alias("record_count"),
        )
        .orderBy("stream_id")
    )


def list_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIST_RANGE: per-range [start, end) bounds; left-inclusive /
    right-exclusive, range[i].end == range[i+1].start (FIXTURES.md B.1
    invariant)."""
    env = events_envelope(spark, sf_dir)
    return (
        env.groupBy("stream_id", "range_index")
        .agg(
            F.min("offset").alias("start"),
            (F.max("offset") + 1).alias("end"),
            F.count("*").alias("n_records"),
        )
        .orderBy("stream_id", "range_index")
    )


def trim_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRIM_STREAM(stream=1, at=120) then full fetch: nothing below the
    trim horizon survives; per-range counts reflect the shrink."""
    env = events_envelope(spark, sf_dir)
    return (
        env.where((F.col("stream_id") == FETCH_STREAM) & (F.col("offset") >= TRIM_AT))
        .groupBy("range_index")
        .agg(
            F.min("offset").alias("start"),
            (F.max("offset") + 1).alias("end"),
            F.count("*").alias("n_records"),
        )
        .orderBy("range_index")
    )


def offset_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confirm/next-offset bookkeeping per stream joined with stream
    identity (event_type) — the monotonic max aggregate of SURVEY §2.5
    row 25."""
    env = events_envelope(spark, sf_dir)
    return (
        env.groupBy("stream_id", "event_type")
        .agg((F.max("offset") + 1).alias("next_offset"))
        .orderBy("stream_id")
    )


def kv_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """etcd-style Range scan [key, range_end) with limit, mapped onto a
    demo keyspace (nation names).  ≙ rpc.fbs:788-819: ordered scan +
    limit paging."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        nation.where((F.col("n_name") >= "NATION_1") & (F.col("n_name") < "NATION_2"))
        .select(F.col("n_name").alias("key"), F.col("n_nationkey").cast("long").alias("version"))
        .orderBy("key")
        .limit(8)
    )


def payload_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read: decode the opaque JSON `props` payload into typed
    columns at query time and aggregate on a decoded field.  ≙ the
    payload-is-opaque-bytes contract (flat_record.rs:30) + Spark's
    from_json convention."""
    env = events_envelope(spark, sf_dir)
    decoded = env.withColumn("props_struct", F.from_json(F.col("props"), "k INT"))
    return (
        decoded.groupBy(
            F.floor(F.col("props_struct.k") / 10).cast("long").alias("k_decile")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("k_decile")
    )


QUERIES = {
    "fetch_range": fetch_range,
    "describe_streams": describe_streams,
    "list_ranges": list_ranges,
    "trim_fetch": trim_fetch,
    "offset_accounting": offset_accounting,
    "kv_range_scan": kv_range_scan,
    "payload_decode": payload_decode,
}

_ENV = f"WITH records AS ({ENVELOPE_SQL})"

ORACLES = {
    "fetch_range": f"""
        {_ENV}
        SELECT stream_id, range_index, "offset", ts, event_id, user_id, value
        FROM records
        WHERE stream_id = {FETCH_STREAM} AND "offset" >= {FETCH_LO} AND "offset" < {FETCH_HI}
        ORDER BY "offset"
    """,
    "describe_streams": f"""
        {_ENV}
        SELECT stream_id, min("offset") AS start_offset,
               max("offset") + 1 AS next_offset, count(*) AS record_count
        FROM records GROUP BY stream_id ORDER BY stream_id
    """,
    "list_ranges": f"""
        {_ENV}
        SELECT stream_id, range_index, min("offset") AS start,
               max("offset") + 1 AS "end", count(*) AS n_records
        FROM records GROUP BY stream_id, range_index
        ORDER BY stream_id, range_index
    """,
    "trim_fetch": f"""
        {_ENV}
        SELECT range_index, min("offset") AS start, max("offset") + 1 AS "end",
               count(*) AS n_records
        FROM records
        WHERE stream_id = {FETCH_STREAM} AND "offset" >= {TRIM_AT}
        GROUP BY range_index ORDER BY range_index
    """,
    "offset_accounting": f"""
        {_ENV}
        SELECT stream_id, event_type, max("offset") + 1 AS next_offset
        FROM records GROUP BY stream_id, event_type ORDER BY stream_id
    """,
    "kv_range_scan": """
        SELECT n_name AS key, CAST(n_nationkey AS BIGINT) AS version
        FROM nation
        WHERE n_name >= 'NATION_1' AND n_name < 'NATION_2'
        ORDER BY key LIMIT 8
    """,
    "payload_decode": f"""
        {_ENV}
        SELECT CAST(floor(CAST(json_extract(props, '$.k') AS INT) / 10.0) AS BIGINT) AS k_decile,
               count(*) AS n, round(sum(value), 4) AS sum_value
        FROM records GROUP BY k_decile ORDER BY k_decile
    """,
}
