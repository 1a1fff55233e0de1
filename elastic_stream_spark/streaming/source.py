"""Structured Streaming source over the record log.

≙ the reference's long-poll FETCH (docs/sbp.md:220-285): consumers see
records as they are appended.  The log's physical layout (append-only
parquet files under ``records/stream_id=*/range_index=*``) is exactly
Spark's file-stream contract — each ``StreamLog.append`` commits new
immutable files, the file source discovers them per microbatch, and
offset-ordering within a stream is restored by the envelope's ``offset``
column.  Long-poll ``max_wait_ms``/``min_bytes`` map onto the trigger
interval / ``maxFilesPerTrigger`` admission control; ``Trigger.AvailableNow``
is the catch-up-then-stop mode.

At scale the file listing is the same mechanism Spark uses for S3-backed
streaming tables; per-stream subscriptions prune to the stream's
directory, so discovery cost tracks the subscribed stream, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elastic_stream_spark.log import RECORD_SCHEMA, StreamLog


def read_records_stream(
    spark: SparkSession,
    log: StreamLog,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded view of the whole log (all streams), envelope schema."""
    reader = spark.readStream.schema(RECORD_SCHEMA).option(
        "basePath", log.records_root
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(log.records_root)


def read_stream(
    spark: SparkSession,
    log: StreamLog,
    stream_id: int,
    start_offset: int = 0,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Subscribe to one stream from ``start_offset`` — the streaming FETCH.
    The stream_id equality prunes the file listing to the stream's
    directory; the offset predicate drops already-consumed prefixes."""
    return read_records_stream(spark, log, max_files_per_trigger).where(
        (F.col("stream_id") == stream_id) & (F.col("offset") >= start_offset)
    )
