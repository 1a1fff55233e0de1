from elastic_stream_spark.streaming.source import read_stream, read_records_stream
from elastic_stream_spark.streaming.sink import ExactlyOnceAppendSink
from elastic_stream_spark.streaming.metrics import (
    MetricsRecorder,
    metrics_summary,
    read_metrics,
    read_metrics_stream,
)

__all__ = [
    "read_stream",
    "read_records_stream",
    "ExactlyOnceAppendSink",
    "MetricsRecorder",
    "metrics_summary",
    "read_metrics",
    "read_metrics_stream",
]
