from elastic_stream_spark.streaming.source import read_stream, read_records_stream
from elastic_stream_spark.streaming.sink import ExactlyOnceAppendSink

__all__ = ["read_stream", "read_records_stream", "ExactlyOnceAppendSink"]
