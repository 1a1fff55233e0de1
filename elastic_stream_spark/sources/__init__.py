from elastic_stream_spark.sources.envelope import events_envelope, load_table, load_tables

__all__ = ["events_envelope", "load_table", "load_tables"]
