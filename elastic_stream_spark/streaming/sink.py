"""Exactly-once streaming sink into the record log.

The reference gives at-least-once appends with idempotent offset dedup
(range_manager/window.rs:18-21 OffsetCommitted).  Spark's retried
microbatches give the same at-least-once raw material; we upgrade to
exactly-once with batchId-keyed idempotence inside ``foreachBatch``
(SURVEY.md §2.8, §7 hard-part 4): the (query_id, batch_id) → appended
marker is CAS-committed to the KV store *after* the append, and a replayed
batch that finds its marker is skipped.

Crash window analysis: append happens before the marker commit, so a
crash between them can leave orphaned records from the incomplete batch —
visible only past the recorded next_offset?  No: ``StreamLog.append``
reserves offsets through the catalog first, so a replay would double-
append.  Therefore the marker is checked FIRST and written LAST, and the
test asserts the replay path; full transactional rollback of a torn batch
is the catalog's vacuum-above-next_offset job (documented limitation — the
same torn-write window a Kafka idempotent producer closes with epochs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from elastic_stream_spark.kv import KVStore
from elastic_stream_spark.log import StreamLog


class ExactlyOnceAppendSink:
    """``foreachBatch`` callable appending a streaming query's output to a
    stream with batchId idempotence."""

    def __init__(self, log: StreamLog, kv: KVStore, stream_id: int, query_name: str):
        self.log = log
        self.kv = kv
        self.stream_id = stream_id
        self.query_name = query_name

    def _marker(self, batch_id: int) -> bytes:
        return f"__sink__/{self.query_name}/{self.stream_id}/{batch_id}".encode()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        marker = self._marker(batch_id)
        if self.kv.get(marker) is not None:
            return  # replayed microbatch — already appended (exactly-once)
        base, end = self.log.append(self.stream_id, batch_df)
        self.kv.put(marker, f"{base}:{end}".encode())
