"""Exactly-once streaming sink into the record log.

The reference gives at-least-once appends with idempotent offset dedup
(range_manager/window.rs:18-21 OffsetCommitted).  Spark's retried
microbatches give the same at-least-once raw material; we upgrade to
exactly-once with a two-phase, batchId-keyed marker in the KV store
(SURVEY.md §2.8, §7 hard-part 4):

1. reserve the offset block through the catalog, then CAS-create the
   marker ``reserved:<base>:<end>:<range_index>`` (create-if-absent — a
   concurrent/zombie attempt loses the CAS and backs off);
2. write the stamped records;
3. flip the marker to ``committed:<base>:<end>``.

Crash windows, all safe:
- after reserve, before marker  → the reservation leaks (offset gap, no
  duplicate) — the same gap a fenced writer leaves in the reference;
- after marker, before write    → replay counts 0 rows in ``[base, end)``
  → re-writes the SAME offsets via ``write_stamped`` (no new
  reservation, no duplicates);
- DURING the write (torn job commit — parquet task files land
  independently, the job commit is not atomic) → replay counts
  ``0 < n < end - base`` rows → deletes the partial files of that offset
  span (footer offset stats identify them; a reserved block belongs to
  exactly one attempt) and re-writes the block — no silent tail loss, no
  doubled offsets;
- after write, before commit    → replay counts exactly ``end - base``
  rows → flips to committed without writing.

Mode contract: the sink is for ``append``/``update`` output modes, where
each microbatch carries only new/changed rows.  ``complete`` mode re-emits
the whole result every trigger — appending it would duplicate prior
windows by design; use foreachBatch overwrite semantics for that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from elastic_stream_spark.kv import KVStore
from elastic_stream_spark.log import StreamLog


class ExactlyOnceAppendSink:
    """``foreachBatch`` callable appending a streaming query's output to a
    stream with two-phase batchId idempotence (see module docstring)."""

    def __init__(self, log: StreamLog, kv: KVStore, stream_id: int, query_name: str):
        self.log = log
        self.kv = kv
        self.stream_id = stream_id
        self.query_name = query_name

    def _marker(self, batch_id: int) -> bytes:
        return f"__sink__/{self.query_name}/{self.stream_id}/{batch_id}".encode()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        marker = self._marker(batch_id)
        ent = self.kv.get(marker)
        if ent is not None:
            value, version = ent
            state = value.decode()
            if state.startswith("committed:"):
                return  # replayed microbatch — already fully applied
            # torn attempt: reserved:<base>:<end>:<range_index>
            _, base_s, end_s, ridx_s = state.split(":")
            base, end, ridx = int(base_s), int(end_s), int(ridx_s)
            n_present = self.log.count_span(self.stream_id, base, end)
            if n_present != end - base:
                # 0 < n_present < end-base: the crash tore the parquet job
                # commit mid-way — some task files landed, some didn't.
                # Remove the partial files for this reserved span before
                # re-writing, else the append-mode rewrite would double
                # the offsets that did land.
                if n_present > 0:
                    self.log.delete_offset_span(self.stream_id, ridx, base, end)
                batch = self.log.prepare_batch(batch_df)
                n = batch.count()
                if n != end - base:
                    raise RuntimeError(
                        f"replayed batch {batch_id} size {n} != reserved "
                        f"block [{base},{end}) — non-deterministic source replay"
                    )
                self.log.write_stamped(self.stream_id, batch, base, ridx)
            self.kv.cas(marker, version, f"committed:{base}:{end}".encode())
            # block verified durable (count_span == end-base or rewritten)
            # → advance the confirm offset downstream readers admit on
            self.log.catalog.confirm_offset(self.stream_id, end)
            return

        batch = self.log.prepare_batch(batch_df)
        n = batch.count()
        if n == 0:
            self.kv.cas(marker, 0, b"committed:0:0")
            return
        base, rng = self.log.catalog.reserve_offsets(self.stream_id, n)
        if not self.kv.cas(
            marker, 0, f"reserved:{base}:{base + n}:{rng.range_index}".encode()
        ):
            return  # lost the create race — another attempt owns this batch
        self.log.write_stamped(self.stream_id, batch, base, rng.range_index)
        ent = self.kv.get(marker)
        assert ent is not None
        self.kv.cas(marker, ent[1], f"committed:{base}:{base + n}".encode())
        self.log.catalog.confirm_offset(self.stream_id, base + n)
