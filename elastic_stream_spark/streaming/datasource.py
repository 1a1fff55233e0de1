"""Record-count-admitted Structured Streaming source (Python Data Source).

≙ the reference's FETCH record/byte budget with long-poll
(docs/sbp.md:220-285): every production consumer's first knob is "at most
N records per poll".  The file-source subscription (``source.read_stream``)
maps the BYTE and FILE budgets onto ``maxBytesPerTrigger`` /
``maxFilesPerTrigger``, but Spark's file source admits whole files and
cannot cap *rows* per microbatch.  This module closes that gap with a real
Structured Streaming source built on the PySpark Python Data Source API
(SPARK-44076, pyspark 4.x): stream offsets ARE the source's offsets, so
record admission is exact — ``latestOffset`` advances by at most
``maxRecordsPerTrigger`` past the last committed position, the
``maxOffsetsPerTrigger`` contract Kafka consumers rely on.

Plan shape: one ``InputPartition`` per overlapping catalog range, read
executor-side as Arrow batches via pyarrow dataset with an offset-window
filter (row-group stats skip non-overlapping row groups — the same sparse
-index pruning as the batch fetch path).  Availability comes from the
catalog's committed ``next_offset`` (driver-side metadata read, no data
scan, no directory listing) — discovery cost is O(1) per trigger
regardless of log size.

Usage::

    spark.dataSource.register(StreamLogDataSource)
    sdf = (spark.readStream.format("stream_log")
           .option("root", catalog_root)
           .option("streamId", 3)            # or .option("streamIds", "3,7,9")
           .option("startOffset", 0)
           .option("maxRecordsPerTrigger", 500)
           .option("maxBytesPerTrigger", 1_000_000)  # optional, approximate
           .load())

Multi-stream subscription (≙ FETCH's N-streams-per-request batching,
docs/sbp.md:220-285; batch layout range-server/src/handler/append.rs:21-29):
``streamIds`` takes a comma-separated list; source offsets become a
per-stream map, microbatch partitions are the union of per-stream range
slices, and the record-admission budget is split fairly across streams
with backlog (waterfall allocation in stream-id order — total admitted
per trigger never exceeds ``maxRecordsPerTrigger``).  Single-stream
subscriptions keep the scalar offset format, so existing checkpoints
resume unchanged.

Exactly-once downstream is unchanged: pair with
``ExactlyOnceAppendSink`` or any idempotent ``foreachBatch``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# DDL mirror of log.RECORD_SCHEMA (kept literal: the data source must not
# import Spark-session machinery at executor unpickle time).
RECORD_DDL = (
    "stream_id BIGINT, range_index INT, offset BIGINT, ts TIMESTAMP, "
    "properties MAP<STRING,STRING>, payload BINARY"
)


@dataclass
class RangeSlice(InputPartition):
    """One catalog range ∩ the microbatch's offset window."""

    range_dir: str
    stream_id: int
    range_index: int
    lo: int  # inclusive
    hi: int  # exclusive


def _read_shard(root: str, stream_id: int) -> dict | None:
    """The stream's catalog shard (``streams/<sid>.json``) — a plain JSON
    read so partition planning needs no catalog class on executors; one
    shard is O(this stream), independent of catalog size."""
    path = os.path.join(root, "streams", f"{stream_id}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _read_next_offset(root: str, stream_id: int) -> int:
    """Committed next_offset from the catalog shard — the availability
    probe (driver-side, metadata-only; ≙ the long-poll's confirm-offset
    check, docs/sbp.md:246-252)."""
    data = _read_shard(root, stream_id)
    return 0 if data is None else int(data["stream"]["next_offset"])


def _read_ranges(root: str, stream_id: int) -> list[dict]:
    data = _read_shard(root, stream_id)
    return [] if data is None else data["ranges"]


def _stream_disk_stats(root: str, stream_id: int) -> tuple[int, int]:
    """(total_bytes, total_files) across the stream's range directories —
    driver-side os.scandir only, no data read.  Used to estimate average
    on-disk bytes/record for the byte-budget admission knob."""
    base = os.path.join(root, "records", f"stream_id={stream_id}")
    total = files = 0
    if not os.path.isdir(base):
        return 0, 0
    for rng in os.scandir(base):
        if not rng.is_dir():
            continue
        for f in os.scandir(rng.path):
            if f.name.endswith(".parquet"):
                total += f.stat().st_size
                files += 1
    return total, files


def fair_split(backlog: dict[int, int], budget: int) -> dict[int, int]:
    """Waterfall allocation of ``budget`` records over per-stream
    backlogs, iterating in stream-id order.  Invariants (property-tested):
    Σ admitted == min(budget, Σ backlog); 0 ≤ admitted[s] ≤ backlog[s];
    no stream is short-changed unless the budget ran out (any stream left
    with backlog implies the full budget was spent)."""
    admitted = {s: 0 for s in backlog}
    backlog = dict(backlog)
    remaining = budget
    while remaining > 0:
        active = [s for s in sorted(backlog) if backlog[s] > 0]
        if not active:
            break
        share = max(1, remaining // len(active))
        for s in active:
            take = min(share, backlog[s], remaining)
            admitted[s] += take
            backlog[s] -= take
            remaining -= take
            if remaining == 0:
                break
    return admitted


class StreamLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["root"]
        ids = options.get("streamids", options.get("streamid"))
        if ids is None:
            raise ValueError("stream_log source needs streamId or streamIds")
        self.stream_ids = [int(s) for s in str(ids).split(",") if s.strip() != ""]
        if len(self.stream_ids) != len(set(self.stream_ids)):
            raise ValueError(f"duplicate stream ids in subscription: {ids}")
        # startOffset: one value for all streams, or a comma list matching
        # streamIds positionally
        raw_start = str(options.get("startoffset", 0))
        parts = [int(s) for s in raw_start.split(",")]
        if len(parts) == 1:
            self.start_offsets = {sid: parts[0] for sid in self.stream_ids}
        elif len(parts) == len(self.stream_ids):
            self.start_offsets = dict(zip(self.stream_ids, parts))
        else:
            raise ValueError("startOffset list must match streamIds length")
        # record admission: offsets advance at most this much per trigger,
        # summed over every subscribed stream
        self.max_records = int(options.get("maxrecordspertrigger", 1 << 31))
        if self.max_records <= 0:
            raise ValueError("maxRecordsPerTrigger must be positive")
        # byte admission (≙ FETCH's max_bytes budget, docs/sbp.md:220-285):
        # approximate — converted to per-stream record caps using the
        # stream's average ON-DISK bytes/record (parquet file sizes over
        # committed records; driver-side metadata scan, cached per
        # next_offset).  Whole records only, and any stream with backlog
        # is admitted at least one record per trigger (the reference's
        # fetch returns one batch even when it alone exceeds the budget).
        self.max_bytes = int(options.get("maxbytespertrigger", 0)) or None
        if self.max_bytes is not None and self.max_bytes <= 0:
            raise ValueError("maxBytesPerTrigger must be positive")
        self._avg_cache: dict[int, tuple[int, float]] = {}
        # Subscription progress (≙ the consumer-group offset the reference
        # keeps in PD KV): ``latestOffset`` takes no start argument in the
        # Python source protocol, so the admitted window's base is tracked
        # here — in memory per trigger, persisted on ``commit`` so a
        # restarted query resumes admission from its true position instead
        # of re-admitting from startOffset.  One subscription per
        # checkpoint location (the Kafka group-id contract).
        default_sub = "sub-" + "-".join(str(s) for s in self.stream_ids)
        self.subscription = str(options.get("subscription", default_sub))
        self._progress_path = os.path.join(
            self.root, "_source_progress", f"{self.subscription}.json"
        )
        self._last: dict[int, int] | None = None

    # ------------------------------------------------------------ offsets

    def _to_wire(self, offsets: dict[int, int]) -> dict:
        """Serialize per-stream offsets.  Single-stream subscriptions keep
        the scalar {"offset": n} format so pre-existing checkpoints (and
        their progress files) resume unchanged."""
        if len(self.stream_ids) == 1:
            return {"offset": offsets[self.stream_ids[0]]}
        return {"offsets": {str(s): offsets[s] for s in self.stream_ids}}

    def _from_wire(self, wire: dict) -> dict[int, int]:
        if "offsets" in wire:
            return {int(k): int(v) for k, v in wire["offsets"].items()}
        return {self.stream_ids[0]: int(wire["offset"])}

    def _committed_progress(self) -> dict[int, int]:
        if not os.path.exists(self._progress_path):
            return dict(self.start_offsets)
        with open(self._progress_path) as f:
            saved = self._from_wire(json.load(f))
        return {
            s: max(self.start_offsets[s], saved.get(s, self.start_offsets[s]))
            for s in self.stream_ids
        }

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return self._to_wire(dict(self.start_offsets))

    def latestOffset(self) -> dict:  # noqa: N802
        base = self._committed_progress() if self._last is None else self._last
        backlog = {
            s: max(0, _read_next_offset(self.root, s) - base[s])
            for s in self.stream_ids
        }
        admitted = fair_split(backlog, self.max_records)
        if self.max_bytes is not None:
            admitted = self._apply_byte_cap(admitted, backlog)
        nxt = {s: base[s] + admitted[s] for s in self.stream_ids}
        self._last = nxt
        return self._to_wire(nxt)

    def _avg_record_bytes(self, sid: int) -> float | None:
        """Average on-disk bytes per committed record, cached until the
        stream's next_offset moves (sealed data is immutable, so the
        estimate only improves as new ranges land)."""
        committed = _read_next_offset(self.root, sid)
        if committed <= 0:
            return None
        hit = self._avg_cache.get(sid)
        if hit is not None and hit[0] == committed:
            return hit[1]
        total_bytes, files = _stream_disk_stats(self.root, sid)
        if files == 0 or total_bytes <= 0:
            return None
        avg = total_bytes / committed
        self._avg_cache[sid] = (committed, avg)
        return avg

    def _apply_byte_cap(
        self, admitted: dict[int, int], backlog_left: dict[int, int]
    ) -> dict[int, int]:
        """Tighten the record-split so estimated on-disk bytes stay within
        ``max_bytes``: the byte budget is fair-split the same way as the
        record budget, converted per stream via its bytes/record average;
        every stream keeps ≥1 admitted record if it had any."""
        byte_backlog = {}
        avgs = {}
        for s, rec in admitted.items():
            avg = self._avg_record_bytes(s)
            avgs[s] = avg
            byte_backlog[s] = int(rec * avg) if (avg and rec > 0) else 0
        byte_share = fair_split(byte_backlog, self.max_bytes)
        out = {}
        for s, rec in admitted.items():
            avg = avgs[s]
            if rec == 0 or avg is None:
                out[s] = rec  # no estimate → record cap alone governs
                continue
            # nearest whole record: the budget is an estimate already
            # (on-disk average), so strict flooring would only compound
            # truncation; ≥1 keeps the first-record guarantee
            cap = max(1, int(byte_share[s] / avg + 0.5))
            out[s] = min(rec, cap)
        return out

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo_map, hi_map = self._from_wire(start), self._from_wire(end)
        out: list[RangeSlice] = []
        for sid in self.stream_ids:
            lo = lo_map.get(sid, self.start_offsets[sid])
            hi = hi_map.get(sid, lo)
            if hi <= lo:
                continue
            for r in _read_ranges(self.root, sid):
                r_lo = max(lo, int(r["start"]))
                r_hi = hi if r["end"] is None else min(hi, int(r["end"]))
                if r_hi <= r_lo:
                    continue
                d = os.path.join(
                    self.root,
                    "records",
                    f"stream_id={sid}",
                    f"range_index={r['range_index']}",
                )
                out.append(RangeSlice(d, sid, int(r["range_index"]), r_lo, r_hi))
        return out

    # --------------------------------------------------------------- read

    def read(self, partition: RangeSlice) -> Iterator:  # executor-side
        import pyarrow as pa
        import pyarrow.dataset as ds

        if not os.path.isdir(partition.range_dir):
            return
        dset = ds.dataset(partition.range_dir, format="parquet")
        flt = (ds.field("offset") >= partition.lo) & (
            ds.field("offset") < partition.hi
        )
        for batch in dset.to_batches(
            filter=flt, columns=["offset", "ts", "properties", "payload"]
        ):
            if batch.num_rows == 0:
                continue
            n = batch.num_rows
            # Spark writes INT96 timestamps, which pyarrow surfaces as
            # nanos; Spark's Arrow ingest takes micros
            ts = batch.column("ts").cast(pa.timestamp("us"))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([partition.stream_id] * n, type=pa.int64()),
                    pa.array([partition.range_index] * n, type=pa.int32()),
                    batch.column("offset"),
                    ts,
                    batch.column("properties"),
                    batch.column("payload"),
                ],
                names=[
                    "stream_id",
                    "range_index",
                    "offset",
                    "ts",
                    "properties",
                    "payload",
                ],
            )

    def commit(self, end: dict) -> None:
        """Persist subscription progress (atomic rename).  Exactness note:
        Spark's checkpoint remains the source of truth for batch replay;
        this file only floors the NEXT admission window, and every crash
        interleaving keeps the window ≤ maxRecordsPerTrigger (the window
        [checkpointed_end, floor + max_records] is always within one cap
        of the floor)."""
        os.makedirs(os.path.dirname(self._progress_path), exist_ok=True)
        tmp = self._progress_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(end, f)  # already wire format (scalar or per-stream)
        os.replace(tmp, self._progress_path)

    def stop(self) -> None:
        pass


class StreamLogDataSource(DataSource):
    """``format("stream_log")`` — the record log as a first-class Spark
    source with exact record-count admission."""

    @classmethod
    def name(cls) -> str:
        return "stream_log"

    def schema(self) -> str:
        return RECORD_DDL

    def streamReader(self, schema) -> StreamLogStreamReader:  # noqa: N802
        return StreamLogStreamReader(self.options)
