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
           .option("maxBytesPerTrigger", 1_000_000)  # hard cap (row-group priced)
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
import math
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


def _read_confirmed_offset(root: str, stream_id: int) -> int:
    """Durable availability probe (driver-side, metadata-only; ≙ the
    long-poll's confirm-offset check, docs/sbp.md:246-252): the CONFIRM
    offset, advanced only after a reserved block's data write lands.
    Admitting the reserve-time ``next_offset`` instead would let the
    source plan a window over an in-flight write, find zero rows at
    read time, commit the batch, and permanently skip the records that
    land moments later (silent loss — caught in review).  Falls back to
    next_offset for shards written before the confirm field existed."""
    data = _read_shard(root, stream_id)
    if data is None:
        return 0
    s = data["stream"]
    return int(s.get("confirmed_offset", s["next_offset"]))


def _read_ranges(root: str, stream_id: int) -> list[dict]:
    data = _read_shard(root, stream_id)
    return [] if data is None else data["ranges"]


def _stream_row_groups(root: str, stream_id: int) -> list[tuple[int, int, int, int]]:
    """(offset_lo, offset_hi, n_rows, compressed_bytes) per parquet row
    group across the stream's range files, offset-sorted — footer metadata
    only (the same footers the fetch path reads for row-group pruning),
    no data read.  The byte-admission cost model prices an offset window
    at Σ overlap_rows × (group_bytes / group_rows): exact per row group,
    so cross-range payload skew cannot fool the budget the way a
    stream-wide average could."""
    import pyarrow.parquet as pq

    base = os.path.join(root, "records", f"stream_id={stream_id}")
    out: list[tuple[int, int, int, int]] = []
    if not os.path.isdir(base):
        return out
    for rng in sorted(os.scandir(base), key=lambda e: e.name):
        if not rng.is_dir():
            continue
        for f in sorted(os.scandir(rng.path), key=lambda e: e.name):
            if not f.name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(f.path).metadata
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                lo = hi = None
                nbytes = 0
                for ci in range(rg.num_columns):
                    col = rg.column(ci)
                    nbytes += col.total_compressed_size
                    if col.path_in_schema == "offset" and col.statistics is not None:
                        lo = int(col.statistics.min)
                        hi = int(col.statistics.max)
                if lo is None or rg.num_rows == 0:
                    continue
                out.append((lo, hi, rg.num_rows, int(nbytes)))
    out.sort()
    return out


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
        # a HARD cap under per-row-group accounting — the admitted window
        # is priced from parquet footer row-group sizes (offset stats +
        # compressed bytes; driver-side metadata read, cached per
        # next_offset), never a stream-wide average.  Whole records only.
        # Progress guarantee: when the budget admits nothing anywhere,
        # exactly ONE record of the single lowest-id backlogged stream is
        # admitted (the reference's fetch returns one batch even when it
        # alone exceeds the budget) — the only case admitted bytes can
        # exceed the cap, bounded by one record.
        raw_mb = options.get("maxbytespertrigger")
        self.max_bytes = None if raw_mb is None else int(raw_mb)
        if self.max_bytes is not None and self.max_bytes <= 0:
            raise ValueError("maxBytesPerTrigger must be positive")
        self._rg_cache: dict[int, tuple[int, list[tuple[int, int, int, int]]]] = {}
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
        # Spark calls this only when the CHECKPOINT has no offsets — a
        # genuinely new query.  Reset the subscription's progress file to
        # the start offsets: a stale file from a previous query life
        # (checkpoint deleted, same subscription name) would otherwise
        # floor the first admission window at its old position, making
        # the first microbatch span [startOffset, old_progress + cap) —
        # unbounded, violating the per-trigger cap (review finding).
        if os.path.exists(self._progress_path):
            os.makedirs(os.path.dirname(self._progress_path), exist_ok=True)
            tmp = self._progress_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self._to_wire(dict(self.start_offsets)), f)
            os.replace(tmp, self._progress_path)
        return self._to_wire(dict(self.start_offsets))

    def latestOffset(self) -> dict:  # noqa: N802
        base = self._committed_progress() if self._last is None else self._last
        backlog = {
            s: max(0, _read_confirmed_offset(self.root, s) - base[s])
            for s in self.stream_ids
        }
        admitted = fair_split(backlog, self.max_records)
        if self.max_bytes is not None:
            admitted = self._apply_byte_cap(admitted, base)
        nxt = {s: base[s] + admitted[s] for s in self.stream_ids}
        self._last = nxt
        return self._to_wire(nxt)

    def _row_groups(self, sid: int) -> list[tuple[int, int, int, int]]:
        """Footer row-group index for the stream, cached until its
        CONFIRM offset moves (landed data is immutable, so the index
        only grows as new blocks confirm).  Keying the cache on the
        reserve-time next_offset froze a mid-write (incomplete) footer
        listing until the next reservation; the confirm offset only
        advances after the files are durable, so a refreshed listing is
        always complete up to the key."""
        committed = _read_confirmed_offset(self.root, sid)
        hit = self._rg_cache.get(sid)
        if hit is not None and hit[0] == committed:
            return hit[1]
        groups = _stream_row_groups(self.root, sid)
        self._rg_cache[sid] = (committed, groups)
        return groups

    def _window_cost(self, sid: int, base: int, n_records: int) -> float:
        """Exact-per-row-group price of the offset window
        [base, base + n_records)."""
        end = base + n_records
        cost = 0.0
        for lo, hi, n, nbytes in self._row_groups(sid):
            rows_in = min(hi + 1, end) - max(lo, base)
            if rows_in > 0:
                cost += rows_in * (nbytes / n)
        return cost

    def _admit_within(self, sid: int, base: int, rec_cap: int, byte_share: float) -> int:
        """Max OFFSETS from ``base`` (≤ rec_cap) whose per-row-group cost
        stays within ``byte_share`` — the walk admits whole records,
        group by group, flooring inside the group where the budget runs
        out.  The admitted window is an OFFSET SPAN: offsets falling in a
        gap with no resident rows (a trim/compaction hole before the
        first surviving row group) cost nothing and are admitted freely.
        The previous row-count walk computed a NEGATIVE avail across such
        a gap and stalled byte-capped admission at one offset per trigger
        (caught in review)."""
        end_cap = base + rec_cap
        cur = base  # next offset to admit
        spent = 0.0
        for lo, hi, n, nbytes in self._row_groups(sid):
            if cur >= end_cap or hi < cur:
                continue
            if lo > cur:
                # gap below this group: free offsets
                cur = min(lo, end_cap)
                if cur >= end_cap:
                    break
            per_row = nbytes / n
            avail = min(hi + 1, end_cap) - cur
            affordable = int((byte_share - spent) / per_row)
            take = min(avail, affordable)
            if take <= 0:
                break
            cur += take
            spent += take * per_row
            if take < avail:
                break
        return cur - base

    def _apply_byte_cap(
        self, admitted: dict[int, int], base: dict[int, int]
    ) -> dict[int, int]:
        """Tighten the record-split so per-row-group-priced bytes stay
        within ``max_bytes``: fair-split the byte budget over each
        stream's exact window cost, then walk each stream's row groups
        within its share.  Spent ≤ share per stream and Σ shares ≤
        max_bytes, so the cap is hard; leftover budget then un-starves
        streams one record at a time (id order), still within the cap;
        only when NOTHING fits anywhere does the single lowest-id
        backlogged stream admit one record past the budget."""
        # ceil: the backlog must not under-ask by a fractional byte (the
        # affordability walk floors again); shares stay ≤ max_bytes via
        # fair_split regardless
        byte_backlog = {
            s: math.ceil(self._window_cost(s, base[s], rec)) if rec else 0
            for s, rec in admitted.items()
        }
        byte_share = fair_split(byte_backlog, self.max_bytes)
        out = {}
        spent_total = 0.0
        for s, rec in admitted.items():
            if rec == 0:
                out[s] = 0
                continue
            out[s] = self._admit_within(s, base[s], rec, float(byte_share[s]))
            spent_total += self._window_cost(s, base[s], out[s])
        # leftover pass: a stream starved by share quantization gets its
        # next record if the whole-budget residual affords it
        for s in sorted(admitted):
            if out[s] == 0 and admitted[s] > 0:
                cost1 = self._window_cost(s, base[s], 1)
                if spent_total + cost1 <= self.max_bytes:
                    out[s] = 1
                    spent_total += cost1
        if all(v == 0 for v in out.values()):
            starved = [s for s in sorted(admitted) if admitted[s] > 0]
            if starved:
                out[starved[0]] = 1  # documented single-record overshoot
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
            if partition.hi > partition.lo:
                # the planned window covers CONFIRMED offsets, so the
                # data must exist on disk — a missing dir means a
                # concurrent maintenance swap is mid-rename (or its
                # crash leftover).  Raising lets Spark retry the task —
                # at-most-delay — where silently yielding nothing would
                # commit the batch and permanently skip the records
                # (caught in review).
                raise FileNotFoundError(
                    f"range dir missing for confirmed offsets "
                    f"[{partition.lo}, {partition.hi}): {partition.range_dir} "
                    "(concurrent maintenance swap? re-run sweep/vacuum to "
                    "repair after a maintenance crash)"
                )
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
