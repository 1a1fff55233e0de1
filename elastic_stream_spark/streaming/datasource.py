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
           .option("streamId", 3)
           .option("startOffset", 0)
           .option("maxRecordsPerTrigger", 500)
           .load())

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


class StreamLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["root"]
        self.stream_id = int(options["streamid"])
        self.start_offset = int(options.get("startoffset", 0))
        # record admission: offsets advance at most this much per trigger
        self.max_records = int(options.get("maxrecordspertrigger", 1 << 31))
        if self.max_records <= 0:
            raise ValueError("maxRecordsPerTrigger must be positive")
        # Subscription progress (≙ the consumer-group offset the reference
        # keeps in PD KV): ``latestOffset`` takes no start argument in the
        # Python source protocol, so the admitted window's base is tracked
        # here — in memory per trigger, persisted on ``commit`` so a
        # restarted query resumes admission from its true position instead
        # of re-admitting from startOffset.  One subscription per
        # checkpoint location (the Kafka group-id contract).
        self.subscription = str(
            options.get("subscription", f"sub-{self.stream_id}")
        )
        self._progress_path = os.path.join(
            self.root, "_source_progress", f"{self.subscription}.json"
        )
        self._last: int | None = None

    # ------------------------------------------------------------ offsets

    def _committed_progress(self) -> int:
        if not os.path.exists(self._progress_path):
            return self.start_offset
        with open(self._progress_path) as f:
            return max(self.start_offset, int(json.load(f)["offset"]))

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"offset": self.start_offset}

    def latestOffset(self) -> dict:  # noqa: N802
        committed = _read_next_offset(self.root, self.stream_id)
        base = self._committed_progress() if self._last is None else self._last
        # admit at most max_records new offsets this microbatch — the
        # maxOffsetsPerTrigger contract (offsets are records here)
        nxt = min(max(committed, base), base + self.max_records)
        self._last = nxt
        return {"offset": nxt}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["offset"]), int(end["offset"])
        if hi <= lo:
            return []
        out: list[RangeSlice] = []
        for r in _read_ranges(self.root, self.stream_id):
            r_lo = max(lo, int(r["start"]))
            r_hi = hi if r["end"] is None else min(hi, int(r["end"]))
            if r_hi <= r_lo:
                continue
            d = os.path.join(
                self.root,
                "records",
                f"stream_id={self.stream_id}",
                f"range_index={r['range_index']}",
            )
            out.append(
                RangeSlice(d, self.stream_id, int(r["range_index"]), r_lo, r_hi)
            )
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
            json.dump({"offset": int(end["offset"])}, f)
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
