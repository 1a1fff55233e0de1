"""Stream/range catalog — the engine's metadata plane.

Reference parity (citations into /root/reference):
- CREATE/DELETE/UPDATE/DESCRIBE_STREAM  ≙ pd/pkg/server/cluster/stream.go:28-115
- LIST/CREATE/SEAL/DESCRIBE_RANGE       ≙ pd/pkg/server/cluster/range.go:49-349
- TRIM_STREAM                           ≙ rpc.fbs:571-581 (semantics; the
  reference's client impl is todo!() — we implement it fully)
- epoch fencing                         ≙ rpc.fbs:48-51 (EXPIRED_RANGE_EPOCH),
  seal flow components/replication/src/stream/replication_range.rs:312-428
- ALLOCATE_ID                           ≙ pd/pkg/server/id/

Design stance (SURVEY.md §7): metadata is tiny (thousands of rows for
thousands of streams) and strongly consistent, so it lives in a driver-side
JSON snapshot committed by atomic rename — the Spark-world analogue of the
reference's etcd-backed placement driver.  The *data* plane (records) is
distributed parquet handled by ``log.py``.  On a 1000-executor cluster the
catalog is still driver-side: every real lakehouse commit log (Delta,
Iceberg) works exactly this way — a serialized metadata tx protecting
massively parallel data files.

Concurrency: a per-catalog ``fcntl`` file lock serializes metadata
transactions across processes; epoch fencing rejects zombie writers
(a writer holding a stale epoch gets ``FencedError``, mirroring the
reference's EXPIRED_RANGE_EPOCH error path).
"""

from __future__ import annotations

import fcntl
import json
import os
import tempfile
import time
from contextlib import contextmanager
from dataclasses import asdict, dataclass, field


class StreamNotFound(KeyError):
    pass


class RangeNotFound(KeyError):
    pass


class FencedError(RuntimeError):
    """Writer presented a stale epoch (≙ EXPIRED_RANGE_EPOCH, rpc.fbs:48-51)."""


class OffsetOutOfOrder(RuntimeError):
    """Append base offset does not match next expected offset
    (≙ range-server/src/range_manager/window.rs:79 check_barrier)."""


class SealedRange(RuntimeError):
    """Write addressed to a sealed (immutable) range."""


@dataclass
class StreamMeta:
    """≙ rpc.fbs:479-494 Stream table."""

    stream_id: int
    replica: int = 1
    ack_count: int = 1
    retention_ms: int = -1  # -1 = infinite
    created_at_ms: int = 0
    deleted: bool = False
    start_offset: int = 0  # advanced by trim
    next_offset: int = 0  # next offset to be assigned by append
    epoch: int = 0  # writer fencing token


@dataclass
class RangeMeta:
    """≙ rpc.fbs:392-424 Range table: [start, end) of the stream's offset
    space; end is None while the range is mutable (only the last range of a
    stream is mutable — components/model/src/stream/mod.rs:5-21)."""

    stream_id: int
    range_index: int
    epoch: int
    start: int
    end: int | None = None
    sealed: bool = False

    def contains(self, offset: int) -> bool:
        # ≙ components/model/src/range/mod.rs:88-99
        if offset < self.start:
            return False
        return self.end is None or offset < self.end


@dataclass
class _CatalogState:
    next_stream_id: int = 0
    revision: int = 0  # monotone change-feed revision (≙ etcd mod_revision)
    streams: dict = field(default_factory=dict)  # str(stream_id) -> StreamMeta dict
    ranges: dict = field(default_factory=dict)  # str(stream_id) -> [RangeMeta dict]
    # last txn's change-feed file, carried INSIDE the atomic catalog.json
    # commit: {"name": "<rev>.json", "lines": [...]} — republished to
    # changes/ after commit (idempotent, byte-identical), so the feed can
    # never contain events of an uncommitted txn and never permanently
    # misses events of a committed one.
    pending_changes: dict | None = None


# Change-feed event schema (≙ LIST/WATCH_RESOURCE, rpc.fbs:691-778: each
# event carries the resource, the change kind, and the catalog revision —
# the continuation token a watcher resumes from).
CHANGES_SCHEMA = (
    "revision BIGINT, ts_ms BIGINT, kind STRING, resource_type STRING, "
    "stream_id BIGINT, range_index BIGINT, detail STRING"
)


class StreamCatalog:
    """Metadata plane: stream + range lifecycle with epoch fencing.

    All mutating methods are transactions: load snapshot under lock,
    mutate, atomic-rename commit.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, "catalog.json")
        self._lock_path = os.path.join(root, "catalog.lock")

    # ------------------------------------------------------------------ io

    @contextmanager
    def _txn(self):
        """Metadata transaction.  Change-feed ordering (the crash-safe
        part): staged events are serialized INTO the catalog.json commit
        (``pending_changes``), and the ``changes/`` file is written only
        AFTER that commit.  A crash before the commit leaves no trace (no
        phantom events for a txn that never happened); a crash after the
        commit but before the file write is repaired by the next txn /
        ``changes()`` read, which republishes the exact recorded bytes —
        same name, same content — so a FileStreamSource watcher (which
        never re-reads a filename) still sees every committed revision
        exactly once."""
        with open(self._lock_path, "a") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            state = self._load()
            self._publish_pending(state)  # repair a prior crash window
            state.pending_events = []  # staged by _emit
            yield state
            self._stage_events(state)
            self._commit(state)
            self._publish_pending(state)

    @staticmethod
    def _emit(
        st: _CatalogState,
        kind: str,
        resource_type: str,
        stream_id: int,
        range_index: int | None = None,
        **detail,
    ) -> None:
        """Stage a change-feed event inside the current txn (≙ the
        resource events of WATCH_RESOURCE, rpc.fbs:735-760)."""
        st.pending_events.append((kind, resource_type, stream_id, range_index, detail))

    def _stage_events(self, st: _CatalogState) -> None:
        """Serialize staged events into ``st.pending_changes`` (one
        JSON-lines file per txn, named by first revision), stamping
        consecutive revisions and the event timestamp.  The serialized
        lines are recorded verbatim so a post-crash republish is
        byte-identical."""
        evs = getattr(st, "pending_events", [])
        if not evs:
            st.pending_changes = None
            return
        first_rev = st.revision + 1
        now_ms = int(time.time() * 1000)
        lines = []
        for kind, rtype, sid, ridx, detail in evs:
            st.revision += 1
            lines.append(
                json.dumps(
                    {
                        "revision": st.revision,
                        "ts_ms": now_ms,
                        "kind": kind,
                        "resource_type": rtype,
                        "stream_id": sid,
                        "range_index": ridx,
                        "detail": json.dumps(detail, sort_keys=True),
                    }
                )
            )
        st.pending_changes = {"name": f"{first_rev:012d}.json", "lines": lines}

    def _publish_pending(self, st: _CatalogState) -> None:
        """Write the committed txn's events file under ``changes/`` if not
        already present.  Idempotent and deterministic (exact recorded
        bytes): safe to call from any reader/writer at any time after the
        catalog commit.  One file per txn keeps the directory a valid
        Structured-Streaming file source (``watch_resources``)."""
        pending = st.pending_changes
        if not pending:
            return
        changes_dir = os.path.join(self.root, "changes")
        os.makedirs(changes_dir, exist_ok=True)
        path = os.path.join(changes_dir, pending["name"])
        if os.path.exists(path):
            return
        # tmp lives OUTSIDE changes/ so file-source listings never see it
        tmp = os.path.join(self.root, f".changes-{pending['name']}.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(pending["lines"]) + "\n")
        os.replace(tmp, path)

    def _load(self) -> _CatalogState:
        if not os.path.exists(self._meta_path):
            return _CatalogState()
        with open(self._meta_path) as f:
            raw = json.load(f)
        return _CatalogState(**raw)

    def _commit(self, state: _CatalogState) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".catalog-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(asdict(state), f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._meta_path)  # atomic commit
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # --------------------------------------------------------- stream ops

    def create_stream(
        self, replica: int = 1, ack_count: int = 1, retention_ms: int = -1
    ) -> StreamMeta:
        """≙ CREATE_STREAM 0x3001 (pd/pkg/server/cluster/stream.go:28-56);
        id from the catalog allocator (≙ ALLOCATE_ID, pd/pkg/server/id/)."""
        with self._txn() as st:
            sid = st.next_stream_id
            st.next_stream_id += 1
            meta = StreamMeta(
                stream_id=sid,
                replica=replica,
                ack_count=ack_count,
                retention_ms=retention_ms,
                created_at_ms=int(time.time() * 1000),
            )
            st.streams[str(sid)] = asdict(meta)
            # first mutable range, index 0  (≙ first append triggers
            # CreateRange — pd/pkg/server/cluster/range.go:188-239)
            st.ranges[str(sid)] = [asdict(RangeMeta(sid, 0, 0, 0))]
            self._emit(st, "created", "stream", sid)
            self._emit(st, "created", "range", sid, 0, start=0)
            return meta

    def describe_stream(self, stream_id: int) -> StreamMeta:
        """≙ DESCRIBE_STREAM 0x3004 (pd/pkg/server/cluster/stream.go:98-115)."""
        st = self._load()
        raw = st.streams.get(str(stream_id))
        if raw is None or raw["deleted"]:
            raise StreamNotFound(stream_id)
        return StreamMeta(**raw)

    def update_stream(self, stream_id: int, **updates) -> StreamMeta:
        """≙ UPDATE_STREAM 0x3003 (pd/pkg/server/cluster/stream.go:79-96).
        Only replica/ack_count/retention_ms are user-mutable."""
        allowed = {"replica", "ack_count", "retention_ms"}
        bad = set(updates) - allowed
        if bad:
            raise ValueError(f"not user-mutable: {sorted(bad)}")
        with self._txn() as st:
            raw = st.streams.get(str(stream_id))
            if raw is None or raw["deleted"]:
                raise StreamNotFound(stream_id)
            raw.update(updates)
            self._emit(st, "updated", "stream", stream_id, **updates)
            return StreamMeta(**raw)

    def delete_stream(self, stream_id: int) -> None:
        """≙ DELETE_STREAM 0x3002 — tombstone; data reclaim is deferred to
        the retention/vacuum job (pd/pkg/server/cluster/stream.go:58-77)."""
        with self._txn() as st:
            raw = st.streams.get(str(stream_id))
            if raw is None:
                raise StreamNotFound(stream_id)
            raw["deleted"] = True
            self._emit(st, "deleted", "stream", stream_id)

    def list_streams(self, include_deleted: bool = False) -> list[StreamMeta]:
        st = self._load()
        out = [StreamMeta(**raw) for raw in st.streams.values()]
        if not include_deleted:
            out = [s for s in out if not s.deleted]
        return sorted(out, key=lambda s: s.stream_id)

    # ---------------------------------------------------------- range ops

    def list_ranges(
        self,
        stream_id: int,
        filter: "Callable[[RangeMeta], bool] | None" = None,
    ) -> list[RangeMeta]:
        """≙ LIST_RANGE 0x2001 (pd/pkg/server/cluster/range.go:49-126).
        ``filter`` is the range-filter closure of the reference's store
        scan API (components/store/src/lib.rs:68-84): a predicate applied
        per range during the scan, e.g. ``lambda r: r.sealed`` or an
        offset-window overlap test."""
        st = self._load()
        raws = st.ranges.get(str(stream_id))
        if raws is None:
            raise StreamNotFound(stream_id)
        out = [RangeMeta(**r) for r in raws]
        return [r for r in out if filter(r)] if filter is not None else out

    def writable_range(self, stream_id: int) -> RangeMeta:
        last = self.list_ranges(stream_id)[-1]
        if last.sealed:
            raise SealedRange(f"stream {stream_id} has no mutable range")
        return last

    def describe_range(self, stream_id: int, range_index: int) -> RangeMeta:
        """≙ DESCRIBE_RANGE 0x2005."""
        for r in self.list_ranges(stream_id):
            if r.range_index == range_index:
                return r
        raise RangeNotFound((stream_id, range_index))

    def seal_range(self, stream_id: int, epoch: int, end: int | None = None) -> RangeMeta:
        """Seal the mutable range and open its successor.

        ≙ SEAL_RANGE 0x2002 (pd/pkg/server/cluster/range.go:127-186; client
        seal components/replication/src/stream/replication_range.rs:312-428).
        The sealing writer must present an epoch >= the current one; the
        successor range is created at the sealed end with epoch+1, so any
        writer still holding the old epoch is fenced on its next append.
        """
        with self._txn() as st:
            sraw = st.streams.get(str(stream_id))
            if sraw is None or sraw["deleted"]:
                raise StreamNotFound(stream_id)
            if epoch < sraw["epoch"]:
                raise FencedError(
                    f"seal epoch {epoch} < stream epoch {sraw['epoch']}"
                )
            ranges = st.ranges[str(stream_id)]
            last = ranges[-1]
            if last["sealed"]:
                raise SealedRange(f"range {last['range_index']} already sealed")
            sealed_end = sraw["next_offset"] if end is None else end
            if sealed_end < last["start"]:
                raise ValueError("seal end below range start")
            if sealed_end > sraw["next_offset"]:
                raise ValueError(
                    f"seal end {sealed_end} beyond next_offset {sraw['next_offset']}"
                )
            # offsets in [end, next_offset) are already assigned — and may
            # be physically written in this range's directory.  Sealing
            # below them would leave records above the metadata end, which
            # a later trim+vacuum at >= end would silently delete.  Reject
            # instead of clamping (the reference seals at the confirmed
            # offset, which is never below assigned-and-acked).
            if sealed_end < sraw["next_offset"]:
                raise ValueError(
                    f"seal end {sealed_end} below next_offset "
                    f"{sraw['next_offset']}: offsets past it are already "
                    "assigned; seal at next_offset or later"
                )
            last["end"] = sealed_end
            last["sealed"] = True
            new_epoch = sraw["epoch"] + 1
            sraw["epoch"] = new_epoch
            ranges.append(
                asdict(
                    RangeMeta(stream_id, last["range_index"] + 1, new_epoch, sealed_end)
                )
            )
            self._emit(
                st, "sealed", "range", stream_id, last["range_index"], end=sealed_end
            )
            self._emit(
                st,
                "created",
                "range",
                stream_id,
                last["range_index"] + 1,
                start=sealed_end,
            )
            return RangeMeta(**last)

    # --------------------------------------------------------- offset ops

    def reserve_offsets(self, stream_id: int, count: int, epoch: int | None = None) -> tuple[int, RangeMeta]:
        """Atomically reserve ``count`` contiguous offsets on the mutable
        range; returns (base_offset, range).  This is the serialized
        offset-assignment point ≙ the reference's per-range write window
        (range-server/src/range_manager/window.rs:7-211): requests are
        admitted in order and offsets never have gaps.
        """
        with self._txn() as st:
            sraw = st.streams.get(str(stream_id))
            if sraw is None or sraw["deleted"]:
                raise StreamNotFound(stream_id)
            if epoch is not None and epoch != sraw["epoch"]:
                raise FencedError(
                    f"append epoch {epoch} != stream epoch {sraw['epoch']}"
                )
            last = st.ranges[str(stream_id)][-1]
            if last["sealed"]:
                raise SealedRange(f"stream {stream_id} mutable range is sealed")
            base = sraw["next_offset"]
            sraw["next_offset"] = base + count
            return base, RangeMeta(**last)

    def bulk_register(
        self, stream_id: int, next_offset: int, range_size: int
    ) -> list[RangeMeta]:
        """Register range metadata for a bulk-loaded stream (the recovery /
        object-offload path: data files landed via ``StreamLog.bulk_load``,
        metadata reconstructed here — ≙ the reference's range recovery from
        offloaded objects, components/object-storage/src/range_offload.rs,
        where range bounds are rebuilt from committed object metadata).

        Ranges are cut every ``range_size`` offsets; all but the last are
        sealed, the last is the mutable range.  Epoch = range_index (one
        seal per boundary).
        """
        with self._txn() as st:
            sraw = st.streams.get(str(stream_id))
            if sraw is None or sraw["deleted"]:
                raise StreamNotFound(stream_id)
            n_full = next_offset // range_size
            ranges = [
                asdict(
                    RangeMeta(
                        stream_id, i, i, i * range_size, (i + 1) * range_size, True
                    )
                )
                for i in range(n_full)
            ]
            ranges.append(
                asdict(RangeMeta(stream_id, n_full, n_full, n_full * range_size))
            )
            st.ranges[str(stream_id)] = ranges
            sraw["next_offset"] = next_offset
            sraw["epoch"] = n_full
            for r in ranges:
                self._emit(
                    st,
                    "created",
                    "range",
                    stream_id,
                    r["range_index"],
                    start=r["start"],
                    end=r["end"],
                )
            # stream post-image (≙ WATCH_RESOURCE events carrying the full
            # resource payload, rpc.fbs:735-760): a watcher folding the
            # feed can reconstruct stream extent without reading ranges
            self._emit(
                st,
                "updated",
                "stream",
                stream_id,
                start_offset=sraw["start_offset"],
                next_offset=next_offset,
            )
            return [RangeMeta(**r) for r in ranges]

    # ------------------------------------------------------- change feed

    @property
    def revision(self) -> int:
        """Current catalog revision — the continuation token a watcher
        resumes from (≙ rpc.fbs:713-716 resource_version)."""
        return self._load().revision

    def changes(self, spark, from_revision: int = 0):
        """LIST_RESOURCE-style batch read of the change feed: every
        committed catalog mutation with revision > ``from_revision``, in
        revision order."""
        from pyspark.sql import functions as F

        self._publish_pending(self._load())  # repair a prior crash window
        changes_dir = os.path.join(self.root, "changes")
        if not os.path.isdir(changes_dir) or not os.listdir(changes_dir):
            return spark.createDataFrame([], CHANGES_SCHEMA)
        df = spark.read.schema(CHANGES_SCHEMA).json(changes_dir)
        return df.where(F.col("revision") > from_revision).orderBy("revision")

    def watch_resources(self, spark, from_revision: int = 0):
        """WATCH_RESOURCE ≙ rpc.fbs:762-778: a streaming DataFrame of
        catalog mutations after ``from_revision``.  Built on the file
        source (one small JSON file per committed txn), so standard
        Structured Streaming checkpointing gives resumable, in-order,
        at-least-once watch delivery — the same contract etcd watch
        gives the reference's PD clients."""
        from pyspark.sql import functions as F

        self._publish_pending(self._load())  # repair a prior crash window
        changes_dir = os.path.join(self.root, "changes")
        os.makedirs(changes_dir, exist_ok=True)
        sdf = spark.readStream.schema(CHANGES_SCHEMA).json(changes_dir)
        return sdf.where(F.col("revision") > from_revision)

    def trim_stream(self, stream_id: int, new_start_offset: int) -> StreamMeta:
        """≙ TRIM_STREAM 0x3005 (rpc.fbs:571-581): advance the minimum
        readable offset; drop ranges entirely below it and shrink the one
        straddling it.  Physical data reclaim happens in ``log.vacuum``.
        """
        with self._txn() as st:
            sraw = st.streams.get(str(stream_id))
            if sraw is None or sraw["deleted"]:
                raise StreamNotFound(stream_id)
            if new_start_offset <= sraw["start_offset"]:
                return StreamMeta(**sraw)
            if new_start_offset > sraw["next_offset"]:
                raise ValueError("cannot trim past next_offset")
            sraw["start_offset"] = new_start_offset
            kept = []
            for raw in st.ranges[str(stream_id)]:
                if raw["end"] is not None and raw["end"] <= new_start_offset:
                    # entirely below the trim point → dropped
                    self._emit(st, "deleted", "range", stream_id, raw["range_index"])
                    continue
                if raw["start"] < new_start_offset:
                    raw["start"] = new_start_offset  # straddling → shrink
                    # post-image for feed folders (fold_resource_feed)
                    self._emit(
                        st,
                        "updated",
                        "range",
                        stream_id,
                        raw["range_index"],
                        start=new_start_offset,
                    )
                kept.append(raw)
            st.ranges[str(stream_id)] = kept
            self._emit(
                st, "trimmed", "stream", stream_id, start_offset=new_start_offset
            )
            return StreamMeta(**sraw)
