"""Stream/range catalog — the engine's metadata plane.

Reference parity (citations into /root/reference):
- CREATE/DELETE/UPDATE/DESCRIBE_STREAM  ≙ pd/pkg/server/cluster/stream.go:28-115
- LIST/CREATE/SEAL/DESCRIBE_RANGE       ≙ pd/pkg/server/cluster/range.go:49-349
- TRIM_STREAM                           ≙ rpc.fbs:571-581 (semantics; the
  reference's client impl is todo!() — we implement it fully)
- epoch fencing                         ≙ rpc.fbs:48-51 (EXPIRED_RANGE_EPOCH),
  seal flow components/replication/src/stream/replication_range.rs:312-428
- ALLOCATE_ID                           ≙ pd/pkg/server/id/

Design stance (SURVEY.md §7): metadata is strongly consistent driver-side
state — the Spark-world analogue of the reference's etcd-backed placement
driver; the *data* plane (records) is distributed parquet handled by
``log.py``.  Every real lakehouse commit log (Delta, Iceberg) takes the
same stance: a serialized metadata tx protecting massively parallel data
files.

Storage layout is SHARDED PER STREAM, like etcd keys — not one monolithic
snapshot: ``streams/<sid>.json`` holds one stream's record + its ranges,
``catalog.json`` holds only the tiny cross-stream state (id allocator,
feed revision, txn staging).  A metadata transaction therefore writes
O(one stream's ranges) bytes regardless of how many streams exist — the
hot append path (``reserve_offsets``) stays microsecond-scale at a
million streams, where a monolithic snapshot would rewrite the world per
append batch (measured: 38 ms/op at just 1 000 streams).

Transaction protocol (single writer lock, atomic commit point):
1. take the catalog ``fcntl`` lock; repair any prior crash window;
2. read ``catalog.json`` (meta) + the ONE shard the op touches — every
   catalog op addresses exactly one stream;
3. mutate in memory, stage change-feed events;
4. write ``catalog.json`` atomically carrying the staged events AND the
   new shard content (``pending_shard``) — THE commit point;
5. write the shard file, clear ``pending_shard``, publish the events
   file under ``changes/``.
A crash after (4) is repaired by the next lock holder — steps (5) are
idempotent replays of recorded bytes, so committed state is never lost
and the feed never shows an uncommitted txn (same WAL-then-apply shape as
the reference PD's raft log → state machine).

Concurrency: the per-catalog lock serializes metadata transactions across
processes; epoch fencing rejects zombie writers (``FencedError`` ≙
EXPIRED_RANGE_EPOCH).  Reads are lock-free single-shard file reads.
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
    # durable high-water mark: offsets below this have LANDED in the log
    # (advanced by confirm_offset AFTER the data write), while next_offset
    # advances at RESERVE time — the gap between them is an in-flight
    # write.  ≙ the reference's confirm offset
    # (components/replication/src/stream/replication_stream.rs confirm-
    # offset advance); readers admit up to confirmed, never reserved.
    confirmed_offset: int = 0
    epoch: int = 0  # writer fencing token

    @classmethod
    def from_raw(cls, raw: dict) -> "StreamMeta":
        """Deserialize a shard's stream record, upgrading legacy shards
        written before ``confirmed_offset`` existed: absent field → the
        stream predates in-flight tracking, so everything ever appended
        is durable (confirmed = next_offset).  This matches the streaming
        source's fallback (streaming/datasource.py
        _read_confirmed_offset); defaulting to the dataclass's 0 instead
        made ``StreamLog.confirmed_offset()`` / ``poll_fetch`` report
        zero availability on pre-upgrade catalogs — silent empty fetches
        until the next append confirmed (caught in review)."""
        if "confirmed_offset" not in raw:
            raw = {**raw, "confirmed_offset": raw["next_offset"]}
        return cls(**raw)


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
class _Meta:
    """Cross-stream state in ``catalog.json`` — deliberately tiny (O(1)
    in stream count): the id allocator, the feed revision, and the
    in-flight txn's staging (its events file and its shard post-image,
    both replayed idempotently after a crash)."""

    next_stream_id: int = 0
    revision: int = 0  # monotone change-feed revision (≙ etcd mod_revision)
    pending_changes: dict | None = None  # {"name": "<rev>.json", "lines": [...]}
    pending_shard: dict | None = None  # {"sid": int, "data": {...}}


@dataclass
class _CatalogState:
    """Assembled read-only VIEW of the whole catalog (meta + every shard,
    crash-window overlay applied) — for listing paths and maintenance
    jobs; the hot paths never build it."""

    next_stream_id: int = 0
    revision: int = 0
    streams: dict = field(default_factory=dict)  # str(stream_id) -> StreamMeta dict
    ranges: dict = field(default_factory=dict)  # str(stream_id) -> [RangeMeta dict]
    pending_changes: dict | None = None


class _Txn:
    """One metadata transaction: the meta record plus at most ONE stream
    shard (every catalog op addresses exactly one stream)."""

    def __init__(self, meta: _Meta):
        self.meta = meta
        self.sid: int | None = None
        self.stream: dict | None = None
        self.ranges: list | None = None
        self.events: list = []


# Change-feed event schema (≙ LIST/WATCH_RESOURCE, rpc.fbs:691-778: each
# event carries the resource, the change kind, and the catalog revision —
# the continuation token a watcher resumes from).
CHANGES_SCHEMA = (
    "revision BIGINT, ts_ms BIGINT, kind STRING, resource_type STRING, "
    "stream_id BIGINT, range_index BIGINT, detail STRING"
)


class StreamCatalog:
    """Metadata plane: stream + range lifecycle with epoch fencing.

    All mutating methods are transactions: lock, load meta + one shard,
    mutate, atomic meta commit, apply shard, publish feed events.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, "catalog.json")
        self._streams_dir = os.path.join(root, "streams")
        self._lock_path = os.path.join(root, "catalog.lock")

    # ------------------------------------------------------------------ io

    def _read_meta(self) -> _Meta:
        if not os.path.exists(self._meta_path):
            return _Meta()
        with open(self._meta_path) as f:
            return _Meta(**json.load(f))

    def _write_meta(self, m: _Meta) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".catalog-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(asdict(m), f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._meta_path)  # atomic commit point
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def _shard_path(self, stream_id: int) -> str:
        return os.path.join(self._streams_dir, f"{stream_id}.json")

    def _read_shard(self, stream_id: int) -> dict | None:
        p = self._shard_path(stream_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_shard(self, stream_id: int, data: dict) -> None:
        os.makedirs(self._streams_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".shard-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(data, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._shard_path(stream_id))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def _repair_locked(self, m: _Meta) -> None:
        """Replay a committed-but-unapplied txn (crash between the meta
        commit and the shard/feed writes).  Idempotent: the recorded
        post-image and event bytes are written as-is."""
        if m.pending_shard is not None:
            self._write_shard(m.pending_shard["sid"], m.pending_shard["data"])
            m.pending_shard = None
            self._write_meta(m)
        self._publish_pending(m)

    @contextmanager
    def _txn(self, stream_id: int | None = None):
        """Metadata transaction.  Change-feed ordering (the crash-safe
        part): staged events are serialized INTO the catalog.json commit
        (``pending_changes``), and the ``changes/`` file is written only
        AFTER that commit.  A crash before the commit leaves no trace (no
        phantom events for a txn that never happened); a crash after the
        commit but before the file/feed writes is repaired by the next
        lock holder, which replays the exact recorded bytes — same name,
        same content — so a FileStreamSource watcher (which never
        re-reads a filename) still sees every committed revision exactly
        once."""
        with open(self._lock_path, "a") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            m = self._read_meta()
            self._repair_locked(m)
            t = _Txn(m)
            if stream_id is not None:
                data = self._read_shard(stream_id)
                if data is None:
                    raise StreamNotFound(stream_id)
                t.sid = stream_id
                t.stream = data["stream"]
                t.ranges = data["ranges"]
                # upgrade-on-first-write for legacy shards (see
                # StreamMeta.from_raw): materialize the confirmed =
                # next_offset fallback BEFORE any mutation — a
                # reserve_offsets that bumps next_offset first would
                # otherwise inflate the fallback and mark its own
                # in-flight block durable
                t.stream.setdefault("confirmed_offset", t.stream["next_offset"])
            yield t
            self._stage_events(t)
            if t.sid is not None:
                m.pending_shard = {
                    "sid": t.sid,
                    "data": {"stream": t.stream, "ranges": t.ranges},
                }
            self._write_meta(m)  # COMMIT
            self._repair_locked(m)  # apply shard + publish feed (same path)

    @staticmethod
    def _emit(
        t: _Txn,
        kind: str,
        resource_type: str,
        stream_id: int,
        range_index: int | None = None,
        **detail,
    ) -> None:
        """Stage a change-feed event inside the current txn (≙ the
        resource events of WATCH_RESOURCE, rpc.fbs:735-760)."""
        t.events.append((kind, resource_type, stream_id, range_index, detail))

    def _stage_events(self, t: _Txn) -> None:
        """Serialize staged events into ``meta.pending_changes`` (one
        JSON-lines file per txn, named by first revision), stamping
        consecutive revisions and the event timestamp.  The serialized
        lines are recorded verbatim so a post-crash republish is
        byte-identical."""
        if not t.events:
            t.meta.pending_changes = None
            return
        first_rev = t.meta.revision + 1
        now_ms = int(time.time() * 1000)
        lines = []
        for kind, rtype, sid, ridx, detail in t.events:
            t.meta.revision += 1
            lines.append(
                json.dumps(
                    {
                        "revision": t.meta.revision,
                        "ts_ms": now_ms,
                        "kind": kind,
                        "resource_type": rtype,
                        "stream_id": sid,
                        "range_index": ridx,
                        "detail": json.dumps(detail, sort_keys=True),
                    }
                )
            )
        t.meta.pending_changes = {"name": f"{first_rev:012d}.json", "lines": lines}

    def _publish_pending(self, m) -> None:
        """Write the committed txn's events file under ``changes/`` if not
        already present.  Idempotent and deterministic (exact recorded
        bytes): safe to call from any lock holder at any time after the
        catalog commit.  One file per txn keeps the directory a valid
        Structured-Streaming file source (``watch_resources``)."""
        pending = m.pending_changes
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
        """Assembled full-catalog view (meta + all shards, crash-window
        overlay applied in memory).  O(streams) — for listing paths and
        maintenance jobs only; hot paths read one shard."""
        m = self._read_meta()
        st = _CatalogState(
            next_stream_id=m.next_stream_id,
            revision=m.revision,
            pending_changes=m.pending_changes,
        )
        if os.path.isdir(self._streams_dir):
            for fn in os.listdir(self._streams_dir):
                if not fn.endswith(".json"):
                    continue
                sid = fn[: -len(".json")]
                with open(os.path.join(self._streams_dir, fn)) as f:
                    data = json.load(f)
                st.streams[sid] = data["stream"]
                st.ranges[sid] = data["ranges"]
        if m.pending_shard is not None:  # committed, not yet applied
            sid = str(m.pending_shard["sid"])
            st.streams[sid] = m.pending_shard["data"]["stream"]
            st.ranges[sid] = m.pending_shard["data"]["ranges"]
        return st

    def clone_to(self, new_root: str) -> "StreamCatalog":
        """Copy the catalog's metadata (meta + shards, NOT the feed) into
        a fresh root — the metadata-only clone used by read-my-own-trim
        query paths (``sources/materialize.trimmed_engine``)."""
        import shutil

        os.makedirs(new_root, exist_ok=True)
        shutil.copy(self._meta_path, os.path.join(new_root, "catalog.json"))
        if os.path.isdir(self._streams_dir):
            shutil.copytree(
                self._streams_dir,
                os.path.join(new_root, "streams"),
                dirs_exist_ok=True,
            )
        return StreamCatalog(new_root)

    # --------------------------------------------------------- stream ops

    def create_stream(
        self, replica: int = 1, ack_count: int = 1, retention_ms: int = -1
    ) -> StreamMeta:
        """≙ CREATE_STREAM 0x3001 (pd/pkg/server/cluster/stream.go:28-56);
        id from the catalog allocator (≙ ALLOCATE_ID, pd/pkg/server/id/)."""
        with self._txn() as t:
            sid = t.meta.next_stream_id
            t.meta.next_stream_id += 1
            meta = StreamMeta(
                stream_id=sid,
                replica=replica,
                ack_count=ack_count,
                retention_ms=retention_ms,
                created_at_ms=int(time.time() * 1000),
            )
            t.sid = sid
            t.stream = asdict(meta)
            # first mutable range, index 0  (≙ first append triggers
            # CreateRange — pd/pkg/server/cluster/range.go:188-239)
            t.ranges = [asdict(RangeMeta(sid, 0, 0, 0))]
            self._emit(t, "created", "stream", sid)
            self._emit(t, "created", "range", sid, 0, start=0)
            return meta

    def describe_stream(self, stream_id: int) -> StreamMeta:
        """≙ DESCRIBE_STREAM 0x3004 (pd/pkg/server/cluster/stream.go:98-115).
        Lock-free single-shard read."""
        data = self._read_shard(stream_id)
        if data is None or data["stream"]["deleted"]:
            raise StreamNotFound(stream_id)
        return StreamMeta.from_raw(data["stream"])

    def update_stream(self, stream_id: int, **updates) -> StreamMeta:
        """≙ UPDATE_STREAM 0x3003 (pd/pkg/server/cluster/stream.go:79-96).
        Only replica/ack_count/retention_ms are user-mutable."""
        allowed = {"replica", "ack_count", "retention_ms"}
        bad = set(updates) - allowed
        if bad:
            raise ValueError(f"not user-mutable: {sorted(bad)}")
        with self._txn(stream_id) as t:
            if t.stream["deleted"]:
                raise StreamNotFound(stream_id)
            t.stream.update(updates)
            self._emit(t, "updated", "stream", stream_id, **updates)
            return StreamMeta.from_raw(t.stream)

    def delete_stream(self, stream_id: int) -> None:
        """≙ DELETE_STREAM 0x3002 — tombstone; data reclaim is deferred to
        the retention/vacuum job (pd/pkg/server/cluster/stream.go:58-77)."""
        with self._txn(stream_id) as t:
            t.stream["deleted"] = True
            self._emit(t, "deleted", "stream", stream_id)

    def list_streams(self, include_deleted: bool = False) -> list[StreamMeta]:
        st = self._load()
        out = [StreamMeta.from_raw(raw) for raw in st.streams.values()]
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
        data = self._read_shard(stream_id)
        if data is None:
            raise StreamNotFound(stream_id)
        out = [RangeMeta(**r) for r in data["ranges"]]
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
        with self._txn(stream_id) as t:
            sraw = t.stream
            if sraw["deleted"]:
                raise StreamNotFound(stream_id)
            if epoch < sraw["epoch"]:
                raise FencedError(
                    f"seal epoch {epoch} < stream epoch {sraw['epoch']}"
                )
            last = t.ranges[-1]
            if last["sealed"]:
                raise SealedRange(f"range {last['range_index']} already sealed")
            sealed_end = sraw["next_offset"] if end is None else end
            # the only valid seal point is EXACTLY next_offset: nothing
            # above it was ever assigned, and offsets in
            # [end, next_offset) are already assigned — possibly written
            # in this range's directory — so sealing below them would
            # leave records above the metadata end for a later
            # trim+vacuum to silently delete.  (The reference seals at
            # the confirmed offset, never below assigned; a below-start
            # value is subsumed — next_offset ≥ range start always.)
            if sealed_end > sraw["next_offset"]:
                raise ValueError(
                    f"seal end {sealed_end} beyond next_offset {sraw['next_offset']}"
                )
            if sealed_end < sraw["next_offset"]:
                raise ValueError(
                    f"seal end {sealed_end} below next_offset "
                    f"{sraw['next_offset']}: offsets past it are already "
                    "assigned; only a seal at exactly next_offset is valid"
                )
            last["end"] = sealed_end
            last["sealed"] = True
            new_epoch = sraw["epoch"] + 1
            sraw["epoch"] = new_epoch
            t.ranges.append(
                asdict(
                    RangeMeta(stream_id, last["range_index"] + 1, new_epoch, sealed_end)
                )
            )
            self._emit(
                t, "sealed", "range", stream_id, last["range_index"], end=sealed_end
            )
            self._emit(
                t,
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

        Cost is O(this stream's ranges) — one shard file — independent of
        the number of streams in the catalog (the property that keeps
        aggregate append throughput flat in stream count)."""
        with self._txn(stream_id) as t:
            sraw = t.stream
            if sraw["deleted"]:
                raise StreamNotFound(stream_id)
            if epoch is not None and epoch != sraw["epoch"]:
                raise FencedError(
                    f"append epoch {epoch} != stream epoch {sraw['epoch']}"
                )
            last = t.ranges[-1]
            if last["sealed"]:
                raise SealedRange(f"stream {stream_id} mutable range is sealed")
            base = sraw["next_offset"]
            sraw["next_offset"] = base + count
            return base, RangeMeta(**last)

    def confirm_offset(self, stream_id: int, upto: int) -> None:
        """Advance the stream's durable confirm offset to ``upto`` after
        the data write for a reserved block has landed — ≙ the
        reference's confirm-offset advance
        (components/replication/src/stream/replication_stream.rs; the
        long-poll availability check, docs/sbp.md:246-252, waits on
        exactly this).  Monotone (a replayed recovery confirm can never
        move it backwards); bounded by next_offset (nothing can be
        durable that was never reserved).  Readers — the streaming
        source's admission, long-poll fetch — treat THIS as data
        availability; next_offset alone only proves a reservation, and
        admitting it would let a consumer silently skip a block whose
        write is still in flight.

        CONTRACT — one writer per stream (the reference's one-mutable-
        range rule, components/model/src/stream/mod.rs:5-21; enforced
        here by epoch fencing at reserve/seal time): the monotone max
        below is a contiguous-durability watermark only under a single
        confirmed-in-reserve-order writer.  Two concurrent appenders at
        the same epoch could confirm out of order — a later block's
        confirm would cover an earlier still-in-flight block, and
        readers would admit past it.  Full per-reservation completion
        tracking was considered and deliberately NOT adopted: the
        exactly-once sink's documented crash window "reserve landed,
        marker lost" (streaming/sink.py) leaves a reservation that no
        writer will ever confirm, and a contiguity gate would wedge the
        confirmed watermark below that leaked block forever (admission
        deadlock).  The reference resolves the same situation by sealing
        the range to fence the dead writer; our analogue is the same —
        seal_range fences, and a sealed stream's confirm equals its end.
        Concurrent same-epoch writers remain outside the contract for
        both engines."""
        with self._txn(stream_id) as t:
            sraw = t.stream
            if upto > sraw["next_offset"]:
                raise ValueError(
                    f"confirm {upto} beyond next_offset {sraw['next_offset']}"
                )
            if upto > sraw["confirmed_offset"]:
                sraw["confirmed_offset"] = upto

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
        with self._txn(stream_id) as t:
            sraw = t.stream
            if sraw["deleted"]:
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
            t.ranges[:] = ranges
            sraw["next_offset"] = next_offset
            # bulk registration happens AFTER the bulk data write landed
            # (the bulk_load → bulk_register protocol), so the whole
            # extent is durable — confirm it
            sraw["confirmed_offset"] = max(
                next_offset, sraw.get("confirmed_offset", 0)
            )
            sraw["epoch"] = n_full
            for r in ranges:
                self._emit(
                    t,
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
                t,
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
        resumes from (≙ rpc.fbs:713-716 resource_version).  Meta-only
        read, O(1)."""
        return self._read_meta().revision

    def _repair(self) -> None:
        """Take the lock briefly and repair any crash window (apply a
        committed shard post-image, publish the recorded feed file)."""
        with open(self._lock_path, "a") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            self._repair_locked(self._read_meta())

    def changes(self, spark, from_revision: int = 0, ordered: bool = True):
        """LIST_RESOURCE-style batch read of the change feed: every
        committed catalog mutation with revision > ``from_revision``, in
        revision order.  ``ordered=False`` skips the global sort for
        consumers that impose their own per-key ordering (e.g. the
        window fold in ``fold_resource_feed`` — the sort otherwise
        survives below the window as a full range-partition exchange of
        the feed, r15)."""
        from pyspark.sql import functions as F

        self._repair()  # repair a prior crash window
        changes_dir = os.path.join(self.root, "changes")
        if not os.path.isdir(changes_dir) or not os.listdir(changes_dir):
            return spark.createDataFrame([], CHANGES_SCHEMA)
        df = spark.read.schema(CHANGES_SCHEMA).json(changes_dir)
        out = df.where(F.col("revision") > from_revision)
        return out.orderBy("revision") if ordered else out

    def watch_resources(self, spark, from_revision: int = 0):
        """WATCH_RESOURCE ≙ rpc.fbs:762-778: a streaming DataFrame of
        catalog mutations after ``from_revision``.  Built on the file
        source (one small JSON file per committed txn), so standard
        Structured Streaming checkpointing gives resumable, in-order,
        at-least-once watch delivery — the same contract etcd watch
        gives the reference's PD clients."""
        from pyspark.sql import functions as F

        self._repair()  # repair a prior crash window
        changes_dir = os.path.join(self.root, "changes")
        os.makedirs(changes_dir, exist_ok=True)
        sdf = spark.readStream.schema(CHANGES_SCHEMA).json(changes_dir)
        return sdf.where(F.col("revision") > from_revision)

    def trim_stream(self, stream_id: int, new_start_offset: int) -> StreamMeta:
        """≙ TRIM_STREAM 0x3005 (rpc.fbs:571-581): advance the minimum
        readable offset; drop ranges entirely below it and shrink the one
        straddling it.  Physical data reclaim happens in ``log.vacuum``.
        """
        with self._txn(stream_id) as t:
            sraw = t.stream
            if sraw["deleted"]:
                raise StreamNotFound(stream_id)
            if new_start_offset <= sraw["start_offset"]:
                return StreamMeta.from_raw(sraw)
            if new_start_offset > sraw["next_offset"]:
                raise ValueError("cannot trim past next_offset")
            sraw["start_offset"] = new_start_offset
            kept = []
            for raw in t.ranges:
                if raw["end"] is not None and raw["end"] <= new_start_offset:
                    # entirely below the trim point → dropped
                    self._emit(t, "deleted", "range", stream_id, raw["range_index"])
                    continue
                if raw["start"] < new_start_offset:
                    raw["start"] = new_start_offset  # straddling → shrink
                    # post-image for feed folders (fold_resource_feed)
                    self._emit(
                        t,
                        "updated",
                        "range",
                        stream_id,
                        raw["range_index"],
                        start=new_start_offset,
                    )
                kept.append(raw)
            t.ranges[:] = kept
            self._emit(
                t, "trimmed", "stream", stream_id, start_offset=new_start_offset
            )
            return StreamMeta.from_raw(sraw)
