"""Objects catalog + compaction — tiered-storage bookkeeping.

Reference parity:
- COMMIT_OBJECT / objects catalog ≙ rpc.fbs:653-689 (T_COMMIT_OBJECT) +
  components/object-storage/src/object_manager.rs: every data object a
  range server offloads is committed to the PD's metadata store with
  (stream, range, offset span, size) so readers can locate range data.
- compaction thresholds ≙ components/object-storage/src/range_accumulator.rs:129-170:
  small objects accumulate until a size/count threshold triggers a
  rewrite into one larger object.

Spark mapping: data objects ARE the parquet files under the log's
partitioned layout.  ``ObjectStore`` is the driver-side metadata plane
(same atomic-rename JSON snapshot as the catalog — the etcd analogue),
``StreamLog.commit_objects`` scans a stream's partition directories and
registers unregistered files (parquet footers give exact row counts),
and ``StreamLog.optimize`` rewrites multi-file SEALED ranges into one
object each — fetch results are byte-identical before and after, only
the file count changes (asserted in tests/test_objects.py).

At 100 TB: object metadata is O(files), kept driver-side exactly like a
Delta/Iceberg manifest; the compaction rewrite is a distributed Spark
job per range, embarrassingly parallel across ranges.
"""

from __future__ import annotations

import fcntl
import glob
import json
import os
import tempfile
import time
from contextlib import contextmanager
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession

OBJECTS_SCHEMA = (
    "object_id BIGINT, stream_id BIGINT, range_index BIGINT, path STRING, "
    "n_records BIGINT, n_bytes BIGINT, committed_at_ms BIGINT"
)


@dataclass
class ObjectMeta:
    """≙ rpc.fbs:662-681 Obj table (offloaded-object descriptor)."""

    object_id: int
    stream_id: int
    range_index: int
    path: str
    n_records: int
    n_bytes: int
    committed_at_ms: int


class ObjectStore:
    """Driver-side objects catalog: path-keyed, atomic-rename committed."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, "objects.json")
        self._lock_path = os.path.join(root, "objects.lock")

    @contextmanager
    def _txn(self):
        with open(self._lock_path, "a") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            state = self._load()
            yield state
            self._commit(state)

    def _load(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"next_object_id": 0, "objects": {}}  # path -> ObjectMeta dict
        with open(self._meta_path) as f:
            return json.load(f)

    def _commit(self, state: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".objects-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._meta_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # ---------------------------------------------------------------- ops

    def commit(
        self, stream_id: int, range_index: int, path: str, n_records: int, n_bytes: int
    ) -> ObjectMeta:
        """≙ COMMIT_OBJECT: idempotent on path (re-commit returns the
        existing descriptor — a replayed offload must not double-count)."""
        with self._txn() as st:
            existing = st["objects"].get(path)
            if existing is not None:
                return ObjectMeta(**existing)
            meta = ObjectMeta(
                object_id=st["next_object_id"],
                stream_id=stream_id,
                range_index=range_index,
                path=path,
                n_records=n_records,
                n_bytes=n_bytes,
                committed_at_ms=int(time.time() * 1000),
            )
            st["next_object_id"] += 1
            st["objects"][path] = asdict(meta)
            return meta

    def remove(self, paths: list[str]) -> int:
        """Drop descriptors for rewritten/vacuumed objects."""
        with self._txn() as st:
            n = 0
            for p in paths:
                if st["objects"].pop(p, None) is not None:
                    n += 1
            return n

    def list_objects(self, stream_id: int | None = None) -> list[ObjectMeta]:
        st = self._load()
        out = [ObjectMeta(**o) for o in st["objects"].values()]
        if stream_id is not None:
            out = [o for o in out if o.stream_id == stream_id]
        return sorted(out, key=lambda o: (o.stream_id, o.range_index, o.object_id))

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                o.object_id,
                o.stream_id,
                o.range_index,
                o.path,
                o.n_records,
                o.n_bytes,
                o.committed_at_ms,
            )
            for o in self.list_objects()
        ]
        return spark.createDataFrame(rows, OBJECTS_SCHEMA)


def parquet_files(range_dir: str) -> list[str]:
    return sorted(
        p
        for p in glob.glob(os.path.join(range_dir, "*.parquet"))
        if not os.path.basename(p).startswith((".", "_"))
    )


def file_row_count(path: str) -> int:
    """Exact row count from the parquet footer (no data read)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def file_offset_span(path: str) -> tuple[int, int] | None:
    """(min_offset, max_offset) of a log data file from parquet row-group
    statistics (no data read) — the same footer min/max the fetch path's
    predicate pushdown prunes on.  None if stats are absent."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    col_idx = None
    for i in range(md.num_columns):
        if md.schema.column(i).name == "offset":
            col_idx = i
            break
    if col_idx is None:
        return None
    lo: int | None = None
    hi: int | None = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(col_idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None or hi is None:
        return None
    return int(lo), int(hi)
