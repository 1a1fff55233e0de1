"""etcd-style KV metadata store with Range/Put/DeleteRange/Txn(CAS).

Reference parity: components/protocol/fbs/rpc.fbs:780-931 (KV + Txn ops),
Java surface sdks/frontend-java/.../api/KVClient.java:9-32, and the
list/watch resource conventions rpc.fbs:691-778.

Semantics preserved from the reference:
- keys/values are opaque bytes; range scans are ``[key, range_end)`` with
  the etcd prefix convention (range_end = key with last byte + 1) and the
  from-key convention (range_end = b"\\0" means "all keys >= key").
- every successful mutation bumps a global revision; each key carries the
  revision of its last modification (``version``).
- Txn: evaluate ``compare`` predicates against current state; if all hold,
  apply ``success`` ops, else ``failure`` ops — atomically.

Linearizability (SURVEY.md §7 hard-part 5): transactions are serialized
through a driver-side file lock — same single-coordinator role as the
reference's etcd-leader PD.  The store is snapshotted to JSON with atomic
rename, and exposed to Spark as a DataFrame for scan-style queries.
"""

from __future__ import annotations

import base64
import fcntl
import json
import os
import tempfile
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def prefix_end(key: bytes) -> bytes:
    """etcd prefix convention: smallest key greater than every key with
    this prefix (trailing 0xff bytes are dropped)."""
    k = bytearray(key)
    while k:
        if k[-1] < 0xFF:
            k[-1] += 1
            return bytes(k)
        k.pop()
    return b""  # whole keyspace


@dataclass
class Compare:
    """Txn guard ≙ rpc.fbs Compare: check one key's value or version."""

    key: bytes
    target: str  # "value" | "version" | "exists"
    op: str  # "==" | "!=" | "<" | ">"
    value: bytes | int | bool | None = None


class KVStore:
    FROM_KEY = b"\x00"  # range_end sentinel: "all keys >= key"

    @classmethod
    def _in_span(cls, k: bytes, key: bytes, range_end: bytes | None) -> bool:
        """Span membership for Range/DeleteRange/Txn-delete.  ``b""`` is
        the open-upper-bound sentinel ``prefix_end`` returns for an
        all-0xff key (no byte string sorts above every key), so it must
        mean "all keys >= key" exactly like FROM_KEY — previously the
        generic ``k < b""`` branch matched nothing and such prefix scans
        silently returned/deleted zero keys (caught in review; etcd maps
        this case to the same from-key semantics)."""
        if range_end is None:
            return k == key
        if range_end == cls.FROM_KEY or range_end == b"":
            return k >= key
        return key <= k < range_end

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._path = os.path.join(root, "kv.json")
        self._lock_path = os.path.join(root, "kv.lock")

    # ------------------------------------------------------------- state

    @contextmanager
    def _txn(self):
        with open(self._lock_path, "a") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            state = self._load()
            yield state
            self._commit(state)

    def _load(self) -> dict:
        if not os.path.exists(self._path):
            return {"revision": 0, "data": {}}
        with open(self._path) as f:
            return json.load(f)

    def _commit(self, state: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".kv-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    @staticmethod
    def _enc(b: bytes) -> str:
        return base64.b64encode(b).decode()

    @staticmethod
    def _dec(s: str) -> bytes:
        return base64.b64decode(s)

    # --------------------------------------------------------------- ops

    def put(self, key: bytes, value: bytes) -> int:
        """≙ KV Put; returns the new revision."""
        with self._txn() as st:
            st["revision"] += 1
            st["data"][self._enc(key)] = {
                "value": self._enc(value),
                "version": st["revision"],
            }
            return st["revision"]

    def get(self, key: bytes) -> tuple[bytes, int] | None:
        ent = self._load()["data"].get(self._enc(key))
        if ent is None:
            return None
        return self._dec(ent["value"]), ent["version"]

    def range(
        self, key: bytes, range_end: bytes | None = None, limit: int = 0
    ) -> tuple[list[tuple[bytes, bytes, int]], bool]:
        """≙ KV Range (rpc.fbs:788-819): ``[key, range_end)`` in key order,
        with ``limit`` and a ``more`` paging flag.  range_end=None → point
        get; b"\\0" → from-key; prefix scans via ``prefix_end(key)``."""
        st = self._load()
        items = sorted(
            (self._dec(k), self._dec(v["value"]), v["version"])
            for k, v in st["data"].items()
        )
        items = [it for it in items if self._in_span(it[0], key, range_end)]
        more = bool(limit) and len(items) > limit
        if limit:
            items = items[:limit]
        return items, more

    def delete_range(self, key: bytes, range_end: bytes | None = None) -> int:
        """≙ KV DeleteRange; returns number of deleted keys."""
        with self._txn() as st:
            victims = [
                ek
                for ek in list(st["data"])
                if self._in_span(self._dec(ek), key, range_end)
            ]
            for ek in victims:
                del st["data"][ek]
            if victims:
                st["revision"] += 1
            return len(victims)

    def txn(
        self,
        compare: list[Compare],
        success: list[tuple],
        failure: list[tuple] | None = None,
    ) -> tuple[bool, list]:
        """≙ KV Txn (rpc.fbs:879-931): atomic compare-then-ops.

        ops are tuples: ``("put", key, value)``, ``("delete", key, range_end)``,
        ``("get", key)``.  Returns (succeeded, op_results).
        """
        with self._txn() as st:
            ok = all(self._check(st, c) for c in compare)
            results = []
            for op in success if ok else (failure or []):
                results.append(self._apply(st, op))
            return ok, results

    def cas(self, key: bytes, expect_version: int, value: bytes) -> bool:
        """Conditional put: succeeds iff the key's version is exactly
        ``expect_version`` (0 = key must not exist).  The classic etcd CAS
        idiom used by the reference's PD for id allocation."""
        cmp = (
            [Compare(key, "exists", "==", False)]
            if expect_version == 0
            else [Compare(key, "version", "==", expect_version)]
        )
        ok, _ = self.txn(cmp, [("put", key, value)])
        return ok

    def _check(self, st: dict, c: Compare) -> bool:
        ent = st["data"].get(self._enc(c.key))
        if c.target == "exists":
            actual: object = ent is not None
        elif ent is None:
            return False
        elif c.target == "version":
            actual = ent["version"]
        elif c.target == "value":
            actual = self._dec(ent["value"])
        else:
            raise ValueError(c.target)
        if c.op == "==":
            return actual == c.value
        if c.op == "!=":
            return actual != c.value
        if c.op == "<":
            return actual < c.value  # type: ignore[operator]
        if c.op == ">":
            return actual > c.value  # type: ignore[operator]
        raise ValueError(c.op)

    def _apply(self, st: dict, op: tuple):
        kind = op[0]
        if kind == "put":
            _, key, value = op
            st["revision"] += 1
            st["data"][self._enc(key)] = {
                "value": self._enc(value),
                "version": st["revision"],
            }
            return st["revision"]
        if kind == "delete":
            _, key, range_end = op
            n = 0
            for ek in list(st["data"]):
                if self._in_span(self._dec(ek), key, range_end):
                    del st["data"][ek]
                    n += 1
            if n:
                st["revision"] += 1
            return n
        if kind == "get":
            _, key = op
            ent = st["data"].get(self._enc(key))
            return None if ent is None else (self._dec(ent["value"]), ent["version"])
        raise ValueError(kind)

    # ------------------------------------------------------- spark views

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The ``_kv`` table (FIXTURES.md B.4) as a DataFrame for
        scan-style queries: ``key binary, value binary, version long``."""
        st = self._load()
        rows = [
            (self._dec(k), self._dec(v["value"]), v["version"])
            for k, v in st["data"].items()
        ]
        return spark.createDataFrame(rows, "key binary, value binary, version long")
