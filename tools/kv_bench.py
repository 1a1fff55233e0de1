"""KV put-latency micro-bench: flat-vs-keyspace evidence for the sharded
store (r6 VERDICT next-round item 2; r11 added the adaptive growth, r12
the worst-single-put column).

Per keyspace size: preload N keys in one txn (whose commit performs the
full linear-hash catch-up, so probes measure the steady state a store
grown to N serves), then

- PROBES single-key updates → p50/p90 steady-state put latency;
- GROWTH single-key INSERTS → the same percentiles plus the MAX, which
  captures the puts that pay a bucket split (r11's wholesale reshard
  made the trigger put rewrite the whole keyspace: measured 876 ms at
  131k keys and 3.5 s at 524k on tmpfs; r12's linear hashing bounds it
  to one bucket — worst_insert_ms pins that).

Usage: python tools/kv_bench.py [--json OUT.json]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elastic_stream_spark.kv import (  # noqa: E402
    KV_RESHARD_AT,
    KV_RESHARD_FACTOR,
    KV_SHARDS,
    KVStore,
)

SIZES = [1_000, 10_000, 100_000, 1_000_000]
PROBES = 200
GROWTH = 2_000  # fresh inserts: crosses >=1 split trigger at every size
VALUE = b"v" * 64


def _stats(lat: list[float]) -> tuple[float, float, float]:
    lat = sorted(lat)
    return (
        round(statistics.median(lat), 3),
        round(lat[int(len(lat) * 0.9)], 3),
        round(lat[-1], 3),
    )


def bench_size(n: int) -> dict:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="kvbench-", dir=base)
    try:
        kv = KVStore(root)
        with kv._txn() as st:
            for i in range(n):
                st.set_entry(f"key:{i:08d}".encode(), VALUE)
        # steady-state updates (no keyspace growth, no splits)
        upd = []
        for i in range(PROBES):
            k = f"key:{i * (n // PROBES):08d}".encode()
            t0 = time.perf_counter()
            kv.put(k, VALUE + str(i).encode())
            upd.append((time.perf_counter() - t0) * 1000)
        # growing inserts (includes the split-paying puts)
        ins = []
        for i in range(GROWTH):
            t0 = time.perf_counter()
            kv.put(f"grow:{i:08d}".encode(), VALUE)
            ins.append((time.perf_counter() - t0) * 1000)
        meta = kv._read_meta()
        nshards = meta.get("nshards", KV_SHARDS)
        nextp = meta.get("next", 0)
        eff = nshards + nextp * (KV_RESHARD_FACTOR - 1)
        u50, u90, _ = _stats(upd)
        i50, i90, imax = _stats(ins)
        return {
            "keys": n,
            "put_ms_p50": u50,
            "put_ms_p90": u90,
            "insert_ms_p50": i50,
            "insert_ms_p90": i90,
            "worst_insert_ms": imax,
            "buckets": eff,
            "round_nshards": nshards,
            "split_next": nextp,
            "bucket_entries": (n + GROWTH) // eff,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    out = {
        "initial_shards": KV_SHARDS,
        "reshard_at": KV_RESHARD_AT,
        "probes": PROBES,
        "growth_inserts": GROWTH,
        "points": [bench_size(n) for n in SIZES],
    }
    p50 = {p["keys"]: p["put_ms_p50"] for p in out["points"]}
    out["p50_growth_100x_keys"] = round(p50[100_000] / p50[1_000], 2)
    out["p50_growth_1000x_keys"] = round(p50[1_000_000] / p50[1_000], 2)
    out["worst_insert_ms_any_size"] = max(
        p["worst_insert_ms"] for p in out["points"]
    )
    line = json.dumps(out)
    print(line)
    for a in sys.argv[1:]:
        if a.startswith("--json"):
            path = a.split("=", 1)[1] if "=" in a else "KV_BENCH.json"
            with open(path, "w") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
