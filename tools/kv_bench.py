"""KV put-latency micro-bench: flat-vs-keyspace evidence for the sharded
store (r6 VERDICT next-round item 2).

Preloads N keys, then times PROBES single-key puts; reports median/p90
per keyspace size.  The monolithic snapshot this replaced rewrote the
whole keyspace per put (O(N) serialization + fsync of the full store);
the sharded layout writes one bucket (N / KV_SHARDS entries) + a ≤64-line
manifest, so latency should stay ~flat as N grows 100×.

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

from elastic_stream_spark.kv import KV_SHARDS, KVStore  # noqa: E402

SIZES = [1_000, 10_000, 100_000, 1_000_000]
PROBES = 200
VALUE = b"v" * 64


def bench_size(n: int) -> dict:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="kvbench-", dir=base)
    try:
        kv = KVStore(root)
        # bulk preload through the txn API (one commit): the bench
        # measures steady-state put latency, not load time.  The preload
        # commit also performs any adaptive reshard the keyspace size
        # calls for (kv.KV_RESHARD_AT), so the probed puts measure the
        # post-reshard steady state — exactly what a store that grew to
        # this size would serve.
        with kv._txn() as st:
            for i in range(n):
                st.set_entry(f"key:{i:08d}".encode(), VALUE)
        lat = []
        for i in range(PROBES):
            k = f"key:{i * (n // PROBES):08d}".encode()
            t0 = time.perf_counter()
            kv.put(k, VALUE + str(i).encode())
            lat.append((time.perf_counter() - t0) * 1000)
        lat.sort()
        nshards = kv._read_meta().get("nshards", KV_SHARDS)
        return {
            "keys": n,
            "put_ms_p50": round(statistics.median(lat), 3),
            "put_ms_p90": round(lat[int(len(lat) * 0.9)], 3),
            "nshards": nshards,
            "bucket_entries": n // nshards,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    out = {
        "initial_shards": KV_SHARDS,
        "probes": PROBES,
        "points": [bench_size(n) for n in SIZES],
    }
    p50 = {p["keys"]: p["put_ms_p50"] for p in out["points"]}
    out["p50_growth_100x_keys"] = round(p50[100_000] / p50[1_000], 2)
    out["p50_growth_1000x_keys"] = round(p50[1_000_000] / p50[1_000], 2)
    line = json.dumps(out)
    print(line)
    for a in sys.argv[1:]:
        if a.startswith("--json"):
            path = a.split("=", 1)[1] if "=" in a else "KV_BENCH.json"
            with open(path, "w") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
