"""Per-query bench delta vs the comparison base (BENCH_LOCAL_r8 — the
first hash-force run; see bench.py header).  Both artifacts must be the
same action (hash-force) for the deltas to mean anything.

Usage: python tools/bench_delta.py BENCH_LOCAL_r9.json [BENCH_LOCAL_r8.json]
Prints shared-set totals and the biggest per-query movers.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL_r9.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_LOCAL_r8.json"
    cur = json.load(open(cur_path))["queries"]
    base = json.load(open(base_path))["queries"]
    shared = sorted(set(cur) & set(base))
    new = sorted(set(cur) - set(base))
    cur_tot = sum(cur[q] for q in shared)
    base_tot = sum(base[q] for q in shared)
    print(
        f"shared set: {len(shared)} queries, "
        f"base {base_tot:.1f}s -> current {cur_tot:.1f}s "
        f"({(cur_tot / base_tot - 1) * 100:+.1f}%)"
    )
    movers = sorted(
        ((cur[q] - base[q], q) for q in shared), key=lambda t: -abs(t[0])
    )[:10]
    for d, q in movers:
        print(f"  {q}: {base[q]:.2f} -> {cur[q]:.2f} ({d:+.2f}s)")
    if new:
        print(f"new queries ({len(new)}): " + ", ".join(f"{q}={cur[q]:.2f}s" for q in new))


if __name__ == "__main__":
    main()
