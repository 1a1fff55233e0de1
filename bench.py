"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The query set spans the engine's surfaces: stream ops (fetch/window agg),
relational (TPC-H-style), dedup (MinHash-LSH), similarity (top-k), text.
Each timing includes full plan execution to a count/collect action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "top3_orders_per_customer",
    "fetch_range",
    "tumbling_window_counts",
    "session_windows",
    "asof_join_purchase_click",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "text_token_stats",
    "mm_byte_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from elastic_stream_spark.operators import all_queries
    from elastic_stream_spark.session import get_spark

    spark = get_spark("bench")
    qs = all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr, flush=True)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
