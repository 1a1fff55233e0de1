"""r15 optimization-round profiler: per-query isolated timing + formatted
plans + per-stage breakdown via the status-tracker-free event-log parse.

Usage: python tools/profile_r15.py [--plans-dir plans/r15] [--suffix before]
         [sf_dir] [query ...]

For each query: clears caches (same hygiene as bench.py), runs the
noop-style full-evaluation action (the bench's hash-force — guide §1.4
equivalence: every column of every row computed), records best-of-2 wall
seconds, and writes ``<plans-dir>/<query>_<suffix>.txt`` with the
formatted physical plan.  Job descriptions are set per query (guide §1.5).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, ".")

from elastic_stream_spark.functions.materialize import (  # noqa: E402
    unpersist_materialized,
)
from elastic_stream_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    plans_dir = "plans/r15"
    suffix = "before"
    while args and args[0].startswith("--"):
        if args[0] == "--plans-dir":
            plans_dir = args[1]
            args = args[2:]
        elif args[0] == "--suffix":
            suffix = args[1]
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = args[1:]

    from bench import WARM_MEMOS, _force_count
    from elastic_stream_spark.operators import all_queries
    from elastic_stream_spark.sources.envelope import TABLES, table_rows
    from elastic_stream_spark.sources.materialize import get_engine

    spark = get_spark("profile_r15")
    qs = all_queries()
    if not names:
        names = list(qs)

    os.makedirs(plans_dir, exist_ok=True)

    # warm-up identical to bench.py
    for t in TABLES:
        table_rows(spark, sf_dir, t)
    get_engine(spark, sf_dir)
    for name in WARM_MEMOS:
        if name in qs:
            _force_count(qs[name](spark, sf_dir))

    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(2):
            gc.collect()
            spark.catalog.clearCache()
            unpersist_materialized(spark)
            spark.sparkContext.setJobDescription(f"r15-profile: {name}")
            t0 = time.time()
            _force_count(fn(spark, sf_dir))
            samples.append(time.time() - t0)
        out[name] = round(min(samples), 3)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
