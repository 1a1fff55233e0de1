"""r16 job-count probe: how many Spark JOBS one evaluation of a query
launches (persist/materialize count jobs, broadcast builds, AQE stage
re-optimizations each show up as extra jobs — the off-stage driver
residue r15's profile attributed ~70% of dedup_simhash's wall to).

Usage: python tools/jobprofile_r16.py [sf_dir] query [query ...]

Per query: warm caches exactly like bench.py, then ONE timed hash-force
evaluation inside a job group; reports wall seconds and the job count
from the status tracker.  Best-of-2 wall is NOT taken here — the point
is the job census, which is deterministic per plan; wall is advisory.
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
    sf_dir = args[0] if args and os.path.isdir(args[0]) else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from bench import WARM_MEMOS, _force_count
    from elastic_stream_spark.operators import all_queries
    from elastic_stream_spark.sources.envelope import TABLES, table_rows
    from elastic_stream_spark.sources.materialize import get_engine

    spark = get_spark("jobprofile_r16")
    qs = all_queries()

    for t in TABLES:
        table_rows(spark, sf_dir, t)
    get_engine(spark, sf_dir)
    for name in WARM_MEMOS:
        if name in qs:
            _force_count(qs[name](spark, sf_dir))

    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        gc.collect()
        spark.catalog.clearCache()
        unpersist_materialized(spark)
        group = f"r16-jobs-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        rows = _force_count(fn(spark, sf_dir))
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        out[name] = {
            "jobs": len(jobs),
            "wall_s": round(wall, 3),
            "rows": rows,
        }
        print(f"# {name}: {len(jobs)} jobs, {wall:.2f}s", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
