"""r16 stage-level profile: wall vs Σ stage time per query, via the
local UI's REST API (no event-log parsing).  Off-stage residue =
wall − Σ stage duration ≈ driver/AQE/job-scheduling time — the quantity
r15's profile used to attribute dedup_simhash's cost.

Usage: python tools/stageprofile_r16.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

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

    # UI on: this tool reads stage metrics from the REST API (get_spark
    # disables the UI for bench hygiene; the profile needs it)
    spark = get_spark(
        "stageprofile_r16", extra_conf={"spark.ui.enabled": "true"}
    )
    qs = all_queries()
    for t in TABLES:
        table_rows(spark, sf_dir, t)
    get_engine(spark, sf_dir)
    for name in WARM_MEMOS:
        if name in qs:
            _force_count(qs[name](spark, sf_dir))

    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return {s["stageId"]: s for s in json.load(r)}

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        gc.collect()
        spark.catalog.clearCache()
        unpersist_materialized(spark)
        before = set(stages())
        group = f"r16-stages-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        _force_count(fn(spark, sf_dir))
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        time.sleep(0.3)
        after = stages()
        new = [s for sid, s in after.items() if sid not in before]
        stage_sum = sum(
            (s.get("executorRunTime") or 0) for s in new
        ) / 1000.0
        # wall-clock span actually covered by running stages (approx:
        # sum of per-stage durations; overlapping stages double-count)
        dur_sum = 0.0
        slow = []
        for s in new:
            try:
                t_first = s.get("firstTaskLaunchedTime")
                t_done = s.get("completionTime")
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d = (
                    datetime.strptime(t_done, fmt)
                    - datetime.strptime(t_first, fmt)
                ).total_seconds()
            except Exception:
                d = 0.0
            dur_sum += max(d, 0.0)
            slow.append((round(d, 2), s["stageId"], s.get("name", "")[:60]))
        slow.sort(reverse=True)
        out[name] = {
            "wall_s": round(wall, 3),
            "n_stages": len(new),
            "stage_wall_sum_s": round(dur_sum, 3),
            "executor_run_sum_s": round(stage_sum, 3),
            "off_stage_s": round(wall - dur_sum, 3),
            "slowest_stages": slow[:6],
        }
        print(f"# {name}: {json.dumps(out[name])}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
