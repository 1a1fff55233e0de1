"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every config here is chosen to also
hold on a large cluster: AQE for runtime re-planning (skew joins, partition
coalescing), Arrow for the Python boundary, UTC so results are comparable
with the DuckDB oracle, and shuffle partitions sized by environment rather
than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "elastic_stream_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # ---- planning: let Catalyst + AQE own the physical strategy ----
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE pre-coalesce width: start every shuffle wide (8× cores by
        # default) and let coalescePartitions collapse small exchanges
        # back down — the partitions-follow-data discipline a real
        # cluster applies, obtained adaptively.  Bounded benefit,
        # honestly measured (SCALE.extra.md substring decade): widening
        # 32 → 256 moved the dense span-extraction point only +1.46 →
        # +1.31 — per-partition width was NOT the bottleneck there (the
        # shuffled bytes were; fixed algorithmically by hashing the
        # shuffle key).  Kept because right-sizing large shuffles while
        # coalescing small ones is strictly better than a fixed width.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", str(cpus * 8)),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ---- python boundary: always Arrow, never per-row pickle ----
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # ---- determinism / oracle comparability ----
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores events.ts as TIMESTAMP(NANOS) which Spark
        # has no native type for; read as long, converted in the loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ---- local-mode friendliness (no-ops on a real cluster manager) ----
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    # Shuffle/broadcast scratch on tmpfs when available: this host's /tmp
    # is network-backed and stalls intermittently (seconds-long D-state
    # waits), which serializes shuffle-heavy stages.  On a real cluster
    # spark.local.dir is the node's local SSD — tmpfs is the local-mode
    # equivalent.  Data volumes here are MBs, far below the tmpfs size.
    if os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
