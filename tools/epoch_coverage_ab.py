"""A/B the epoch_coverage literal-bound prune (r10 VERDICT item 3).

The audit ranks corpus × E rows per (source, epoch); the per-source
draw bound ``rk <= alloc`` is a column, which Spark's rank-limit →
WindowGroupLimit rewrite cannot use (literal limits only) — so the
un-pruned form pays E full per-source sorts of the whole corpus.  The
r11 operator pre-bounds with the LITERAL ``max_alloc`` (an O(1) scalar
off the |sources|-row alloc table), restoring the map-side per-group
top-k, then applies the exact column bound.

This tool times both forms at E ∈ {3, 10} on the sf directory
(default sf0.1), best-of-3 per cell, and prints one JSON line.  Run in
a calm window (no concurrent Spark — see scale-probe protocol).

Usage: python tools/epoch_coverage_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elastic_stream_spark.session import get_spark  # noqa: E402


def coverage(spark, sf_dir: str, epochs: int, prune: bool):
    """epoch_coverage with a parameterized epoch count and an optional
    literal pre-bound — mirrors operators/curation.epoch_coverage."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from elastic_stream_spark.operators.curation import (
        EPOCH_SAMPLE_BUDGET,
        _docs,
        _hamilton_doc_alloc,
    )

    docs = _docs(spark, sf_dir).select("source", "doc_id")
    alloc = _hamilton_doc_alloc(docs, EPOCH_SAMPLE_BUDGET)
    row = alloc.agg(F.max("alloc").alias("ma")).first()
    max_alloc = int(row["ma"] or 0)
    per_epoch = docs.join(F.broadcast(alloc), "source").select(
        "source",
        "doc_id",
        "alloc",
        F.explode(F.array(*[F.lit(e) for e in range(epochs)])).alias("epoch"),
    )
    wd = Window.partitionBy("source", "epoch").orderBy(
        F.md5(
            F.concat(
                F.lit("epoch"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ),
        F.asc("doc_id"),
    )
    drawn = per_epoch.withColumn("rk", F.row_number().over(wd))
    if prune:
        drawn = drawn.where(F.col("rk") <= F.lit(max_alloc))
    drawn = drawn.where(F.col("rk") <= F.col("alloc"))
    return (
        drawn.groupBy("source")
        .agg(
            F.lit(epochs).cast("bigint").alias("n_epochs"),
            F.count("*").cast("bigint").alias("total_draws"),
            F.countDistinct("doc_id").cast("bigint").alias("distinct_docs"),
            (F.count("*") - F.countDistinct("doc_id"))
            .cast("bigint")
            .alias("repeat_draws"),
        )
        .orderBy("source")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("epoch-coverage-ab")
    # warm the scan
    coverage(spark, sf_dir, 1, True).count()
    out: dict = {"sf_dir": sf_dir, "cells": []}
    hashes: dict[int, set] = {}
    for epochs in (3, 10):
        for prune in (False, True):
            # per-cell warm-up (r11 ADVICE): the shared E=1 warm pass
            # does not warm THIS cell's codegen/exchange shape, so the
            # first timed cell absorbed scan warm-up and the committed
            # A/B read as noise at fixture scale
            spark.catalog.clearCache()
            coverage(spark, sf_dir, epochs, prune).collect()
            best = None
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.time()
                rows = coverage(spark, sf_dir, epochs, prune).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            hashes.setdefault(epochs, set()).add(
                hash(tuple(sorted(map(tuple, rows))))
            )
            plan = (
                coverage(spark, sf_dir, epochs, prune)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            out["cells"].append(
                {
                    "epochs": epochs,
                    "prune": prune,
                    "best_s": round(best, 3),
                    "window_group_limit": "WindowGroupLimit" in plan,
                }
            )
            print(f"# E={epochs} prune={prune}: {best:.3f}s", file=sys.stderr)
    # both forms must agree row-for-row at each E
    out["results_identical"] = all(len(v) == 1 for v in hashes.values())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
