"""A/B/C harness for the substring span-extraction stage — the
experiment that picked the r9 shipped shape (SCALE.extra.md).

Variant A = the SHIPPED ``_substring_spans`` (r9: dup verdicts via hash
agg, verdict semi-join back, bounded in-row island fold).  Variant B =
the r8 two-pass solid/gappy formulation (bucket min/max/count, solid
buckets become intervals, gappy buckets semi-join their own positions
back and run row_number gaps-and-islands — re-evaluates the hits
subtree).  Variant C = the r7 one-window shape (min/max over a
gram-hash window).

Measured at the 160× constant-density decade (800k docs, disk-backed
spill, ONE VARIANT PER PROCESS — a finished job's ~56 GB of shuffle
files are only reclaimed after a driver GC, so same-JVM back-to-back
variants fill the disk):

    A (hof fold, shipped)  196 s
    B (r8 two-pass)        537 s   ← the extra hits evaluation
    C (r7 one-window)      212 s

Usage:
    python tools/span_ab.py [sf_dir]                 # equality + best-of-3
    python tools/span_ab.py sf_dir --factor 160 --variant A   # decade leg
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def spans_twopass(grams: DataFrame) -> DataFrame:
    """Variant B: the r8 solid/gappy two-pass formulation (preserved for
    reproducibility of the A/B/C; its second evaluation of the hits
    subtree is the measured 2.7× overhead)."""
    from elastic_stream_spark.operators.dedup import SUBSTR_BUCKET, SUBSTR_K

    dup_keys = (
        grams.groupBy("h1", "h2")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .where(F.col("mn") != F.col("mx"))
        .select("h1", "h2")
    )
    hits = grams.join(dup_keys, ["h1", "h2"], "leftsemi").select(
        "doc_id", "i", (F.col("i") - F.pmod("i", F.lit(SUBSTR_BUCKET))).alias("bkt")
    )
    folded = hits.groupBy("doc_id", "bkt").agg(
        F.min("i").alias("mn"),
        F.max("i").alias("mx"),
        F.count("*").alias("cnt"),
    )
    solid = folded.where(F.col("cnt") == F.col("mx") - F.col("mn") + 1).select(
        "doc_id", F.col("mn").alias("iv_start"), F.col("mx").alias("iv_end")
    )
    gappy_keys = folded.where(F.col("cnt") != F.col("mx") - F.col("mn") + 1).select(
        "doc_id", "bkt"
    )
    gappy_hits = hits.join(gappy_keys, ["doc_id", "bkt"], "leftsemi")
    wrn = Window.partitionBy("doc_id", "bkt").orderBy("i")
    gappy_iv = (
        gappy_hits.withColumn("grp", F.col("i") - F.row_number().over(wrn))
        .groupBy("doc_id", "bkt", "grp")
        .agg(F.min("i").alias("iv_start"), F.max("i").alias("iv_end"))
        .select("doc_id", "iv_start", "iv_end")
    )
    ivs = solid.unionByName(gappy_iv)
    w = Window.partitionBy("doc_id").orderBy("iv_start")
    prev_end = F.max("iv_end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    opened = ivs.withColumn(
        "new_island",
        F.when(F.col("iv_start") > F.coalesce(prev_end, F.lit(-2)) + 1, 1).otherwise(0),
    )
    grouped = opened.withColumn(
        "island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grouped.groupBy("doc_id", "island")
        .agg(
            F.min("iv_start").alias("span_start"),
            (F.max("iv_end") + F.lit(SUBSTR_K)).alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
            (F.col("span_end") - F.col("span_start"))
            .cast("bigint")
            .alias("span_len"),
        )
        .orderBy("doc_id", "span_start")
    )


def spans_window(grams: DataFrame) -> DataFrame:
    """Variant C: the r7/r8 one-window shape (min/max over a gram-hash
    window marks dup positions, row_number gaps-and-islands per doc) —
    fewest total stages, but the dup test is a SORT-based window over
    the whole index."""
    from elastic_stream_spark.operators.dedup import SUBSTR_K

    wg = Window.partitionBy("h1", "h2")
    hits = (
        grams.withColumn("mn", F.min("doc_id").over(wg))
        .withColumn("mx", F.max("doc_id").over(wg))
        .where(F.col("mn") != F.col("mx"))
        .select("doc_id", "i")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    runs = hits.withColumn("grp", F.col("i") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.min("i").alias("span_start"),
            (F.max("i") + F.lit(SUBSTR_K)).alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
            (F.col("span_end") - F.col("span_start"))
            .cast("bigint")
            .alias("span_len"),
        )
        .orderBy("doc_id", "span_start")
    )


def main() -> None:
    import shutil
    import tempfile

    from elastic_stream_spark.operators.dedup import (
        _substring_grams,
        _substring_spans,
    )
    from elastic_stream_spark.session import get_spark

    factor = None
    only = None
    args = [a for a in sys.argv[1:]]
    if "--factor" in args:
        i = args.index("--factor")
        factor = int(args[i + 1])
        del args[i : i + 2]
    if "--variant" in args:  # one variant per PROCESS at decade scale:
        # a finished job's ~56 GB of shuffle files are only reclaimed by
        # the ContextCleaner after a driver GC, so back-to-back variants
        # in one JVM fill the disk (measured: B died ENOSPC after A)
        i = args.index("--variant")
        only = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    runs = 1 if factor else 3

    spill_dir = tempfile.mkdtemp(prefix="esspark-spanab-spill-", dir="/var/tmp")
    spark = get_spark("span-ab", extra_conf={"spark.local.dir": spill_dir})
    amp_root = None
    if factor:
        from tools.substring_decade import build_tag_amp_dir

        # fixed path → rebuilt only if absent, shared across variant procs
        amp_root = f"/var/tmp/esspark-spanab-amp{factor}x"
        os.makedirs(amp_root, exist_ok=True)
        sf_dir = build_tag_amp_dir(spark, sf_dir, factor, amp_root)
    grams = _substring_grams(spark, sf_dir)
    grams.count()  # warm the persist

    variants = tuple(
        v
        for v in (
            ("A_shipped", _substring_spans),
            ("B_twopass", spans_twopass),
            ("C_window", spans_window),
        )
        if only is None or v[0].startswith(only)
    )
    if not factor:  # output-equality check at base scale only
        a_rows = {tuple(r) for r in _substring_spans(grams).collect()}
        for name, fn in variants[1:]:
            rows = {tuple(r) for r in fn(grams).collect()}
            assert rows == a_rows, f"{name} differs: {len(rows)} vs {len(a_rows)}"
        print(f"outputs identical: {len(a_rows)} spans", flush=True)

    for name, fn in variants:
        best = None
        for _ in range(runs):
            t0 = time.time()
            n = fn(grams).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: best {best:.2f}s ({n} spans)", flush=True)
    spark.stop()
    # amp corpus is left under its fixed /var/tmp path for the next
    # variant process; remove by hand when the A/B/C is done
    shutil.rmtree(spill_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
