"""Substring-dedup decade probe: the stride-1 gram explode is the
heaviest text operation in the repo (O(total corpus chars) rows — the
same asymptotic work as the reference algorithm's suffix array), so its
scaling gets measured, not argued.

Stage split mirrors tools/pairgen_decade.py:
- stage 1 "gram-index materialize" — ``_substring_grams`` (the eager
  persist of the stride-1 char-gram index; the interpreted transform
  dominates);
- stage 2 "span extraction (warm index)" — ``_substring_spans`` over the
  already-persisted index (distinct-doc count per gram → hit join →
  gaps-and-islands merge).

Amplification reuses tools/scale_probe.build_amp_dir: every word in
replica k carries a ``_rk`` suffix, so char grams only collide within a
replica (a cross-replica 30-char window always covers a word boundary at
these word lengths) ⇒ the true span set grows LINEARLY by construction
and slope ≈ 1 is the honest target.

Writes its section to SCALE.extra.md (appended into SCALE.md by
tools/scale_probe.py on regeneration).

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/substring_decade.py
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
FACTORS = [16, 160]  # 80k and 800k docs (base = 5k docs) — one decade
RUNS = 2


def main() -> None:
    from elastic_stream_spark.functions.materialize import (
        unpersist_materialized,
    )
    from elastic_stream_spark.operators.dedup import (
        _substring_grams,
        _substring_spans,
    )
    from elastic_stream_spark.session import get_spark
    from tools.scale_probe import build_amp_dir

    spark = get_spark("substring-decade")
    amp_root = tempfile.mkdtemp(
        prefix="esspark-substr-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    results: dict[int, dict[str, float]] = {}
    span_counts: dict[int, int] = {}
    try:
        for f in FACTORS:
            d = build_amp_dir(spark, BASE_SF, f, amp_root)
            spark.read.parquet(f"{d}/documents.parquet").count()  # warm
            stage1_best = stage2_best = None
            for _ in range(RUNS):
                spark.catalog.clearCache()
                unpersist_materialized(spark)
                t0 = time.time()
                grams = _substring_grams(spark, d)  # materialize() counts
                s1 = time.time() - t0
                stage1_best = s1 if stage1_best is None else min(stage1_best, s1)
                t0 = time.time()
                n_spans = _substring_spans(grams).count()
                s2 = time.time() - t0
                stage2_best = s2 if stage2_best is None else min(stage2_best, s2)
            results[f] = {
                "stage1": round(stage1_best, 2),
                "stage2": round(stage2_best, 2),
            }
            span_counts[f] = n_spans
            print(
                f"# amp{f}x: gram index {stage1_best:.2f}s,"
                f" span extraction {stage2_best:.2f}s, {n_spans} spans",
                file=sys.stderr,
                flush=True,
            )
            spark.catalog.clearCache()
            unpersist_materialized(spark)
            shutil.rmtree(os.path.join(amp_root, f"amp{f}x"), ignore_errors=True)
    finally:
        shutil.rmtree(amp_root, ignore_errors=True)

    f1, f2 = FACTORS
    step = math.log10(f2 / f1)
    lines = [
        "### Substring-dedup decade: 80k → 800k docs (r7 measurement)",
        "",
        "`dedup_substring` stages measured separately"
        f" (best-of-{RUNS}, tmpfs scratch), one decade of corpus growth;",
        "slope = log10(t_800k/t_80k) — linear ⇒ +1.0.  The amplification",
        "grows the true duplicated-span set linearly by construction"
        f" ({span_counts[f1]:,} → {span_counts[f2]:,} spans).",
        "",
        "| stage | 80k docs s | 800k docs s | slope | verdict |",
        "|---|---|---|---|---|",
    ]
    for stage, label in (
        ("stage1", "stride-1 gram-index materialize"),
        ("stage2", "span extraction (warm index)"),
    ):
        t1, t2 = results[f1][stage], results[f2][stage]
        slope = math.log10(max(t2, 1e-3) / max(t1, 1e-3)) / step
        verdict = (
            "SUPER-LINEAR — flagged"
            if slope >= 1.3
            else ("~linear (data-bound)" if slope >= 0.5 else "sub-linear")
        )
        lines.append(f"| {label} | {t1:.2f} | {t2:.2f} | {slope:+.2f} | {verdict} |")
    lines.append("")

    extra = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE.extra.md",
    )
    marker = "### Substring-dedup decade"
    existing = ""
    if os.path.exists(extra):
        with open(extra) as fh:
            existing = fh.read()
        if marker in existing:
            existing = existing[: existing.index(marker)].rstrip()
        existing = existing.rstrip() + "\n\n"
    with open(extra, "w") as fh:
        fh.write(existing + "\n".join(lines) + "\n")
    print(f"wrote {extra}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
