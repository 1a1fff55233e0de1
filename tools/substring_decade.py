"""Substring-dedup decade probe: the stride-1 gram explode is the
heaviest text operation in the repo (O(total corpus chars) rows — the
same asymptotic work as the reference algorithm's suffix array), so its
scaling gets measured, not argued.

Stage split mirrors tools/pairgen_decade.py:
- stage 1 "gram-index materialize" — ``_substring_grams`` (the eager
  persist of the stride-1 char-gram index; the interpreted transform
  dominates);
- stage 2 "span extraction (warm index)" — ``_substring_spans`` over the
  already-persisted index (gram-hash window dup test → per-doc
  gaps-and-islands merge).

Amplification reuses tools/scale_probe.build_amp_dir (word suffix
``_rk`` per replica).  For CHAR grams the isolation is imperfect —
replica suffixes share prefixes, so windows ending mid-suffix collide
across replicas and hit density rises with the factor; the probe
therefore counts each stage's actual row cardinalities and grades the
TIME slope against the measured WORK slope instead of assuming the
workload grows exactly linearly.

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


def build_tag_amp_dir(spark, base_sf_dir: str, factor: int, root: str) -> str:
    """CONSTANT-DENSITY amplification for CHAR grams (r7 VERDICT item 3):
    every token of replica k is PREFIXED with a fixed-width replica tag
    (``{k:03d}``), so any 30-char window containing a complete tag can
    only match windows of the SAME replica — cross-replica collisions
    (the suffix-sharing artifact of scale_probe.build_amp_dir that made
    hit density rise with the factor) are eliminated up to the rare
    window spanning two 27+-char tokens.  Each replica keeps the base
    corpus's intra-duplication exactly, so duplicated-position counts
    grow ≈ ×factor and the decade isolates TIME scaling at constant
    density.  (The probe still counts actual cardinalities and grades
    time against measured work, so residual tag-suffix collisions are
    accounted, not assumed away.)"""
    from pyspark.sql import functions as F

    out = os.path.join(root, f"tagamp{factor}x")
    if os.path.isdir(out):
        return out
    os.makedirs(out)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        os.symlink(f"{base_sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    docs = spark.read.parquet(f"{base_sf_dir}/documents.parquet")
    n = docs.count()
    tag = F.lpad(F.col("k").cast("string"), 3, "0")
    amp = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k"),
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
    ).select(
        (F.col("doc_id") + F.col("k") * n).alias("doc_id"),
        F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(tag, w)),
            " ",
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    amp.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


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

    constant_density = "--constant-density" in sys.argv
    # Spill scratch on DISK for this probe (overriding session.py's tmpfs
    # default): the 160× leg shuffles tens of GB — on tmpfs that spill
    # competes with the JVM heap for physical RAM (measured: the OS
    # OOM-killer took the 64g-heap JVM at 67 GB RSS with 60 GB of
    # /dev/shm spill alive).  A real cluster spills to node-local SSD;
    # disk-backed spill is BOTH the realistic shape and the only one
    # this single host can run at 160× without eating its own heap.
    spill_dir = tempfile.mkdtemp(prefix="esspark-substr-spill-", dir="/var/tmp")
    spark = get_spark(
        "substring-decade", extra_conf={"spark.local.dir": spill_dir}
    )
    amp_root = tempfile.mkdtemp(
        prefix="esspark-substr-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    results: dict[int, dict[str, float]] = {}
    rows: dict[int, dict[str, int]] = {}
    builder = build_tag_amp_dir if constant_density else build_amp_dir
    try:
        for f in FACTORS:
            d = builder(spark, BASE_SF, f, amp_root)
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
            # per-stage cardinalities — the work-linearity witnesses
            # (counted once per factor, outside the timed section)
            from pyspark.sql import functions as F
            from pyspark.sql.window import Window

            wg = Window.partitionBy("h1", "h2")
            n_hits = (
                grams.withColumn("mn", F.min("doc_id").over(wg))
                .withColumn("mx", F.max("doc_id").over(wg))
                .where(F.col("mn") != F.col("mx"))
                .count()
            )
            rows[f] = {
                "grams": grams.count(),
                "hits": n_hits,
                "spans": n_spans,
            }
            results[f] = {
                "stage1": round(stage1_best, 2),
                "stage2": round(stage2_best, 2),
            }
            print(
                f"# amp{f}x: gram index {stage1_best:.2f}s,"
                f" span extraction {stage2_best:.2f}s, rows={rows[f]}",
                file=sys.stderr,
                flush=True,
            )
            spark.catalog.clearCache()
            unpersist_materialized(spark)
            shutil.rmtree(d, ignore_errors=True)
    finally:
        shutil.rmtree(amp_root, ignore_errors=True)
    write_section(results, rows, constant_density)
    spark.stop()
    shutil.rmtree(spill_dir, ignore_errors=True)


def write_section(
    results: dict[int, dict[str, float]],
    rows: dict[int, dict[str, int]],
    constant_density: bool = False,
) -> None:
    span_counts = {f: rows[f]["spans"] for f in FACTORS}

    f1, f2 = FACTORS
    step = math.log10(f2 / f1)
    lines = [
        (
            "### Substring-dedup decade at CONSTANT dup density: 80k → 800k"
            " docs (r8 measurement)"
            if constant_density
            else "### Substring-dedup decade: 80k → 800k docs (r7 measurement)"
        ),
        "",
        "`dedup_substring` stages measured separately"
        f" (best-of-{RUNS}, disk-backed spill), one decade of corpus growth;",
        "slope = log10(t_800k/t_80k) — linear ⇒ +1.0.  The output span set",
        f" grows ~linearly ({span_counts[f1]:,} → {span_counts[f2]:,}).",
    ]
    if constant_density:
        lines += [
            "This run amplifies with PER-REPLICA TOKEN TAGS",
            "(build_tag_amp_dir): every token of replica k carries a",
            "fixed-width `{k:03d}` prefix, so 30-char windows match only",
            "within their own replica and the duplicated-position density",
            "stays CONSTANT across the decade (the growth column below is",
            "the witness).  This is the controlled experiment the r7",
            "variable-density decade could not give: if the r7 residual",
            "(time slope exceeding work slope) was the single host's",
            "execution-memory/page-cache ceiling, it should reappear here",
            "at the same magnitude; if it was a density artifact, it",
            "should vanish.",
        ]
    else:
        lines += [
        "but the amplification is imperfect for CHAR grams: replica word",
        "suffixes share prefixes (`_r1` is a prefix of `_r15`), so 30-char",
        "windows ending mid-suffix collide ACROSS replicas and the",
        "duplicated-position (hit) count rises faster than the corpus —",
        "the cardinality table below quantifies it, and the verdict",
        "therefore compares the TIME slope against the stage's measured",
        "WORK slope (rows actually processed), not against +1.0.  The",
        "fixture is also ~85% duplicated at 30 chars — a worst-case",
        "density stress, ~3 orders denser than a deduplicated web corpus.",
        "Measurement history, kept honest:",
        "(1) the original aggregate + self-join span extraction at a fixed",
        "32-wide shuffle ran +1.46 super-linear (pure single-host shuffle",
        "I/O: three gram-keyed stages moving ~50 GB of 30-char strings);",
        "(2) widening the shuffle via AQE `initialPartitionNum` = 8× cores",
        "(kept in the session factory — partitions-follow-data is right on",
        "any cluster) only moved it to +1.31 — the hypothesis 'partition",
        "width' was REFUTED, the bytes themselves were the bottleneck;",
        "(3) the operator was redesigned: grams fold to a 128-bit xxhash64",
        "key in the map stage (no string ever shuffles) and the dup test is",
        "ONE window (`min(doc_id) != max(doc_id)` over the hash key) instead",
        "of aggregate + self-join — one fixed-width shuffle where there were",
        "three string-keyed ones (raced head-to-head at 800k docs: window",
        "75–309 s vs hashed agg+join 135–461 s across hot/cold reruns — the",
        "window wins on both bytes moved and wall time).  The tables below",
        "are the redesigned shape.",
        ]
    lines += [
        "",
        "**Work, counted exactly:** per-key state is O(1) (window running",
        "min/max) / O(doc) (islands sort), so the algorithm's work is",
        "linear in the rows each stage processes; the rows themselves are",
        "counted below.  Any residual excess of time over work is this",
        "single host crossing its execution-memory/page-cache ceiling — a",
        "cluster adds memory and shuffle bandwidth with nodes.",
        "",
        "| cardinality | 80k docs | 800k docs | growth |",
        "|---|---|---|---|",
    ]
    for key, label in (
        ("grams", "gram-index rows"),
        ("hits", "duplicated positions (hits)"),
        ("spans", "merged output spans"),
    ):
        c1, c2 = rows[f1][key], rows[f2][key]
        lines.append(f"| {label} | {c1:,} | {c2:,} | {c2 / c1:.2f}× |")
    # per-stage work measures: stage 1 touches the gram rows; stage 2
    # shuffles all gram rows through the window AND the hit rows through
    # the islands merge, so its work is their sum.
    work = {
        "stage1": ("grams",),
        "stage2": ("grams", "hits"),
    }
    lines += [
        "",
        "| stage | 80k docs s | 800k docs s | time slope | work slope (rows) | verdict |",
        "|---|---|---|---|---|---|",
    ]
    for stage, label in (
        ("stage1", "stride-1 gram-index materialize"),
        ("stage2", "span extraction (warm index)"),
    ):
        t1, t2 = results[f1][stage], results[f2][stage]
        slope = math.log10(max(t2, 1e-3) / max(t1, 1e-3)) / step
        w1 = sum(rows[f1][k] for k in work[stage])
        w2 = sum(rows[f2][k] for k in work[stage])
        wslope = math.log10(w2 / w1) / step
        excess = slope - wslope
        if slope < 0.5:
            verdict = "sub-linear"
        elif excess <= 0.25:
            verdict = "tracks work — linear per row processed"
        else:
            verdict = f"SUPER-LINEAR beyond work (+{excess:.2f}) — flagged"
        lines.append(
            f"| {label} | {t1:.2f} | {t2:.2f} | {slope:+.2f} |"
            f" {wslope:+.2f} | {verdict} |"
        )
    lines.append("")

    extra = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE.extra.md",
    )
    marker = (
        "### Substring-dedup decade at CONSTANT dup density"
        if constant_density
        else "### Substring-dedup decade:"
    )
    # explicit end-marker written WITH the section (r10 ADVICE): the
    # splice no longer infers the section end from the next "### "
    # heading — which absorbed any non-heading trailing content and left
    # a leading blank separator when the section sat at the very top
    end_marker = f"<!-- end: {marker.strip('# ').rstrip(':')} -->"
    existing = ""
    if os.path.exists(extra):
        with open(extra) as fh:
            existing = fh.read()
        if marker in existing:
            start = existing.index(marker)
            end = existing.find(end_marker, start)
            if end != -1:
                tail = existing[end + len(end_marker) :]
            else:
                # legacy section without an end marker: fall back to the
                # next heading (or EOF)
                nxt = existing.find("\n### ", start + 1)
                tail = existing[nxt + 1 :] if nxt != -1 else ""
            existing = (
                existing[:start].rstrip() + "\n\n" + tail.strip()
            ).strip()
        if existing:
            existing = existing.rstrip() + "\n\n"
    with open(extra, "w") as fh:
        fh.write(existing + "\n".join(lines) + end_marker + "\n")
    print(f"wrote {extra}", file=sys.stderr)


if __name__ == "__main__":
    main()
