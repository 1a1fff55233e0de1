"""Approximate-ANN recall telemetry (r6 VERDICT item 7): measure the
recall of the approximate serving paths against exact brute force and
write a committed JSON so serving quality is tracked per round, not just
asserted once in pytest.

Paths probed:
- ``sim_ann_ivf_approx`` — trained quantizer, nprobe = nlist/2 on the
  near-uniform driver fixture (pytest contract: recall ≥ 0.8);
- ``sim_ann_ivf_spill`` / ``sim_ann_ivf_pq_refined`` — the r11 refined
  uniform serving paths (boundary-spill index at unchanged nprobe; the
  PQ form adds the ADC shortlist + exact re-rank).  Contract ≥ 0.98
  (pytest test_refined_uniform_recall);
- clustered-fixture IVF at nprobe/nlist = 1/4 (the pruning demo), with
  its measured candidate fraction.

Usage: python tools/recall_probe.py [sf_dir] [--json OUT.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elastic_stream_spark.session import get_spark  # noqa: E402


def topk_map(rows) -> dict:
    out: dict = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall(approx: dict, exact: dict) -> float:
    hit = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.values())
    return round(hit / total, 4)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark("recall-probe")

    from pyspark.sql import functions as F

    from elastic_stream_spark.operators.similarity import (
        IVF_CLUSTERED_NPROBE,
        N_QUERIES,
        IVF_CLUSTERED_NLIST,
        clustered_corpus,
        ivf_topk,
        planted_centroids,
        sim_ann_ivf_approx,
        sim_topk_bruteforce,
        _train_centroids,
    )

    out: dict = {"sf_dir": sf_dir}

    # --- trained IVF at nprobe = nlist/2 on the (near-uniform) fixture
    exact = topk_map(sim_topk_bruteforce(spark, sf_dir).collect())
    approx = topk_map(sim_ann_ivf_approx(spark, sf_dir).collect())
    nlist, nprobe, _ = _train_centroids(spark, sf_dir)
    out["ivf_approx_uniform"] = {
        "nlist": nlist,
        "nprobe": nprobe,
        "recall_at_5": recall(approx, exact),
        "contract": ">= 0.8 (pytest test_ivf_recall_vs_bruteforce)",
    }

    # --- r11 refined uniform serving paths: boundary spill at the SAME
    # nprobe (cell-loss fix), and the PQ serving form with ADC shortlist
    # + exact re-rank on top (quantization-noise fix)
    from elastic_stream_spark.operators.similarity import (
        IVF_SPILL,
        sim_ann_ivf_pq_refined,
        sim_ann_ivf_spill,
    )

    spill_r = recall(topk_map(sim_ann_ivf_spill(spark, sf_dir).collect()), exact)
    refined_r = recall(
        topk_map(sim_ann_ivf_pq_refined(spark, sf_dir).collect()), exact
    )
    out["ivf_spill_uniform"] = {
        "nlist": nlist,
        "nprobe": nprobe,
        "spill": IVF_SPILL,
        "recall_at_5": spill_r,
        "contract": ">= 0.98 (pytest test_refined_uniform_recall)",
    }
    out["ivf_pq_refined_uniform"] = {
        "nlist": nlist,
        "nprobe": nprobe,
        "spill": IVF_SPILL,
        "recall_at_5": refined_r,
        "contract": ">= 0.98 (pytest test_refined_uniform_recall)",
    }

    # --- clustered fixture at nprobe/nlist = 1/4 (the IVF premise demo)
    corpus = clustered_corpus(spark, sf_dir)
    cents = planted_centroids(spark, sf_dir)
    queries = corpus.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
    )
    from elastic_stream_spark.functions.vectorfns import dot
    from pyspark.sql.window import Window

    cb = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("u").alias("nu"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    exact_c = topk_map(
        cb.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qu"), F.col("nu")), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    )
    approx_c = topk_map(
        ivf_topk(corpus, queries, cents, IVF_CLUSTERED_NPROBE).collect()
    )
    out["ivf_clustered"] = {
        "nlist": IVF_CLUSTERED_NLIST,
        "nprobe": IVF_CLUSTERED_NPROBE,
        "candidate_fraction": round(IVF_CLUSTERED_NPROBE / IVF_CLUSTERED_NLIST, 3),
        "recall_at_5": recall(approx_c, exact_c),
    }

    # --- served IVF-PQ: post-append staleness probe (r7 VERDICT item 8).
    # Build the persisted index, then ivf_pq_append a batch of CLOSER
    # twins (eps = PQT_EPS/2 — higher cosine than every build-time twin,
    # so the appended vectors DISPLACE originals from the exact top-5).
    # A stale index (append not visible to the serving scan) would
    # score 0 on the displaced slots and recall would drop by exactly
    # the displaced fraction; recall at the build-time contract proves
    # the appended cells are read, not assumed.
    import tempfile

    from elastic_stream_spark.operators.similarity import (
        PQT_EPS,
        PQT_EPS_STEP,
        _twin_pq_books,
        append_twin_batch,
        ivf_pq_append,
        ivf_pq_build,
        ivf_pq_load,
        ivf_pq_topk,
        pq_twin_corpus,
    )

    tw_corpus = pq_twin_corpus(spark, sf_dir).select("vec_id", "u")
    idx = tempfile.mkdtemp(prefix="esspark-ivfpq-appendprobe-")
    ivf_pq_build(
        spark, tw_corpus, planted_centroids(spark, sf_dir),
        _twin_pq_books(spark, sf_dir), idx,
    )
    APPEND_TWINS = 2
    APPEND_ID_BASE = 3_000_000
    # eps at HALF the planted-twin bumps: the appended vectors score
    # strictly above every build-time twin, displacing exact top-5 slots
    batch = append_twin_batch(
        tw_corpus, APPEND_TWINS, APPEND_ID_BASE, PQT_EPS / 2, PQT_EPS_STEP / 2
    ).localCheckpoint(eager=True)
    n_appended = batch.count()
    ivf_pq_append(spark, batch, idx)

    full = tw_corpus.unionByName(batch)
    tq = tw_corpus.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
    )
    fb = full.select(F.col("vec_id").alias("neighbor_id"), F.col("u").alias("nu"))
    exact_pa_rows = (
        fb.join(F.broadcast(tq), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qu"), F.col("nu")), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    )
    exact_pa = topk_map(exact_pa_rows)
    displaced = sum(
        1 for r in exact_pa_rows if r.neighbor_id >= APPEND_ID_BASE
    ) / max(len(exact_pa_rows), 1)
    import os as _os

    cents_pa, books_pa = ivf_pq_load(idx)
    codes_pa = spark.read.parquet(_os.path.join(idx, "codes")).select(
        "vec_id", F.col("cell").cast("int").alias("cell"), "code"
    )
    approx_pa = topk_map(
        ivf_pq_topk(
            full, tq, cents_pa, IVF_CLUSTERED_NPROBE, books_pa, codes=codes_pa
        ).collect()
    )
    out["ivf_pq_post_append"] = {
        "appended_vectors": n_appended,
        "exact_top5_displaced_by_append": round(displaced, 3),
        "recall_at_5": recall(approx_pa, exact_pa),
        "contract": (
            ">= build-time recall; a stale index would lose the displaced "
            "fraction outright"
        ),
    }

    # --- r12 (r11 VERDICT item 4): post-append staleness replay through
    # the REFINED uniform serving paths — the forms a user actually runs.
    # Freeze the quantizer trained on the ORIGINAL uniform corpus
    # (centroids + 8-bit books), persist the spill-coded index, append
    # per-query near-twins (cosine ≈ 0.99 — displaces UA_TWINS of each
    # exact top-5), then serve (a) plain IVF + boundary spill with the
    # frozen centroids and (b) the persisted IVF-PQ index (spill codes,
    # PQ_REFINE_SERVE depth).  Contract: recall ≥ the build-time numbers
    # just measured above — a stale codes table or a quantizer unable to
    # place appended vectors would lose the displaced fraction outright.
    from elastic_stream_spark.operators.similarity import (
        PQ_REFINE_SERVE,
        UA_TWINS,
        UA_ID_BASE,
        _unit_emb,
        _uniform_pq_books,
        ivf_topk as _ivf_topk,
        uniform_append_batch,
    )

    emb_u = _unit_emb(spark, sf_dir)
    books8 = _uniform_pq_books(spark, sf_dir)
    _, _, centroids_u = _train_centroids(spark, sf_dir)
    idx_u = tempfile.mkdtemp(prefix="esspark-ivfpq-uniappend-")
    ivf_pq_build(spark, emb_u, centroids_u, books8, idx_u, spill=IVF_SPILL)
    batch_u = uniform_append_batch(spark, sf_dir).localCheckpoint(eager=True)
    n_appended_u = batch_u.count()
    ivf_pq_append(spark, batch_u, idx_u)

    full_u = emb_u.unionByName(batch_u)
    uq = emb_u.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
    )
    ub = full_u.select(
        F.col("vec_id").alias("neighbor_id"), F.col("u").alias("nu")
    )
    exact_u_rows = (
        ub.join(F.broadcast(uq), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qu"), F.col("nu")), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    )
    exact_u = topk_map(exact_u_rows)
    displaced_u = sum(
        1 for r in exact_u_rows if r.neighbor_id >= UA_ID_BASE
    ) / max(len(exact_u_rows), 1)

    spill_pa = recall(
        topk_map(
            _ivf_topk(
                full_u, uq, centroids_u, nprobe, spill=IVF_SPILL
            ).collect()
        ),
        exact_u,
    )
    codes_u = spark.read.parquet(_os.path.join(idx_u, "codes")).select(
        "vec_id", F.col("cell").cast("int").alias("cell"), "code"
    )
    refined_pa = recall(
        topk_map(
            ivf_pq_topk(
                full_u,
                uq,
                centroids_u,
                nprobe,
                books8,
                refine=PQ_REFINE_SERVE,
                codes=codes_u,
            ).collect()
        ),
        exact_u,
    )
    common = {
        "appended_vectors": n_appended_u,
        "appended_twins_per_query": UA_TWINS,
        "exact_top5_displaced_by_append": round(displaced_u, 3),
        "nlist": nlist,
        "nprobe": nprobe,
        "spill": IVF_SPILL,
    }
    out["ivf_spill_post_append"] = {
        **common,
        "recall_at_5": spill_pa,
        "build_time_recall_at_5": spill_r,
        "contract": ">= build-time recall (pytest test_refined_post_append_recall)",
    }
    out["ivf_pq_refined_post_append"] = {
        **common,
        "refine": PQ_REFINE_SERVE,
        "recall_at_5": refined_pa,
        "build_time_recall_at_5": refined_r,
        "contract": ">= build-time recall (pytest test_refined_post_append_recall)",
    }

    line = json.dumps(out)
    print(line)
    for a in sys.argv[1:]:
        if a.startswith("--json"):
            path = a.split("=", 1)[1] if "=" in a else "RECALL.json"
            with open(path, "w") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
