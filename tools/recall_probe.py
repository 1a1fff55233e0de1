"""Approximate-ANN recall telemetry (r6 VERDICT item 7): measure the
recall of the approximate serving paths against exact brute force and
write a committed JSON so serving quality is tracked per round, not just
asserted once in pytest.

Paths probed:
- ``sim_ann_ivf_approx`` — trained quantizer, nprobe = nlist/2 on the
  near-uniform driver fixture (pytest contract: recall ≥ 0.8);
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

    line = json.dumps(out)
    print(line)
    for a in sys.argv[1:]:
        if a.startswith("--json"):
            path = a.split("=", 1)[1] if "=" in a else "RECALL.json"
            with open(path, "w") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
