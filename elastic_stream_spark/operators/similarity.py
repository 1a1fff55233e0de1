"""Similarity search over the ``embeddings`` table (north-star).

- ``sim_topk_bruteforce`` — exact cosine top-k: the correctness baseline.
  Vectors are L2-normalized once per row (cosine → single dot per pair;
  higher-order fns are interpreted, so per-pair work is kept minimal),
  the query side is broadcast, the corpus side is repartitioned for
  parallelism, top-k via ranking window on the query key.  At 100 TB the
  same plan holds for a bounded query set: broadcast queries ×
  partitioned corpus scan = embarrassingly parallel, one shuffle on
  query_id for the top-k.
- ``sim_ann_ivf`` — the scale path: IVF (inverted-file) index.
  Deterministic centroids (first NLIST vectors by id — seed-free),
  assign each corpus vector to its nearest centroid (broadcast
  centroids), probe the NPROBE nearest centroid cells per query, exact
  re-rank inside the probed cells.  Candidates ∝ corpus·NPROBE/NLIST
  instead of the whole corpus.  Approximate ⇒ no SQL oracle; recall vs
  brute force asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from elastic_stream_spark.functions.vectorfns import dot, unit
from elastic_stream_spark.sources.envelope import load_table

N_QUERIES = 50  # query set: vec_id < 50
TOP_K = 5
NLIST = 16  # IVF cells
NPROBE = 4


def _unit_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", unit(F.col("embedding")).alias("u")
    )


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for each query vector (vec_id < 50),
    excluding self."""
    emb = _unit_emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("u").alias("nu")
    ).repartition(32)
    scored = corpus.join(
        F.broadcast(queries), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("qu"), F.col("nu")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → nearest-centroid cell (the IVF index build).  Centroids =
    first NLIST vectors by id: deterministic, seed-free.  Returns
    (vec_id, u, cell)."""
    emb = _unit_emb(spark, sf_dir)
    centroids = emb.where(F.col("vec_id") < NLIST).select(
        F.col("vec_id").alias("cell"), F.col("u").alias("cu")
    )
    scored = (
        emb.repartition(32)
        .join(F.broadcast(centroids))
        .select("vec_id", "u", "cell", dot(F.col("u"), F.col("cu")).alias("sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "u", "cell")
    )


def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF probe: for each query (vec_id < 50),
    score only vectors in the NPROBE nearest cells.  Rows-only driver
    check (approximate); recall vs brute force asserted in tests."""
    assigned = ivf_assignments(spark, sf_dir)
    emb = _unit_emb(spark, sf_dir)
    centroids = emb.where(F.col("vec_id") < NLIST).select(
        F.col("vec_id").alias("cell"), F.col("u").alias("cu")
    )
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
    )
    qcell = queries.join(F.broadcast(centroids)).select(
        "query_id", "qu", "cell", dot(F.col("qu"), F.col("cu")).alias("sim")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell"))
    probes = (
        qcell.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= NPROBE)
        .select("query_id", "qu", "cell")
    )
    cand = assigned.repartition(32, "cell").join(F.broadcast(probes), "cell").where(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(dot(F.col("qu"), F.col("u")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_ann_ivf": sim_ann_ivf,
}

ORACLES = {
    "sim_topk_bruteforce": f"""
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                              CAST(c.embedding AS DOUBLE[])), 6) AS cosine
          FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
          WHERE q.vec_id < {N_QUERIES}
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        )
        WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
    # sim_ann_ivf: approximate — rows-only check by design.
}
