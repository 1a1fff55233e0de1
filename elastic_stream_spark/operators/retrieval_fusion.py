"""Hybrid retrieval — reciprocal-rank fusion of a sparse (token-overlap)
ranker with a dense (embedding-cosine) ranker, and metadata-filtered
vector search.

The reference engine exposes no retrieval surface (its opcode enum,
components/protocol/fbs/rpc.fbs:111-182, is stream ops only); these are
the serving-side queries of a training-data platform: "find documents
like this seed" fused across lexical and semantic evidence (the standard
hybrid-search recipe: Cormack/Clarke/Buettcher RRF, SIGIR'09), and
"nearest neighbors among documents passing a metadata predicate" (the
filtered-ANN shape every vector store exposes).

Scale notes (100 TB):
- Both rankers broadcast the tiny probe set onto the corpus; the corpus
  moves once per ranker (token equi-join / one scan for the scoring
  pass).  Per-ranker lists are truncated to ``FUSE_LIST_K`` with the
  same TWO-PHASE top-k the BM25 operator uses (per-shuffle-partition
  row_number prune keeps every global-top-k candidate by construction,
  then a final window over ≤ k·n_partitions survivors) — a per-query
  reducer never sees a corpus-sized candidate list.
- RRF then operates on two k-row lists per query (a full-outer join of
  two tiny sets) — fusion cost is independent of corpus size, which is
  exactly why production hybrid search fuses truncated lists instead of
  full rankings.
- ``filtered_vector_search`` is PRE-FILTER semantics (filter, then
  search): the metadata predicate joins/prunes the corpus before any
  scoring, so selectivity directly reduces scored rows; the brute-force
  scoring pass here is the exact baseline the IVF serving path
  (similarity.sim_ann_ivf_pq_served) would replace at scale.
- Cross-engine float determinism: cosine is rounded to 6 dp before
  ranking (the sim_topk_bruteforce contract); RRF scores are a sum of
  two ``1/(K+rank)`` terms computed in the same order in both engines
  and rounded to 6 dp before the final ranking, with a doc_id
  tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elastic_stream_spark.functions.textfns import distinct_tokens
from elastic_stream_spark.functions.vectorfns import dot, unit
from elastic_stream_spark.sources.envelope import load_table_balanced

# "more-like-this" probes: seed documents (doc_id == vec_id in the
# fixture — both tables are 0..n-1 aligned).
FUSE_SEEDS = (0, 1, 2)
FUSE_LIST_K = 50  # per-ranker truncated list length
RRF_K = 60  # the standard RRF damping constant
FUSE_TOP = 10

FV_N_QUERIES = 20  # filtered search probes: vec_id < 20
FV_LANG = "en"  # metadata predicate: only English documents
FV_TOP_K = 5


def _topk(df: DataFrame, order: tuple[Column, ...], rank_col: str, k: int) -> DataFrame:
    """Two-phase per-``qid`` top-k (the BM25 prune): per-shuffle-partition
    row_number keeps every global-top-k candidate by construction, then
    the final per-qid window ranks ≤ k·n_partitions survivors."""
    w_part = Window.partitionBy("qid", "pid").orderBy(*order)
    pruned = (
        df.withColumn("pid", F.spark_partition_id())
        .withColumn("prk", F.row_number().over(w_part))
        .where(F.col("prk") <= k)
        .drop("pid", "prk")
    )
    w_final = Window.partitionBy("qid").orderBy(*order)
    return pruned.withColumn(rank_col, F.row_number().over(w_final)).where(
        F.col(rank_col) <= k
    )


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid more-like-this: for each seed document, rank the corpus by
    (a) distinct-token overlap with the seed and (b) embedding cosine,
    truncate each ranking to ``FUSE_LIST_K``, fuse with reciprocal-rank
    fusion ``rrf = Σ 1/(RRF_K + rank)`` and return the fused top
    ``FUSE_TOP`` per seed.

    Plan: the seed token set and seed vectors broadcast; the sparse arm
    is one token equi-join + one (qid, doc) count aggregation, the dense
    arm one scan with a codegen'd dot product; both top-k lists use the
    two-phase prune; fusion is a full-outer join of two k-row lists —
    corpus-size-independent."""
    docs = load_table_balanced(spark, sf_dir, "documents").select(
        "doc_id", distinct_tokens("text").alias("dt")
    )
    seed_toks = (
        docs.where(F.col("doc_id").isin(*FUSE_SEEDS))
        .select(F.col("doc_id").alias("qid"), F.explode("dt").alias("token"))
    )
    corp_toks = docs.select("doc_id", F.explode("dt").alias("token"))
    overlap = (
        F.broadcast(seed_toks)
        .join(corp_toks, "token")
        .where(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(F.count("*").alias("ov"))
    )
    sparse = _topk(
        overlap, (F.desc("ov"), F.asc("doc_id")), "sr", FUSE_LIST_K
    ).select("qid", "doc_id", "sr")

    emb = load_table_balanced(spark, sf_dir, "embeddings").select(
        "vec_id", unit(F.col("embedding")).alias("u")
    )
    seed_vecs = emb.where(F.col("vec_id").isin(*FUSE_SEEDS)).select(
        F.col("vec_id").alias("qid"), F.col("u").alias("qu")
    )
    scored = emb.join(F.broadcast(seed_vecs), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("doc_id"),
        F.round(dot(F.col("qu"), F.col("u")), 6).alias("cos"),
    )
    dense = _topk(
        scored, (F.desc("cos"), F.asc("doc_id")), "dr", FUSE_LIST_K
    ).select("qid", "doc_id", "dr")

    # sparse-term + dense-term, in that fixed order in both engines
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("sr")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("dr")), F.lit(0.0)),
        6,
    )
    fused = (
        sparse.join(dense, ["qid", "doc_id"], "full_outer")
        .select(
            "qid",
            "doc_id",
            rrf.alias("rrf_score"),
            F.col("sr").cast("double").alias("sparse_rank"),
            F.col("dr").cast("double").alias("dense_rank"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= FUSE_TOP)
        .orderBy("qid", "rank")
    )


def filtered_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered exact vector search: cosine top-``FV_TOP_K``
    neighbors for each probe (vec_id < ``FV_N_QUERIES``), restricted to
    documents with ``lang = FV_LANG`` — PRE-FILTER semantics (the
    predicate prunes the corpus before scoring, so the recall set is
    exactly the filtered corpus).

    Plan: the lang predicate pushes into the documents scan; the doc →
    vector attach is a doc_id equi-join; probes broadcast; one codegen'd
    scoring pass over the filtered corpus + the two-phase top-k."""
    emb = load_table_balanced(spark, sf_dir, "embeddings").select(
        "vec_id", unit(F.col("embedding")).alias("u")
    )
    keep = (
        load_table_balanced(spark, sf_dir, "documents")
        .where(F.col("lang") == FV_LANG)
        .select(F.col("doc_id").alias("vec_id"))
    )
    corpus = emb.join(keep, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("u").alias("nu")
    )
    queries = emb.where(F.col("vec_id") < FV_N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("u").alias("qu")
    )
    scored = corpus.join(
        F.broadcast(queries), F.col("qid") != F.col("neighbor_id")
    ).select(
        "qid",
        "neighbor_id",
        F.round(dot(F.col("qu"), F.col("nu")), 6).alias("cosine"),
    )
    out = _topk(scored, (F.desc("cosine"), F.asc("neighbor_id")), "rank", FV_TOP_K)
    return (
        out.select(
            F.col("qid").alias("query_id"),
            "neighbor_id",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


QUERIES = {
    "hybrid_rrf_search": hybrid_rrf_search,
    "filtered_vector_search": filtered_vector_search,
}

_SEEDS_SQL = ", ".join(str(s) for s in FUSE_SEEDS)

ORACLES = {
    "hybrid_rrf_search": f"""
        WITH d AS (
          SELECT doc_id,
                 list_distinct(string_split(lower(text), ' ')) AS dt
          FROM documents
        ), corp_toks AS (
          SELECT doc_id, unnest(dt) AS token FROM d
        ), seed_toks AS (
          SELECT doc_id AS qid, unnest(dt) AS token FROM d
          WHERE doc_id IN ({_SEEDS_SQL})
        ), ov AS (
          SELECT qid, c.doc_id, count(*) AS ov
          FROM seed_toks s JOIN corp_toks c USING (token)
          WHERE c.doc_id != s.qid
          GROUP BY qid, c.doc_id
        ), sparse AS (
          SELECT qid, doc_id, sr FROM (
            SELECT qid, doc_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY ov DESC, doc_id) AS sr
            FROM ov
          ) WHERE sr <= {FUSE_LIST_K}
        ), dense0 AS (
          SELECT q.vec_id AS qid, c.vec_id AS doc_id,
                 round(list_cosine_similarity(
                   CAST(q.embedding AS DOUBLE[]),
                   CAST(c.embedding AS DOUBLE[])), 6) AS cos
          FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
          WHERE q.vec_id IN ({_SEEDS_SQL})
        ), dense AS (
          SELECT qid, doc_id, dr FROM (
            SELECT qid, doc_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cos DESC, doc_id) AS dr
            FROM dense0
          ) WHERE dr <= {FUSE_LIST_K}
        ), fused AS (
          SELECT coalesce(s.qid, dn.qid) AS qid,
                 coalesce(s.doc_id, dn.doc_id) AS doc_id,
                 round(coalesce(1.0e0 / ({RRF_K} + s.sr), 0.0e0)
                       + coalesce(1.0e0 / ({RRF_K} + dn.dr), 0.0e0), 6)
                   AS rrf_score,
                 CAST(s.sr AS DOUBLE) AS sparse_rank,
                 CAST(dn.dr AS DOUBLE) AS dense_rank
          FROM sparse s FULL OUTER JOIN dense dn
            ON s.qid = dn.qid AND s.doc_id = dn.doc_id
        )
        SELECT qid, doc_id, rrf_score, sparse_rank, dense_rank, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY rrf_score DESC, doc_id) AS rank
          FROM fused
        ) WHERE rank <= {FUSE_TOP}
        ORDER BY qid, rank
    """,
    "filtered_vector_search": f"""
        WITH corpus AS (
          SELECT e.vec_id, e.embedding
          FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
          WHERE d.lang = '{FV_LANG}'
        ), scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(
                   CAST(q.embedding AS DOUBLE[]),
                   CAST(c.embedding AS DOUBLE[])), 6) AS cosine
          FROM embeddings q JOIN corpus c ON q.vec_id != c.vec_id
          WHERE q.vec_id < {FV_N_QUERIES}
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= {FV_TOP_K}
        ORDER BY query_id, rank
    """,
}
