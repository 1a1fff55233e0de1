"""Fourth post-saturation staged operator (r17+ candidate queue).

Same staging protocol as ``staged_r14``–``staged_r16``: built,
DuckDB-oracled, comparator-verified at all three fixture scales,
registered only when a gate slot frees (the rotation is permanently
saturated at 150 — see operators/__init__.py).  Kept out of
``operators/__init__`` so the rotation invariants in
``tests/test_registry.py`` keep holding.

Reference framing: no reference-engine counterpart (the opcode enum
components/protocol/fbs/rpc.fbs:111-182 is stream ops only).  This
completes the decontamination TRIPTYCH a training-data pipeline runs
against its eval benchmarks: exact verbatim overlap
(``decontaminate_ngrams``, word-5-grams), fuzzy lexical overlap
(``decontaminate_neardup``, staged_r16 — MinHash over shingles), and —
here — SEMANTIC overlap: a rewritten or translated copy of an eval
item shares almost no lexical surface but stays nearest-neighbor-close
in embedding space (the SemDeDup observation, applied cross-split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Split modulus for the semantic holdout.  Deliberately 7, not the text
# family's EVAL_MOD=10: the fixture's planted twin ids are
# ``orig + TWIN_ID_BASE`` with TWIN_ID_BASE ≡ 0 (mod 10) but ≡ 1
# (mod 7), so under mod-10 every planted twin lands in its original's
# split (zero planted cross-split pairs — the audit would be vacuously
# empty), while mod-7 makes twins STRADDLE the boundary in both
# directions (eval original / train twin and vice versa).  On a real
# pipeline the eval side is an explicit benchmark table and no modulus
# exists; here the deterministic split plays that role, exactly as
# EVAL_MOD does for the two lexical decontamination operators.
SEM_EVAL_MOD = 7
# Broadcast guard for the verified join's eval side (r15 VERDICT item
# 2): the "eval holdout" here is a mod-7 slice of the embedding corpus,
# so its row count grows ∝ corpus and an unconditional broadcast OOMs
# at true scale (a real benchmark holdout is fixed-size — the docstring
# assumption — but the code must not rely on it).  Below the bound the
# eval side broadcasts explicitly (the staged_r16/r17 convention);
# above it the hint is dropped and Catalyst plans a shuffle join —
# identical results either way.  Sizing: 500k eval vectors × ~600 B
# (64 doubles + id + framing) ≈ 0.3 GB built — comfortably inside the
# 8 GB broadcast cap.
SEM_EVAL_BROADCAST_MAX_VECS = 500_000


def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training vectors whose embeddings NEAR-DUPLICATE the eval
    holdout: hyperplane-LSH candidates (same signature family, tables,
    and 0.85 cosine threshold as the driver-verified
    ``dedup_embedding_lsh``) filtered to cross-split pairs BEFORE the
    exact-cosine verification, rolled up to one row per contaminated
    training vector with its eval-match count and worst cosine.

    Recall argument: identical corpus, planes, and threshold as
    ``dedup_embedding_lsh`` (planted twins at ≈ 0.97 cosine; TWIN_*
    margin notes in similarity.py), so the verified output equals the
    brute-force oracle on the fixture.

    Plan (100 TB): signatures are one Arrow mapInPandas matmul over the
    corpus (shared shape with the ANN family, materialized once); the
    candidate bucket join prunes to collisions; the cross-split filter
    runs on the CANDIDATE table (before any vector join), so exact
    verification pays one dot product per cross-split candidate only —
    and at real scale the eval side is a fixed benchmark set, making
    the verified join's eval side broadcastable exactly as in
    staged_r16."""
    from elastic_stream_spark.operators.similarity import (
        LSH_DEDUP_TABLES,
        LSH_DEDUP_THRESHOLD,
        _emb_dim,
        ann_lsh_candidates,
        dot,
        planted_twin_corpus,
    )

    corpus = planted_twin_corpus(spark, sf_dir)
    dim = _emb_dim(spark, sf_dir)
    cand = ann_lsh_candidates(corpus, dim, n_tables=LSH_DEDUP_TABLES)
    a_eval = F.col("vec_a") % SEM_EVAL_MOD == 0
    b_eval = F.col("vec_b") % SEM_EVAL_MOD == 0
    cross = cand.where(a_eval != b_eval).select(
        F.when(a_eval, F.col("vec_b")).otherwise(F.col("vec_a")).alias("vec_id"),
        F.when(a_eval, F.col("vec_a")).otherwise(F.col("vec_b")).alias("eval_vec"),
    )
    ut = corpus.select(F.col("vec_id"), F.col("u").alias("ut"))
    # the eval side is the fixed holdout slice — filter it down and state
    # the broadcast explicitly (the 100 TB physical plan the docstring
    # promises, matching staged_r16's F.broadcast(eval_b)); the filter
    # cannot change the join result (cross only emits eval_vec ids with
    # eval_vec % SEM_EVAL_MOD == 0)
    ue = corpus.where(F.col("vec_id") % SEM_EVAL_MOD == 0).select(
        F.col("vec_id").alias("eval_vec"), F.col("u").alias("ue")
    )
    # size-guarded broadcast (see SEM_EVAL_BROADCAST_MAX_VECS): the
    # corpus is embeddings ∪ TWIN_N planted twins, so the eval slice is
    # bounded by (rows + TWIN_N) / SEM_EVAL_MOD; the memoized row count
    # costs one job per session and the hint never changes results
    from elastic_stream_spark.operators.similarity import TWIN_N
    from elastic_stream_spark.sources.envelope import table_rows

    n_eval = (table_rows(spark, sf_dir, "embeddings") + TWIN_N) // SEM_EVAL_MOD
    if n_eval <= SEM_EVAL_BROADCAST_MAX_VECS:
        ue = F.broadcast(ue)
    verified = (
        cross.join(ut, "vec_id")
        .join(ue, "eval_vec")
        .select(
            "vec_id",
            "eval_vec",
            F.round(dot(F.col("ut"), F.col("ue")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= LSH_DEDUP_THRESHOLD)
    )
    return (
        verified.groupBy("vec_id")
        .agg(
            F.count("*").alias("n_eval_dups"),
            F.max("cosine").alias("max_cosine"),
        )
        .orderBy("vec_id")
    )


QUERIES = {
    "decontaminate_semantic": decontaminate_semantic,
}
QUERIES_R17 = QUERIES


def _oracles_r17() -> dict[str, str]:
    from elastic_stream_spark.operators.similarity import (
        LSH_DEDUP_THRESHOLD,
        TWIN_EPS,
        TWIN_ID_BASE,
        TWIN_N,
    )

    # brute-force cross-split cosine join over the identical derived
    # corpus (the same no-minhash/no-LSH oracle stance as
    # dedup_embedding_lsh: band/bucket recall ≈ 1 at the fixture's
    # planted similarity makes the verified output exhaustive)
    return {
        "decontaminate_semantic": f"""
            WITH base AS (
              SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                         x -> x / sqrt(list_sum(list_transform(
                                  CAST(embedding AS DOUBLE[]), y -> y * y)))) AS u
              FROM embeddings
            ), perturbed AS (
              SELECT vec_id AS orig_id,
                     list_transform(u, (x, i) ->
                         x + CASE WHEN i - 1 = orig_id % len(u)
                                  THEN {TWIN_EPS} ELSE 0.0 END) AS p
              FROM base WHERE vec_id < {TWIN_N}
            ), twins AS (
              SELECT orig_id + {TWIN_ID_BASE} AS vec_id,
                     list_transform(p, x -> x / sqrt(list_sum(list_transform(
                                  p, y -> y * y)))) AS u
              FROM perturbed
            ), corpus AS (
              SELECT vec_id, u FROM base
              UNION ALL
              SELECT vec_id, u FROM twins
            ), cross_pairs AS (
              SELECT CASE WHEN a.vec_id % {SEM_EVAL_MOD} = 0
                          THEN b.vec_id ELSE a.vec_id END AS vec_id,
                     round(list_cosine_similarity(a.u, b.u), 6) AS cosine
              FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
              WHERE (a.vec_id % {SEM_EVAL_MOD} = 0)
                    != (b.vec_id % {SEM_EVAL_MOD} = 0)
            )
            SELECT vec_id,
                   count(*) AS n_eval_dups,
                   max(cosine) AS max_cosine
            FROM cross_pairs
            WHERE cosine >= {LSH_DEDUP_THRESHOLD}
            GROUP BY vec_id ORDER BY vec_id
        """,
    }


def ORACLES_R17() -> dict[str, str]:  # callable: imports stay lazy
    return _oracles_r17()


_ORACLES_CACHE: dict[str, str] | None = None


def __getattr__(name: str):  # PEP 562: registry reads m.ORACLES lazily
    global _ORACLES_CACHE
    if name == "ORACLES":
        if _ORACLES_CACHE is None:
            _ORACLES_CACHE = _oracles_r17()
        return _ORACLES_CACHE
    raise AttributeError(name)
