"""End-to-end training-data pipeline operators over ``documents``.

These compose the dedup/text primitives into the two operations a
corpus-curation pipeline actually runs:

- ``dedup_clusters`` — connected components over the verified near-dup
  pair graph: every near-dup group gets one canonical representative
  (the min doc_id in its component), not just pairwise flags.  Spark
  side: iterative hash-min label propagation — each iteration is one
  distributed join + aggregate; the driver loop only checks a
  convergence counter (O(component diameter) iterations; near-dup
  clusters are shallow, so 2-4 in practice).  At 100 TB this is the
  standard formulation (the GraphX/GraphFrames CC algorithm is the same
  fixpoint); lineage is truncated per iteration with localCheckpoint so
  plans stay flat.  DuckDB oracle: recursive CTE computing the same
  min-label fixpoint.

- ``pipeline_keep_list`` — the full filter verdict per document:
  quality score, exact-duplicate flag (bag-of-words fingerprint, keep
  min doc_id), near-duplicate flag (in a CC cluster, not the
  representative), and the final ``keep`` decision.  One pass over the
  corpus joined against two driver-free side tables — exactly the job
  that decides what enters a training run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from elastic_stream_spark.functions.textfns import bow_fingerprint
from elastic_stream_spark.operators.curation import EVAL_MOD as CUR_EVAL_MOD
from elastic_stream_spark.operators.curation import NGRAM_N as CUR_NGRAM_N
from elastic_stream_spark.operators.curation import (
    PACK_BUDGET as CUR_PACK_BUDGET,
    REP_DUP2_MAX,
    REP_TOPTOK_MAX,
    SPLIT_TEST_HEX as CUR_SPLIT_TEST_HEX,
    SPLIT_VAL_HEX as CUR_SPLIT_VAL_HEX,
)
from elastic_stream_spark.operators.dedup import CAPPED_PAIRS_SQL, ngram_pair_set
from elastic_stream_spark.operators.text import QUALITY_SQL, quality_score_col
from elastic_stream_spark.sources.envelope import load_table_balanced

CC_MAX_ITER = 25  # safety bound; hash-min converges in O(diameter)


def connected_components(pairs: DataFrame, max_iter: int = CC_MAX_ITER) -> DataFrame:
    """Hash-min label propagation WITH path shortcutting over an
    undirected edge list ``(doc_a, doc_b)`` → ``(doc_id, cluster_id)``
    for every node that appears in an edge; ``cluster_id`` = min doc_id
    of the component.

    Each iteration: (1) neighbor-min join — every node takes the min
    label over itself and its neighbors; (2) pointer-doubling shortcut —
    every node then takes its label's label (labels are always node ids,
    so the lookup is a self-join).  Step 2 roughly doubles how far the
    component minimum has propagated per round, so convergence is
    O(log diameter) instead of O(diameter) — a 60-deep near-dup chain
    converges in ~8 rounds, and ``max_iter`` = 25 covers any component a
    real corpus can produce (the GraphFrames/large-star trick in
    DataFrame form).  Labels only decrease and are bounded by the
    component min, so the fixpoint is exact.

    Each round is a bounded number of shuffles on doc_id, fully
    distributed; the driver sees only a scalar convergence count.
    ``localCheckpoint`` truncates lineage so the plan does not grow with
    iterations (the classic iterative-algorithm pitfall)."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    changed = 1
    for it in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        # old_label rides along so convergence is a scan of the
        # checkpointed result, not a separate join-action per iteration
        stepped = labels.join(nbr_min, "doc_id", "left").select(
            "doc_id",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias(
                "label"
            ),
        )
        if it > 0:
            # pointer doubling: label ← label(label).  Every label is a
            # node id present in `stepped`, so the lookup is a self-join.
            # Skipped on iteration 0: labels start as identity, so
            # label(label) after one neighbor-min step can only repeat
            # the neighbor-min of a node whose own step is in this same
            # round — the join would re-shuffle everything to shortcut
            # chains that don't exist yet.
            lmap = stepped.select(
                F.col("doc_id").alias("label"), F.col("label").alias("label2")
            )
            stepped = stepped.join(lmap, "label", "left").select(
                "doc_id",
                "old_label",
                F.least(F.col("label"), F.coalesce("label2", F.col("label"))).alias(
                    "label"
                ),
            )
        # the convergence count piggybacks on the checkpoint job via
        # observe(): ONE action per iteration total
        obs = Observation(f"cc_changed_{it}")
        new_labels = stepped.observe(
            obs, F.sum((F.col("label") != F.col("old_label")).cast("long")).alias("n")
        ).localCheckpoint(eager=True)
        changed = int(obs.get["n"] or 0)
        labels = new_labels.select("doc_id", "label")
        if changed == 0:
            break
    if changed != 0:
        # a silent early exit would split one component into several
        # "representatives" and let pipeline_keep_list keep duplicates —
        # fail loudly instead (a chain this deep means the near-dup graph
        # is pathological; raise max_iter or densify edges upstream).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


# Cluster-table memo, keyed by (applicationId, corpus dir): the CC
# fixpoint is the most expensive stage shared by the downstream verdict
# queries (pipeline_keep_list, pipeline_curation_verdict) — a production
# pipeline materializes the cluster table once and every consumer joins
# it; here the same thing at session lifetime (the fixpoint's final
# labels are already a localCheckpoint).  dedup_clusters — the
# CONSTRUCTION query — bypasses this memo so its bench/scale timings
# measure the fixpoint, not a memo hit.  Same session-binding and
# immutability argument as dedup._PAIR_CACHE.
_CC_CACHE: dict[tuple[str, str], DataFrame] = {}


def _cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CC_CACHE.get(key)
    if cached is None:
        # evict dead-application entries (see dedup._PAIR_CACHE)
        for stale in [k for k in _CC_CACHE if k[0] != key[0]]:
            del _CC_CACHE[stale]
        cached = connected_components(ngram_pair_set(spark, sf_dir))
        _CC_CACHE[key] = cached
    return cached


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components of the verified
    3-gram-Jaccard ≥ 0.8 pair graph, with component size and the kept
    representative flag.  Recomputes the fixpoint each call (construction
    operator — see _CC_CACHE note); the pair set itself reads the
    session materialization."""
    comp = connected_components(ngram_pair_set(spark, sf_dir))
    w = Window.partitionBy("cluster_id")
    return (
        comp.withColumn("n_docs", F.count("*").over(w))
        .select(
            "doc_id",
            "cluster_id",
            "n_docs",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_representative"),
        )
        .orderBy("cluster_id", "doc_id")
    )


def pipeline_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation verdict: quality score, exact-dup flag
    (bag-of-words fingerprint — keep the min doc_id of each group),
    near-dup flag (non-representative member of a CC cluster), and the
    final keep decision (quality ≥ 0.5 AND not a dropped duplicate).

    Plan: one corpus scan computing (q, fp) → fingerprint-keep via a
    window over fp (one shuffle) → left join the cluster table (itself
    the CC fixpoint).  No collects; every stage partial-aggregable or
    key-partitioned."""
    docs = load_table_balanced(spark, sf_dir, "documents").select(
        "doc_id", quality_score_col().alias("q"), bow_fingerprint("text").alias("fp")
    )
    w = Window.partitionBy("fp")
    flagged = docs.withColumn("fp_keep", F.min("doc_id").over(w))
    comp = _cc_labels(spark, sf_dir)
    out = flagged.join(comp, "doc_id", "left").select(
        "doc_id",
        "q",
        (F.col("doc_id") != F.col("fp_keep")).alias("exact_dup"),
        (F.col("cluster_id").isNotNull() & (F.col("doc_id") != F.col("cluster_id"))).alias(
            "near_dup"
        ),
    )
    return out.withColumn(
        "keep",
        (F.col("q") >= 0.5) & ~F.col("exact_dup") & ~F.col("near_dup"),
    ).orderBy("doc_id")


def pipeline_curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE per-document curation verdict — every signal the
    pipeline computes, joined into the one table a training run consumes:
    quality score, eval-holdout membership, exact-duplicate flag, near-dup
    flag (CC cluster non-representative), eval-set contamination
    (shared word-5-gram), repetition flags (Gopher-style), and the final
    ``keep`` decision (not eval, quality ≥ 0.5, none of the flags).

    Plan: the corpus scan computes (q, fp) once; each flag table is a
    key-partitioned left join on doc_id — fingerprint window, CC fixpoint,
    decontamination equi-join, repetition groupBys — all bounded, no
    collects, every join on the same key so AQE coalesces the final
    assembly."""
    from elastic_stream_spark.operators.curation import (
        EVAL_MOD,
        decontaminate_ngrams,
        text_repetition,
    )

    docs = load_table_balanced(spark, sf_dir, "documents").select(
        "doc_id", quality_score_col().alias("q"), bow_fingerprint("text").alias("fp")
    )
    w = Window.partitionBy("fp")
    flagged = docs.withColumn("fp_keep", F.min("doc_id").over(w))
    comp = _cc_labels(spark, sf_dir)
    contam = decontaminate_ngrams(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("contaminated_t")
    )
    rep = text_repetition(spark, sf_dir).select(
        "doc_id", F.col("flagged").alias("repetitive_t")
    )
    out = (
        flagged.join(comp, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .select(
            "doc_id",
            "q",
            (F.col("doc_id") % EVAL_MOD == 0).alias("is_eval"),
            (F.col("doc_id") != F.col("fp_keep")).alias("exact_dup"),
            (
                F.col("cluster_id").isNotNull()
                & (F.col("doc_id") != F.col("cluster_id"))
            ).alias("near_dup"),
            F.coalesce("contaminated_t", F.lit(False)).alias("contaminated"),
            F.coalesce("repetitive_t", F.lit(False)).alias("repetitive"),
        )
    )
    return out.withColumn(
        "keep",
        ~F.col("is_eval")
        & (F.col("q") >= 0.5)
        & ~F.col("exact_dup")
        & ~F.col("near_dup")
        & ~F.col("contaminated")
        & ~F.col("repetitive"),
    ).orderBy("doc_id")


# manifest-fingerprint term modulus: md5-derived 60-bit doc terms are
# folded mod a prime so the per-cell SUM stays < 2^63 up to ~9e9 docs
# per (split, shard) cell in BOTH engines (Spark sums BIGINT with
# wraparound, DuckDB in HUGEINT — the mod keeps them in the common
# exact range).  Order-insensitive, O(1) reducer state.
FP_TERM_MOD = 1_000_000_007


def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED nightly curation pipeline, end to end: per-document
    verdict (quality ≥ 0.5, not eval-holdout, not exact/near duplicate,
    not eval-contaminated, not repetitive — exactly
    ``pipeline_curation_verdict``'s ``keep``) → deterministic hash
    split/shard assignment (``corpus_split_shards``'s md5 gates) →
    greedy in-order 512-token sequence packing within each (split,
    shard) (``pipeline_pack_sequences``'s window) → the final TRAINING
    MANIFEST: one row per (split, shard) with doc/token/sequence counts
    and an order-insensitive content fingerprint (Σ md5-term mod p over
    member doc_ids).  Two runs agree iff they selected exactly the same
    documents into the same shards — the regression gate a production
    pipeline publishes after every nightly build.

    Plan: the verdict reuses the session CC fixpoint (_CC_CACHE) and
    key-partitioned left joins; split/shard is a pure projection; the
    packing window partitions by (split, shard) so no shard's docs
    leave their partition; the manifest is one map-side-combinable
    aggregate over ~|splits × shards| groups with O(1) state (no
    collect_list — the fingerprint is a modular sum).  Every stage is
    the already-verified single-stage operator's plan; what this gate
    adds is the cross-stage dataflow (shared scans, memo reuse,
    persist boundaries) a real 100 TB nightly run exercises."""
    kept = (
        pipeline_curation_verdict(spark, sf_dir)
        .where(F.col("keep"))
        .select("doc_id")
    )
    docs = load_table_balanced(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens")
    )
    h = F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    prefix = F.substring(h, 1, 4)
    split = (
        F.when(prefix < CUR_SPLIT_VAL_HEX, F.lit("val"))
        .when(prefix < CUR_SPLIT_TEST_HEX, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    assigned = kept.join(docs, "doc_id").select(
        "doc_id",
        "n_tokens",
        split.alias("split"),
        F.substring(h, 5, 1).alias("shard"),
    )
    w = (
        Window.partitionBy("split", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # PACK_BUDGET is a power of two, so cumsum/512 is EXACT in doubles —
    # floor is bit-deterministic in both engines (see pack_sequences)
    binned = assigned.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / CUR_PACK_BUDGET
        ).cast("long"),
    )
    fp_term = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
        % FP_TERM_MOD
    )
    return (
        binned.groupBy("split", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (F.max("bin") + 1).cast("bigint").alias("n_sequences"),
            F.sum(fp_term).cast("bigint").alias("manifest_fp"),
        )
        .orderBy("split", "shard")
    )


def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge (the MDM "golden record" step applied to
    near-dup clusters): for every CC cluster the kept representative
    (min doc_id) absorbs provenance from the members it replaces —
    member count, the sorted distinct source list, language count and
    total chars — so dropping duplicates loses no lineage.  This is the
    operator that turns the cluster table from a drop-list into a
    merge: a real pipeline keeps one copy of the boilerplate page but
    must remember every domain that carried it (for mix weights and
    takedown audits).

    Plan: the memoized CC label table joins the corpus on doc_id (one
    key-partitioned join), then ONE map-side-combinable groupBy per
    cluster; the source list is per-cluster-sized (near-dup clusters
    are shallow), never corpus-sized."""
    comp = _cc_labels(spark, sf_dir)
    docs = load_table_balanced(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    return (
        comp.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.array_join(
                F.sort_array(F.collect_set("source")), ","
            ).alias("sources"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            F.col("cluster_id").alias("keep_doc_id"),
            "n_members",
            "sources",
            "n_langs",
            "total_chars",
        )
        .orderBy("keep_doc_id")
    )


QUERIES = {
    "dedup_clusters": dedup_clusters,
    "pipeline_keep_list": pipeline_keep_list,
    "pipeline_curation_verdict": pipeline_curation_verdict,
    "pipeline_end_to_end": pipeline_end_to_end,
    "dedup_survivorship": dedup_survivorship,
}

# Recursive min-label fixpoint over the same verified pair set the Spark
# side uses; UNION (not UNION ALL) deduplicates states → termination.
_CC_SQL = f"""
    {CAPPED_PAIRS_SQL},
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM vpairs
      UNION ALL
      SELECT doc_b AS s, doc_a AS d FROM vpairs
    ),
    walk(node, lbl) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.node
    ),
    comp AS (
      SELECT node AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY node
    )
"""

# Shared CTE chain: the COMPLETE per-document verdict (quality, eval
# flag, exact/near dup, contamination, repetition) — reused by the
# verdict oracle and by pipeline_end_to_end (same `keep` semantics).
_VERDICT_CTE_SQL = f"""
{_CC_SQL},
        {QUALITY_SQL},
        fp AS (
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(
                       string_split(lower(text), ' '))), ' ')) AS fp
          FROM documents
        ),
        ng5 AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - {CUR_NGRAM_N - 1}),
                   i -> array_to_string(t[i:i+{CUR_NGRAM_N - 1}], ' ')))) AS g
          FROM toks WHERE len(t) >= {CUR_NGRAM_N}
        ),
        eval_ng AS (
          SELECT DISTINCT g FROM ng5 WHERE doc_id % {CUR_EVAL_MOD} = 0
        ),
        decon AS (
          SELECT DISTINCT n.doc_id FROM ng5 n JOIN eval_ng e USING (g)
          WHERE n.doc_id % {CUR_EVAL_MOD} != 0
        ),
        rbase AS (
          SELECT doc_id, len(t) AS n_tokens,
                 list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1]) AS g2,
                 t
          FROM toks WHERE len(t) >= 2
        ),
        rstats AS (
          SELECT doc_id, n_tokens, len(g2) AS n2,
                 len(list_distinct(g2)) AS d2
          FROM rbase
        ),
        rtok AS (
          SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest(t) AS tok FROM rbase)
          GROUP BY doc_id, tok
        ),
        rtop AS (SELECT doc_id, max(c) AS top_c FROM rtok GROUP BY doc_id),
        rflag AS (
          SELECT s.doc_id,
                 ((s.n2 - s.d2) * 1.0 / s.n2 > {REP_DUP2_MAX}
                  OR t.top_c * 1.0 / s.n_tokens > {REP_TOPTOK_MAX})
                   AS repetitive
          FROM rstats s JOIN rtop t ON s.doc_id = t.doc_id
        ),
        verdict AS (
          SELECT f.doc_id, q.q,
                 f.doc_id % {CUR_EVAL_MOD} = 0 AS is_eval,
                 f.doc_id <> min(f.doc_id) OVER (PARTITION BY f.fp) AS exact_dup,
                 c.cluster_id IS NOT NULL AND f.doc_id <> c.cluster_id AS near_dup,
                 d.doc_id IS NOT NULL AS contaminated,
                 coalesce(r.repetitive, FALSE) AS repetitive
          FROM fp f
          JOIN q_per_doc q ON f.doc_id = q.doc_id
          LEFT JOIN comp c ON f.doc_id = c.doc_id
          LEFT JOIN decon d ON f.doc_id = d.doc_id
          LEFT JOIN rflag r ON f.doc_id = r.doc_id
        )
"""

ORACLES = {
    "dedup_clusters": f"""
        WITH RECURSIVE {_CC_SQL}
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS n_docs,
               doc_id = cluster_id AS is_representative
        FROM comp
        ORDER BY cluster_id, doc_id
    """,
    "pipeline_keep_list": f"""
        WITH RECURSIVE {_CC_SQL},
        {QUALITY_SQL},
        fp AS (
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(
                       string_split(lower(text), ' '))), ' ')) AS fp
          FROM documents
        ),
        flagged AS (
          SELECT f.doc_id,
                 q.q,
                 f.doc_id <> min(f.doc_id) OVER (PARTITION BY f.fp) AS exact_dup,
                 c.cluster_id IS NOT NULL AND f.doc_id <> c.cluster_id AS near_dup
          FROM fp f
          JOIN q_per_doc q ON f.doc_id = q.doc_id
          LEFT JOIN comp c ON f.doc_id = c.doc_id
        )
        SELECT doc_id, q, exact_dup, near_dup,
               q >= 0.5 AND NOT exact_dup AND NOT near_dup AS keep
        FROM flagged
        ORDER BY doc_id
    """,
    # full verdict: CC fixpoint + quality + fingerprints + 5-gram eval
    # decontamination + repetition flags, assembled exactly like the Spark
    # plan (r-prefixed CTEs avoid collisions with the pair-set fragment,
    # which already defines `toks`)
    "pipeline_curation_verdict": f"""
        WITH RECURSIVE {_VERDICT_CTE_SQL}
        SELECT doc_id, q, is_eval, exact_dup, near_dup, contaminated,
               repetitive,
               NOT is_eval AND q >= 0.5 AND NOT exact_dup AND NOT near_dup
                 AND NOT contaminated AND NOT repetitive AS keep
        FROM verdict ORDER BY doc_id
    """,
    "dedup_survivorship": f"""
        WITH RECURSIVE {_CC_SQL}
        SELECT c.doc_id AS keep_doc_id, n_members, sources, n_langs,
               total_chars
        FROM (
          SELECT cluster_id,
                 count(*) AS n_members,
                 array_to_string(list_sort(list(DISTINCT d.source)), ',')
                   AS sources,
                 CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
                 CAST(sum(d.n_chars) AS BIGINT) AS total_chars
          FROM comp JOIN documents d USING (doc_id)
          GROUP BY cluster_id
        ) s
        JOIN (SELECT DISTINCT cluster_id AS doc_id FROM comp) c
          ON s.cluster_id = c.doc_id
        ORDER BY keep_doc_id
    """,
    # same verdict CTE → keep filter → hash split/shard → 512-token
    # packing window → manifest rollup (mirrors pipeline_end_to_end
    # stage for stage; fingerprint = Σ (md5-60-bit mod p))
    "pipeline_end_to_end": f"""
        WITH RECURSIVE {_VERDICT_CTE_SQL},
        kept AS (
          SELECT v.doc_id,
                 len(string_split(lower(d.text), ' ')) AS n_tokens,
                 md5('split:' || CAST(v.doc_id AS VARCHAR)) AS h
          FROM verdict v JOIN documents d USING (doc_id)
          WHERE NOT v.is_eval AND v.q >= 0.5 AND NOT v.exact_dup
            AND NOT v.near_dup AND NOT v.contaminated AND NOT v.repetitive
        ),
        assigned AS (
          SELECT doc_id, n_tokens,
                 CASE WHEN substr(h, 1, 4) < '{CUR_SPLIT_VAL_HEX}' THEN 'val'
                      WHEN substr(h, 1, 4) < '{CUR_SPLIT_TEST_HEX}' THEN 'test'
                      ELSE 'train'
                 END AS split,
                 substr(h, 5, 1) AS shard
          FROM kept
        ),
        binned AS (
          SELECT split, shard, doc_id, n_tokens,
                 CAST(floor(coalesce(sum(n_tokens) OVER (
                        PARTITION BY split, shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0) / {CUR_PACK_BUDGET}) AS BIGINT) AS bin
          FROM assigned
        )
        SELECT split, shard,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(max(bin) + 1 AS BIGINT) AS n_sequences,
               CAST(sum(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        ::UBIGINT::BIGINT % {FP_TERM_MOD}) AS BIGINT)
                 AS manifest_fp
        FROM binned
        GROUP BY split, shard
        ORDER BY split, shard
    """,
}
