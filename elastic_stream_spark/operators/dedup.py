"""Deduplication operators over the ``documents`` table (north-star).

Four families, each designed for 100 TB (no cross-join of the corpus, no
driver collects):

- **exact**         hash-groupBy on a content fingerprint → one shuffle.
- **n-gram Jaccard** inverted-index self-join on shingles: pairs are only
  generated for docs *sharing* a shingle (candidate set ∝ co-occurrence,
  not n²), then exact Jaccard verify with integer arithmetic.
- **MinHash + LSH**  shingle → k minhashes → band buckets → self-join on
  (band, bucket) — candidate pairs ∝ colliding docs; exact-Jaccard verify
  keeps precision at 1.  At 100 TB this is the standard path: the band
  join is an equi-join Catalyst shuffles on the bucket key, skew-safe via
  AQE.
- **SimHash**        64-bit signature; near-dups = Hamming distance ≤ k,
  banded into 4×16-bit chunks for bucketing (any ≤3-bit-different pair
  collides on ≥1 chunk — pigeonhole).
- **embedding**      cosine-threshold pairs via block-join on an LSH-free
  exact path at fixture scale; the 100 TB path for TIGHT thresholds
  (cosine ≳ 0.8, the realistic near-dup setting) is
  `similarity.ann_lsh_candidates` → `lsh_verified_pairs` — at this
  fixture's loose 0.45 threshold the dup/background angles are too close
  for any hyperplane LSH to separate (see similarity.py docstring), so
  the exact path is also the honest one here.

Thresholds are calibrated to the fixture corpus: planted near-dup pairs
sit at Jaccard ≥ 0.9 with the background below 0.5 (measured at sf0.01),
so 0.8 splits them with margin; embedding cosine background tops out at
~0.51, so the near-dup demo threshold is 0.45.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from elastic_stream_spark.functions.materialize import materialize
from elastic_stream_spark.functions.textfns import bow_fingerprint, shingles
from elastic_stream_spark.functions.vectorfns import cosine_similarity
from elastic_stream_spark.sources.envelope import load_table, load_table_balanced

JACCARD_NUM, JACCARD_DEN = 4, 5  # threshold 0.8 as an exact ratio
SHINGLE_N = 3
SHINGLE_DF_CAP = 1000  # inverted-index ceiling: drop shingles hotter than this
MINHASH_K = 16  # 8 bands × 2 rows
LSH_BANDS, LSH_ROWS = 8, 2
EMB_THRESHOLD = 0.45  # fixture-calibrated (see module docstring)
SUBSTR_K = 30  # duplicated-span gram width (chars); spans ≥ K are detected
SUBSTR_MIN_DOCS = 2  # a gram must appear in ≥ this many distinct docs


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # balanced: the single-split fixture would serialize the shingle
    # explode + index joins onto one core
    return load_table_balanced(spark, sf_dir, "documents")


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingles; the inverted index.

    Materialized (eager persist — see functions/materialize.py): the
    shingle transform is an interpreted higher-order expression — ~2.4
    ms/doc of CPU, the single most expensive scalar stage in the dedup
    family — and every consumer reads this table 2-6×.  Without
    materialization each downstream shuffle recomputes the transform
    (and AQE's small-partition coalesce can serialize the recompute onto
    one core: measured 12.4 s/pass single-core vs 0.8 s
    materialized-parallel at sf0.1).  At 100 TB this is the standard
    persist-the-exploded-index step; the cache is sized ∝ corpus ×
    shingles, spill-backed, partitioned."""
    return materialize(
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(shingles("text", SHINGLE_N)).alias("shingle"))
    )


def _verify_jaccard(sh: DataFrame, candidates: DataFrame) -> DataFrame:
    """Exact-Jaccard ≥ 0.8 verification of ``candidates`` (doc_a < doc_b,
    distinct): each doc's shingle *set* is collected once (one shuffle
    over the cached shingle index, per-doc bounded state), candidate
    pairs join to the two set sides, and the intersection size is
    computed in-place with ``array_intersect`` — no shingle=shingle
    self-join anywhere in the plan.  Integer-ratio comparison
    (common·5 ≥ 4·union) avoids float threshold effects.

    r15 measured note: a candidate-doc SLICE of the set collection
    (semi-join the index to docs appearing in a pair before collecting)
    was built, shipped briefly, and REVERTED on a decisive three-way
    interleaved A/B — slicing re-evaluates the banded candidate subtree
    per consumer (minhash best 4.9 s vs 2.86 unsliced; neardup 6.11 vs
    3.13), and persisting the tiny candidate table first (matcand
    variant) still lost (5.92/5.38).  At true 100 TB the slice's
    ∝-candidates collection beats the ∝-corpus one — that flip is this
    one hunk plus a ``materialize(candidates)``; at bench scale the
    unsliced form won every round in both A/B orderings."""
    sets_ = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("s"))
    sa = sets_.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    sb = sets_.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    pairs = (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("common", F.size(F.array_intersect("s_a", "s_b")))
        .withColumn("na", F.size("s_a"))
        .withColumn("nb", F.size("s_b"))
    )
    union_sz = F.col("na") + F.col("nb") - F.col("common")
    return (
        pairs.where(F.col("common") * JACCARD_DEN >= JACCARD_NUM * union_sz)
        .select(
            "doc_a",
            "doc_b",
            # determinism: UNROUNDED exact-integer division — bit-identical
            # IEEE doubles in Spark and DuckDB; round() on an int/int ratio
            # can land exactly on a decimal tie where the engines' rounding
            # modes disagree (see operators/timeseries.py determinism note)
            (F.col("common") / union_sz).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint (bag-of-words md5): duplicate
    groups with the kept representative (min doc_id) and group size."""
    docs = _docs(spark, sf_dir).withColumn("fp", bow_fingerprint("text"))
    return (
        docs.groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
        .select("fp", "keep_doc_id", "n_docs")
        .orderBy("keep_doc_id")
    )


INCREMENTAL_MOD = 4  # docs with doc_id % 4 == 3 play the incoming batch


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: flag documents of an incoming batch
    whose content fingerprint already exists in the standing corpus, with
    the corpus keeper they collide with.  The fixture splits ``documents``
    deterministically (``doc_id % 4 == 3`` = incoming, rest = corpus); in
    production the two sides are yesterday's corpus and today's crawl.

    100 TB shape: the corpus side aggregates to one row per fingerprint
    (min doc_id keeper — map-side combinable), then the batch joins it
    fp-partitioned — an equi-join between two hash-keyed children, never a
    broadcast of the corpus.  This is the O(new + corpus) alternative to
    re-running full-corpus dedup on every ingest."""
    docs = _docs(spark, sf_dir).withColumn("fp", bow_fingerprint("text"))
    incoming = docs.where(F.col("doc_id") % INCREMENTAL_MOD == INCREMENTAL_MOD - 1)
    corpus = (
        docs.where(F.col("doc_id") % INCREMENTAL_MOD != INCREMENTAL_MOD - 1)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("corpus_keep_doc_id"))
    )
    return (
        incoming.join(corpus, "fp")
        .select(
            F.col("doc_id").alias("incoming_doc_id"),
            "corpus_keep_doc_id",
            "fp",
        )
        .orderBy("incoming_doc_id")
    )


def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT deduplication (SoftDeDup, He et al. 2024): instead of
    DROPPING duplicate documents, every document is reweighted by the
    inverse of its exact-dup group size, so each distinct content
    contributes exactly one unit of training mass while the sampler
    keeps seeing every copy — the reweighting alternative pipelines use
    when hard dedup would discard rare-but-replicated content.

    Output: one row per document with its dup-group size, its sampling
    weight 1/n, and its effective token contribution n_tokens/n.

    100 TB shape: ONE map-side-combinable groupBy on the content
    fingerprint (O(1) reducer state) and ONE fp-partitioned equi-join
    back — the exact plan of ``dedup_exact`` plus a join that reuses
    the same hash partitioning, so AQE plans a single exchange per
    side.  Determinism: group sizes are integers; ``weight`` and
    ``eff_tokens`` are single IEEE divisions of exact integers —
    bit-identical across engines, and no float is ever aggregated
    (per-row only), so no addition-order hazard exists."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens"),
        bow_fingerprint("text").alias("fp"),
    )
    groups = docs.groupBy("fp").agg(F.count("*").alias("n_group"))
    return (
        docs.join(groups, "fp")
        .select(
            "doc_id",
            "source",
            F.col("n_group").cast("bigint").alias("n_group"),
            (F.lit(1) / F.col("n_group")).alias("weight"),
            (F.col("n_tokens") / F.col("n_group")).alias("eff_tokens"),
        )
        .orderBy("doc_id")
    )


CONTAIN_NUM, CONTAIN_DEN = 9, 10  # containment threshold 0.9, exact ratio


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: pairs where the SMALLER document's
    shingle set is ≥ 0.9 inside the larger's — ``|A∩B| / min(|A|,|B|)``.
    This is the metric that catches a short document quoted wholesale
    inside a long one, which symmetric Jaccard structurally misses (a
    200-shingle doc inside a 10,000-shingle doc has containment 1.0 but
    Jaccard ≈ 0.02 — LSH on minhash never even proposes the pair);
    ``tests/test_retrieval.py`` pins exactly that case on a crafted
    corpus.  Emits (inner_doc, outer_doc, containment) with inner = the
    smaller set (doc_id breaks size ties).

    Plan: identical shape to ``_ngram_pair_set`` (df-capped inverted
    index, sorted posting lists, pairs via double explode, ONE
    map-side-combinable common-count aggregation) with the integer
    containment threshold in place of Jaccard — per-key state O(cap),
    candidates ∝ co-occurrence, no self-join, no floats until the
    final display rounding."""
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    capped_df = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= SHINGLE_DF_CAP))
        .select("shingle")
    )
    posting = (
        sh.join(capped_df, "shingle", "left_semi")
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
    )
    pairs = posting.select(
        F.posexplode("docs").alias("pos", "doc_a"), F.col("docs")
    ).select(
        "doc_a",
        F.explode(F.slice("docs", F.col("pos") + 2, F.size("docs"))).alias("doc_b"),
    )
    common = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("common"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    n_min = F.least(F.col("na"), F.col("nb"))
    inner_first = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("doc_a") < F.col("doc_b"))
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("common") * CONTAIN_DEN >= CONTAIN_NUM * n_min)
        .select(
            F.when(inner_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
                "inner_doc"
            ),
            F.when(inner_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
                "outer_doc"
            ),
            (F.col("common") / n_min).alias("containment"),
        )
        .orderBy("inner_doc", "outer_doc")
    )


def neardup_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy incremental dedup: near-duplicate LOOKUP of an incoming
    batch against the standing corpus — the MinHash-LSH analogue of
    ``dedup_incremental`` (which only catches exact-fingerprint
    collisions).  Same fixture split (``doc_id % 4 == 3`` = incoming);
    emits every (batch doc, corpus doc) pair at word-3-gram Jaccard
    ≥ 0.8, verified exactly.

    Plan mirrors ``dedup_minhash_lsh`` (16 minhashes in ONE aggregation,
    8×2 banding as a projection) but the band equi-join is
    batch × corpus instead of a self-join — candidates ∝ band
    collisions against the NEW batch only, so a daily ingest pays
    O(batch + collisions), never O(corpus²).  Recall contract is the
    LSH gate's own: planted near-dups sit at j ≥ 0.9 where band recall
    is 1 - (1-j²)^8 > 0.999998, so the verified output equals the
    brute-force cross-pair oracle."""
    sh = _doc_shingles(spark, sf_dir)
    # batch × corpus candidates via SIDE-TAGGED posting lists (r16 —
    # the dedup_minhash_lsh shape adapted to a two-sided join): one
    # grouped pass collects each bucket's batch members and corpus
    # members separately (collect_list drops the NULLs the side filter
    # leaves), and the cross pairs come from an in-place double explode.
    # The band table becomes single-consumer, so its eager materialize
    # (persist + count job) and the batch⋈corpus band join disappear;
    # the pair count per bucket is identical to the join's.
    bands = _minhash_bands(sh)
    is_batch = F.col("doc_id") % INCREMENTAL_MOD == INCREMENTAL_MOD - 1
    posting = (
        bands.groupBy("band", "bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.when(is_batch, F.col("doc_id")))
            ).alias("batch_docs"),
            F.sort_array(
                F.collect_list(F.when(~is_batch, F.col("doc_id")))
            ).alias("corpus_docs"),
        )
        .where((F.size("batch_docs") > 0) & (F.size("corpus_docs") > 0))
    )
    candidates = (
        posting.select(
            F.explode("batch_docs").alias("doc_a"), F.col("corpus_docs")
        )
        .select("doc_a", F.explode("corpus_docs").alias("doc_b"))
        .distinct()
    )
    return (
        _verify_jaccard(sh, candidates)
        .select(
            F.col("doc_a").alias("batch_doc"),
            F.col("doc_b").alias("corpus_doc"),
            "jaccard",
        )
        .orderBy("batch_doc", "corpus_doc")
    )


def _minhash_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) LSH band table from a (doc_id, shingle)
    table — 16 minhashes in ONE aggregation, banding as a projection
    (the ``dedup_minhash_lsh`` signature pipeline)."""
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"m{i}")
            for i in range(MINHASH_K)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(
                    *[F.col(f"m{band * LSH_ROWS + r}") for r in range(LSH_ROWS)]
                ).alias("bucket"),
            )
            for band in range(LSH_BANDS)
        ]
    )
    return mh.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def lsh_index_build(spark: SparkSession, corpus_sh: DataFrame, index_dir: str) -> str:
    """Persist the corpus side of the near-dup lookup (the dedup
    analogue of ``similarity.ivf_pq_build``): the LSH band table
    (doc_id, band, bucket) written PARTITIONED BY band — a probe's band
    equi-join prunes to its band directories — plus the corpus shingle
    SETS (doc_id, sorted shingle array, size) for the exact-Jaccard
    verify, and a params JSON pinning (k, bands, rows, shingle_n) so a
    serving process can refuse an index built under different
    hyper-parameters.  At 100 TB these two tables ARE the standing
    dedup index a daily ingest probes: built once per corpus rev by
    this job, while each ingest computes signatures for ITS OWN batch
    only."""
    import json as _json
    import os as _os

    _minhash_bands(corpus_sh).write.mode("overwrite").partitionBy(
        "band"
    ).parquet(_os.path.join(index_dir, "bands"))
    (
        corpus_sh.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("shingle")).alias("s"))
        .withColumn("n", F.size("s"))
        .write.mode("overwrite")
        .parquet(_os.path.join(index_dir, "shingle_sets"))
    )
    params = {
        "version": 1,
        "minhash_k": MINHASH_K,
        "bands": LSH_BANDS,
        "rows": LSH_ROWS,
        "shingle_n": SHINGLE_N,
    }
    with open(_os.path.join(index_dir, "params.json"), "w") as f:
        _json.dump(params, f)
    return index_dir


_LSH_INDEX_CACHE: dict[tuple[str, str], str] = {}


def _corpus_lsh_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build-once/serve-many memo for the fixture's standing-corpus
    index (docs with ``doc_id % 4 != 3``), per (application, corpus)."""
    import os as _os
    import tempfile as _tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _LSH_INDEX_CACHE.get(key)
    if got is None or not _os.path.exists(_os.path.join(got, "params.json")):
        for stale in [k for k in _LSH_INDEX_CACHE if k[0] != key[0]]:
            del _LSH_INDEX_CACHE[stale]
        d = _tempfile.mkdtemp(prefix="esspark-lsh-")
        corpus_sh = _doc_shingles(spark, sf_dir).where(
            F.col("doc_id") % INCREMENTAL_MOD != INCREMENTAL_MOD - 1
        )
        lsh_index_build(spark, corpus_sh, d)
        _LSH_INDEX_CACHE[key] = got = d
    return got


def neardup_lookup_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING form of ``neardup_lookup``: probes the PERSISTED
    corpus index (bands parquet partitioned by band + shingle-set
    parquet; built once per session by ``lsh_index_build``) instead of
    re-hashing the standing corpus per ingest.  Only the incoming
    batch's signatures are computed inline — the per-ingest cost a
    production near-dup service pays — so serving work is
    O(batch + band collisions) against a corpus-sized index that is
    READ, never rebuilt.  Output and oracle are identical to
    ``neardup_lookup``."""
    import os as _os

    idx = _corpus_lsh_index_dir(spark, sf_dir)
    batch_sh = _doc_shingles(spark, sf_dir).where(
        F.col("doc_id") % INCREMENTAL_MOD == INCREMENTAL_MOD - 1
    )
    corpus_bands = spark.read.parquet(_os.path.join(idx, "bands")).select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").cast("int").alias("band"),
        "bucket",
    )
    batch_bands = _minhash_bands(batch_sh).select(
        F.col("doc_id").alias("doc_a"), "band", "bucket"
    )
    candidates = (
        batch_bands.join(corpus_bands, ["band", "bucket"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = batch_sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("shingle")).alias("s_a")
    ).select(F.col("doc_id").alias("doc_a"), "s_a", F.size("s_a").alias("na"))
    sb = spark.read.parquet(_os.path.join(idx, "shingle_sets")).select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("s_b"),
        F.col("n").alias("nb"),
    )
    pairs = (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("common", F.size(F.array_intersect("s_a", "s_b")))
    )
    union_sz = F.col("na") + F.col("nb") - F.col("common")
    return (
        pairs.where(F.col("common") * JACCARD_DEN >= JACCARD_NUM * union_sz)
        .select(
            F.col("doc_a").alias("batch_doc"),
            F.col("doc_b").alias("corpus_doc"),
            (F.col("common") / union_sz).alias("jaccard"),
        )
        .orderBy("batch_doc", "corpus_doc")
    )


def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): maximal character spans that appear in
    ≥ 2 *distinct* documents, detected via stride-1 ``SUBSTR_K``-char gram
    fingerprints and merged per-doc with a gaps-and-islands window.  This is
    the span-granular member of the dedup family — exact dedup drops whole
    documents, chunk_dedup drops fixed chunks; this finds the *duplicated
    region itself* (any shared span of length ≥ SUBSTR_K is covered by at
    least one shared aligned gram, so detection is exact for such spans).

    100 TB shape: the stride-1 explode is O(total corpus chars) rows — the
    same asymptotic work as the reference algorithm's suffix array — and the
    gram TEXT never leaves that map stage: each gram is folded to a 128-bit
    key (two independent ``xxhash64`` lanes) before the persist, so the
    index rows are four fixed-width integers (~32 B vs ~60 B with a 30-char
    string).  The duplicated-gram test and span merge are the
    bounded-working-set shape of ``_substring_spans`` (r9 final — see
    its docstring): a map-side-combinable ``groupBy(h1, h2)`` min/max dup
    verdict (hash aggregate, never a sort), a doc-clustering-preserving
    verdict join-back, and a ``SUBSTR_BUCKET``-wide in-row island fold so
    the per-doc merge shuffles interval rows instead of raw positions —
    no stage lands the whole index in one sorted shuffle wave
    (SCALE.extra.md records the measured history: string agg+self-join
    +1.46 → hashed one-window +1.10..+1.38 on RAM-backed spill → the
    disk-spill A/B/C that picked this shape, 196 s vs 212/537 at 160×).
    A 128-bit collision
    could only merge two gram groups (false span): P ≈ n²/2¹²⁹ — ~3e-13
    even at 10¹³ corpus grams.  The DuckDB oracle keeps grouping by the
    gram text itself (oracle clarity; identical output)."""
    grams = _substring_grams(spark, sf_dir)
    # the presentation sort lives HERE, not in _substring_spans:
    # substring_scrub_stats consumes the spans order-independently, and
    # the inner orderBy survived into its plan as a full range-partition
    # exchange + sort of the span table (r15 — removed)
    return _substring_spans(grams).orderBy("doc_id", "span_start")


def _substring_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, i, h1, h2) stride-1 ``SUBSTR_K``-char gram index with the
    gram folded to a 128-bit key in the same map stage (two ``xxhash64``
    lanes — the second seeded by a prepended literal), so only fixed-width
    integers are persisted and shuffled.

    Materialized: the stride-1 transform is an interpreted higher-order
    expression (see _doc_shingles for the measured recompute cost)."""
    docs = _docs(spark, sf_dir).where(F.length("text") >= SUBSTR_K)
    return materialize(
        docs.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, length(text) - {SUBSTR_K}),"
                    f" i -> substring(text, i + 1, {SUBSTR_K}))"
                )
            ).alias("i", "gram"),
        ).select(
            "doc_id",
            "i",
            F.xxhash64("gram").alias("h1"),
            F.xxhash64(F.lit("s2"), F.col("gram")).alias("h2"),
        )
    )


SUBSTR_BUCKET = 64  # island pre-fold width (positions per bucket)


def _substring_spans(grams: DataFrame) -> DataFrame:
    """Duplicated-span extraction over a (doc_id, i, h1, h2) index with a
    BOUNDED working set (r9 final shape after a measured three-way A/B/C
    at a 160× constant-density decade, one process each on disk-backed
    spill — SCALE.extra.md: this shape 196 s, the r7/r8 one-window shape
    212 s, the r8 solid/gappy two-pass shape 537 s):

    1. **dup verdicts via partial aggregation** — ``groupBy(h1, h2)``
       computing ``min/max(doc_id)`` (exactly the SUBSTR_MIN_DOCS = 2
       distinct-docs test).  Unlike a window, a hash aggregate combines
       map-side and never sorts: the shuffle carries one fixed-width row
       per distinct gram key per map partition, and the reducer state is
       O(1) per key.
    2. **verdicts join back** — the dup-key table is ∝ DISTINCT
       duplicated grams, which collapses with duplication density (at
       160× it is ~1/160 of the duplicated positions): Catalyst/AQE
       broadcasts it at realistic sizes, so the position table never
       re-shuffles and KEEPS the materialized index's doc clustering;
       past broadcast size the equi-join still hash-partitions without
       sorting either side.
    3. **bounded island fold** — duplicated positions collect into
       ``SUBSTR_BUCKET``-wide per-doc buckets (per-key aggregate state
       ≤ BUCKET ints — map-side combinable, never corpus-∝), and the
       maximal consecutive runs INSIDE each bucket come from one
       ``aggregate()`` higher-order fold over the sorted array — no
       second pass over the positions, no row_number window, and the
       downstream shuffle moves interval rows (∝ positions / BUCKET),
       not raw positions.  (The r8 solid/gappy formulation re-derived
       non-solid buckets by semi-joining ``hits`` against itself — a
       second full evaluation of steps 1-2 that the A/B isolated as
       the 2.7× overhead.)
    4. **interval-union merge** — one per-doc window over bucket
       intervals, abutting/overlapping intervals merge via the
       running-max rule.

    Exactness: every duplicated position lands in exactly one bucket;
    the in-bucket fold emits exactly the maximal consecutive runs of its
    sorted positions, and the adjacency-merge (start > prev_end + 1
    opens an island) reconstructs exactly the maximal
    consecutive-position islands the one-window formulation produced
    (asserted cross-variant in tools/span_ab.py).  A 128-bit collision
    could only merge two gram groups (false span): P ≈ n²/2¹²⁹ (module
    docstring)."""
    assert SUBSTR_MIN_DOCS == 2, "min/max dup test encodes exactly 2"
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
        F.sort_array(F.collect_list("i")).alias("pos")
    )

    def seg(s, e):
        return F.struct(s.cast("long").alias("s"), e.cast("long").alias("e"))

    islands = F.aggregate(
        F.col("pos"),
        F.array().cast("array<struct<s:bigint,e:bigint>>"),
        lambda acc, x: F.when(F.size(acc) == 0, F.array(seg(x, x))).otherwise(
            F.when(
                x > F.element_at(acc, -1)["e"] + 1,
                F.concat(acc, F.array(seg(x, x))),
            ).otherwise(
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(seg(F.element_at(acc, -1)["s"], x)),
                )
            )
        ),
    )
    ivs = folded.select("doc_id", F.explode(islands).alias("iv")).select(
        "doc_id",
        F.col("iv.s").alias("iv_start"),
        F.col("iv.e").alias("iv_end"),
    )
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
    )


def substring_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION half of substring dedup (Lee et al. 2022 *remove* the
    duplicated spans, not the documents): per source, how many characters
    substring-scrubbing would delete and what fraction of the corpus that
    is — the before/after accounting a curation run reports.

    Adjacent duplicated-gram islands can overlap in CHARACTER space
    (island ends at ``i₁+K`` while the next starts at ``i₂ < i₁+K``), so
    naive ``sum(span_len)`` double-counts; the spans first go through a
    classic interval-union merge (running ``max(span_end)`` over the
    doc's spans ordered by start; a span opens a new region iff it
    starts past everything seen).

    100 TB shape: the interval merge runs on the SPANS table (∝
    duplicated regions, ≪ corpus) with two doc-partitioned windows —
    per-key state is one running max / counter; the corpus join is a
    doc-keyed equi-join; the per-source rollup is map-side combinable.
    Nothing here revisits the gram index beyond ``dedup_substring``
    itself."""
    # unordered spans on purpose (r15): the interval merge orders within
    # its own doc-partitioned window, so dedup_substring's presentation
    # orderBy would only add a range-partition exchange + sort here
    spans = _substring_spans(_substring_grams(spark, sf_dir))
    w = Window.partitionBy("doc_id").orderBy("span_start")
    prev_end = F.max("span_end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = spans.withColumn(
        "new_iv",
        F.when(F.col("span_start") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    )
    grouped = opens.withColumn(
        "iv", F.sum("new_iv").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = grouped.groupBy("doc_id", "iv").agg(
        (F.max("span_end") - F.min("span_start")).alias("dup_chars")
    )
    per_doc = merged.groupBy("doc_id").agg(F.sum("dup_chars").alias("chars_dup"))
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    return (
        docs.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("chars_dup").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_affected"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.coalesce(F.sum("chars_dup"), F.lit(0))
            .cast("bigint")
            .alias("chars_duplicated"),
            (
                F.coalesce(F.sum("chars_dup"), F.lit(0)) / F.sum("n_chars")
            ).alias("frac_duplicated"),
        )
        .orderBy("source")
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL near-dup pairs at word-3-gram Jaccard ≥ 0.8 via the inverted
    index, computed with map-side-combinable aggregation.

    Plan shape (chosen over per-pair ``array_intersect``, which we
    measured ~45× slower on the full co-occurrence pair set): capped
    index self-join → ``groupBy(pair).count()`` = common-shingle counts
    (one shuffle, partial aggregation) → join per-doc sizes → integer
    threshold.  The per-pair set-intersection verify is reserved for the
    *sparse* candidate sets LSH produces (``dedup_minhash_lsh``).

    Scale safety: shingles with document frequency > ``SHINGLE_DF_CAP``
    are excluded from the index (both sides), so a stopword-grade 3-gram
    shared by half the corpus cannot produce a quadratic pair set.  The
    DuckDB oracle applies the identical cap, so the declared semantics —
    Jaccard over the frequency-capped index — are exact at every scale;
    at fixture scale (max df ≈ 25) the cap is provably inert and the
    result equals uncapped Jaccard.

    Calls the UNCACHED pair-set builder on purpose: this query IS the
    construction operator, so its bench/scale timings must measure the
    build, not a memo hit — the pipeline consumers (clusters, keep-list,
    verdict) read the session materialization instead."""
    return _ngram_pair_set(spark, sf_dir).orderBy("doc_a", "doc_b")


# Verified pair set memo, keyed by (applicationId, corpus dir): the
# downstream pipeline queries (dedup_clusters, pipeline_keep_list,
# pipeline_curation_verdict) all consume this edge list; a production
# pipeline materializes it once and every stage reads the materialization
# — here the same thing, as a session-lifetime localCheckpoint of the
# (small, verified) pair table.  The applicationId component makes the
# session binding explicit: a checkpoint belongs to the SparkContext that
# created it, so a stopped-and-recreated session can never be served a
# dead handle.  Corpus immutability within one application still holds by
# construction (testdata is read-only; tests write one corpus per tmp
# workdir).
_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}


def evict_session_memos(blocking: bool = False) -> int:
    """Drop the session pair-set memo AND release its localCheckpoint
    blocks immediately (public probe/bench hook — r10 ADVICE: tools
    reaching into ``_PAIR_CACHE`` only dropped dict references, leaving
    checkpoint blocks pinned until GC + ContextCleaner).  Returns how
    many cache entries released a checkpoint.  Timed probes pass
    blocking=True so removal never overlaps the next measured run."""
    from elastic_stream_spark.functions.materialize import (
        evict_checkpoint_caches,
    )

    return evict_checkpoint_caches(_PAIR_CACHE, blocking=blocking)


def ngram_pair_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PAIR_CACHE.get(key)
    if cached is not None:
        return cached
    # evict entries from other (stopped) applications: their DataFrame
    # handles are dead and would otherwise pin memory process-lifetime
    for stale in [k for k in _PAIR_CACHE if k[0] != key[0]]:
        del _PAIR_CACHE[stale]
    out = _ngram_pair_set(spark, sf_dir).localCheckpoint(eager=True)
    _PAIR_CACHE[key] = out
    return out


def _ngram_pair_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered verified near-dup pair set (doc_a < doc_b, jaccard) —
    the edge list consumed by ``dedup_ngram_jaccard`` (sorted output) and
    ``pipeline.dedup_clusters`` (connected components).

    Plan (over the materialized index, NO self-join): df pre-filter
    (count per shingle, keep 2 ≤ df ≤ SHINGLE_DF_CAP, left-semi join
    back) → groupBy shingle → sorted posting list → pair combinations
    generated in-place by a double explode (work bounded by df²/2 per
    shingle, cap-bounded globally) → one map-side-combinable
    groupBy(pair).count() → per-doc size join + integer threshold.

    The df filter runs BEFORE collect_list on purpose: a stopword-grade
    shingle must never materialize its full posting array in one
    aggregation task only to be discarded by a post-hoc size() filter —
    the count-only pre-aggregation is map-side combinable and bounds
    every collected array at SHINGLE_DF_CAP elements, so per-key state
    stays O(cap) at any corpus size.  Replaces the previous index
    self-join, which shuffled the index twice and re-derived the
    (expensive, interpreted) shingle transform on both sides."""
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    capped_df = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= SHINGLE_DF_CAP))
        .select("shingle")
    )
    posting = (
        sh.join(capped_df, "shingle", "left_semi")
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
    )
    # (doc_a, doc_b) with doc_a < doc_b: posting lists are sorted, so
    # pairing each element with its strict successors is canonical
    pairs = posting.select(
        F.posexplode("docs").alias("pos", "doc_a"), F.col("docs")
    ).select(
        "doc_a",
        F.explode(F.slice("docs", F.col("pos") + 2, F.size("docs"))).alias("doc_b"),
    )
    common = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("common"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    union_sz = F.col("na") + F.col("nb") - F.col("common")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("common") * JACCARD_DEN >= JACCARD_NUM * union_sz)
        .select(
            "doc_a",
            "doc_b",
            (F.col("common") / union_sz).alias("jaccard"),
        )
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(8 bands × 2 rows) candidates, exact-Jaccard
    verified at ≥ 0.8.  With the fixture's planted dups at j ≥ 0.9, band
    recall is 1 - (1-j²)^8 > 0.999998 — the verified output equals the
    brute-force oracle; the driver's hash-check asserts exactly that.

    All K minhashes come from ONE aggregation over the shingle table
    (per-seed ``min(xxhash64(seed, shingle))`` — codegen'd 64-bit hashing,
    no K-way row explosion, no string hashing), then bands are a per-doc
    projection: the only data-sized shuffles are the shingle groupBy and
    the band equi-join.
    """
    sh = _doc_shingles(spark, sf_dir)
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"m{i}")
            for i in range(MINHASH_K)
        ]
    )
    # band bucket = hash of the band's row minhashes (projection, no agg)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(
                    *[F.col(f"m{band * LSH_ROWS + r}") for r in range(LSH_ROWS)]
                ).alias("bucket"),
            )
            for band in range(LSH_BANDS)
        ]
    )
    # candidate pairs via POSTING LISTS, not a band self-join (r16 —
    # the dedup_simhash/_ngram_pair_set shape): each (band, bucket)
    # collects its sorted member list and pairs come from an in-place
    # double explode over strict successors (doc_a < doc_b canonical).
    # The band table becomes SINGLE-consumer, so the eager materialize
    # (persist + count job) and the self-join's second scan + join
    # machinery disappear — the same off-stage driver rounds the
    # simhash rewrite removed (guide §2.4/§5).  Per-bucket state is
    # O(bucket size); the join generated the identical k²/2 pairs per
    # bucket.
    bands = mh.select("doc_id", F.explode(band_structs).alias("bb")).select(
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        "doc_id",
    )
    posting = (
        bands.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .where(F.size("docs") >= 2)
    )
    candidates = (
        posting.select(F.posexplode("docs").alias("pos", "doc_a"), F.col("docs"))
        .select(
            "doc_a",
            F.explode(F.slice("docs", F.col("pos") + 2, F.size("docs"))).alias(
                "doc_b"
            ),
        )
        .distinct()
    )
    return _verify_jaccard(sh, candidates)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 60-bit signature from token md5 bits
    (15 hex chars — the widest md5 prefix that fits a BIGINT via conv),
    banded into 4×15-bit chunks (pigeonhole: Hamming ≤ 3 ⇒ ≥1 identical
    chunk), verified at Hamming ≤ 3.

    Hash-checked against a full bit-exact DuckDB oracle (long-form
    per-bit sums, same 0x-prefix md5 parse, same 4×15 banding — see
    ORACLES["dedup_simhash"]); a pure-Python reference implementation in
    tests cross-checks the signature math independently.
    """
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("tok")
    )
    # 64 bits from the first 16 hex chars of md5(tok); bit j of the
    # signature = sign of Σ_tokens (bit_j(h) ? +1 : -1).
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("decimal(20,0)").cast("long")
    toks = toks.withColumn("h", h)
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(60)
    ]
    sums = toks.groupBy("doc_id").agg(*bit_cols)
    sig = sums.select(
        "doc_id",
        sum(
            [
                F.when(
                    F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
                ).otherwise(F.lit(0).cast("long"))
                for j in range(60)
            ]
        ).cast("long").alias("sig"),
    )
    # candidate pairs via POSTING LISTS, not a self-join (r16 — the
    # _ngram_pair_set shape): each (chunk, val) bucket collects its
    # (doc_id, sig) members sorted, and pairs come from an in-place
    # double explode over strict successors — doc_a < doc_b is canonical
    # because struct ordering sorts on doc_id first.  This makes the
    # signature table SINGLE-consumer, so the eager materialize (an
    # extra persist + count job) and the band self-join (two cached
    # scans + join machinery + their AQE rounds) disappear; the r15
    # profile put ~70% of this query's wall in exactly that off-stage
    # driver work (guide §2.4 remove shuffles / §5 cache only when it
    # pays).  Hamming is computed per exploded pair BEFORE the distinct
    # so the dedup exchange carries only (doc_a, doc_b, hamming) rows
    # that already passed the ≤3 filter.  Per-bucket state is O(bucket
    # size) — the same concentration the old join's shuffle had, minus
    # the duplicated signature payload per candidate row.
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("sig"), c * 15)
                .bitwiseAND(F.lit((1 << 15) - 1))
                .alias("val"),
            )
            for c in range(4)
        ]
    )
    chunks = sig.select(
        "doc_id", "sig", F.explode(chunk_structs).alias("ck")
    ).select(
        F.col("ck.chunk").alias("chunk"),
        F.col("ck.val").alias("val"),
        F.struct("doc_id", "sig").alias("ds"),
    )
    posting = (
        chunks.groupBy("chunk", "val")
        .agg(F.sort_array(F.collect_list("ds")).alias("docs"))
        .where(F.size("docs") >= 2)
    )
    pairs = posting.select(
        F.posexplode("docs").alias("pos", "a"), F.col("docs")
    ).select(
        "a",
        F.explode(F.slice("docs", F.col("pos") + 2, F.size("docs"))).alias("b"),
    )
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


DEDUP_EMBEDDING_MAX_CORPUS = 200_000  # all-pairs guard: ~2e10 dots ceiling


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ 0.45 (fixture-calibrated) —
    EXACT all-pairs path, deliberately NOT in the gate registry (its plan
    is quadratic; ``similarity.dedup_embedding_lsh`` is the registered
    100 TB path).  Kept as the exact-semantics baseline for loose
    thresholds where hyperplane LSH cannot separate dup from background
    (see similarity.py docstring), behind an explicit corpus-size guard
    so a caller cannot launch the O(n²) join on a real corpus."""
    from elastic_stream_spark.functions.vectorfns import dot, unit

    n = load_table(spark, sf_dir, "embeddings").count()
    if n > DEDUP_EMBEDDING_MAX_CORPUS:
        raise ValueError(
            f"dedup_embedding is all-pairs (O(n²)); corpus has {n} vectors "
            f"(> {DEDUP_EMBEDDING_MAX_CORPUS}). Use dedup_embedding_lsh."
        )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", unit(F.col("embedding")).alias("u")
    )
    # normalize once per row; one dot per pair.  Streamed side
    # repartitioned for parallelism (tiny parquet = 1 input partition),
    # build side broadcast.  Width follows the session's parallelism
    # (r15 — was a hard-coded 32 tuned to this host's core count).
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("u").alias("ua")).repartition(
        spark.sparkContext.defaultParallelism
    )
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("u").alias("ub"))
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a", "vec_b", F.round(dot(F.col("ua"), F.col("ub")), 6).alias("cosine")
        )
        .where(F.col("cosine") >= EMB_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: the verified near-dup pair set
    (``ngram_pair_set`` — shingle inverted index, exact Jaccard ≥ 0.8)
    rolled up to (source_a ≤ source_b) pair counts — the table that
    tells a crawler-ops team WHICH domains mirror each other, and the
    decision input for ``corpus_split_by_source`` (group-aware splitting
    only guards WITHIN-source dup pairs; this matrix is exactly the
    cross-source leakage it cannot guard).

    Plan: the pair set is tiny relative to the corpus (candidates ∝
    shingle co-occurrence), so BOTH doc_id→source enrichments broadcast
    the pair side against the column-pruned (doc_id, source) scan —
    the corpus never shuffles; the rollup is |source-pairs| rows."""
    pairs = ngram_pair_set(spark, sf_dir).select("doc_a", "doc_b")
    src = _docs(spark, sf_dir).select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    t1 = sa.join(F.broadcast(pairs), "doc_a")
    t2 = sb.join(F.broadcast(t1), "doc_b")
    return (
        t2.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


def lsh_band_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-structure audit: per band, the bucket count, colliding
    buckets (size ≥ 2), the largest bucket, and the implied candidate
    pairs Σ k·(k-1)/2 — the table read when TUNING bands × rows (too
    few candidates → recall risk; a mega-bucket → a skewed self-join
    key).  Audits the same 16-minhash / 8-band × 2-row geometry as
    ``dedup_minhash_lsh``; the audit's hash family is md5-derived
    (engine-portable → the gate hash-checks the full band structure
    end-to-end) where the served index uses xxhash64 (cheaper JVM
    codegen) — same collision statistics, different family.

    Plan: ONE aggregation computes all 16 minhashes (no K-way row
    explosion), bands are a per-doc projection + explode, and the audit
    is two map-side-combinable groupBys — strictly cheaper than the
    index build it audits (no self-join)."""
    sh = _doc_shingles(spark, sf_dir)
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))), 1, 15
                    ),
                    16,
                    10,
                )
                .cast("decimal(20,0)")
                .cast("long")
            ).alias(f"m{i}")
            for i in range(MINHASH_K)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).cast("bigint").alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{band * LSH_ROWS + r}").cast("string")
                            for r in range(LSH_ROWS)
                        ],
                    )
                ).alias("bucket"),
            )
            for band in range(LSH_BANDS)
        ]
    )
    buckets = (
        mh.select(F.explode(band_structs).alias("bb"))
        .select(F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("k"))
    )
    return (
        buckets.groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum(F.when(F.col("k") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_colliding_buckets"),
            F.max("k").cast("bigint").alias("max_bucket_size"),
            F.sum(F.expr("k * (k - 1) div 2")).cast("bigint").alias("candidate_pairs"),
        )
        .orderBy("band")
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_incremental": dedup_incremental,
    "dedup_soft_weights": dedup_soft_weights,
    "neardup_lookup": neardup_lookup,
    "neardup_lookup_served": neardup_lookup_served,
    "dedup_containment": dedup_containment,
    "dedup_substring": dedup_substring,
    "substring_scrub_stats": substring_scrub_stats,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "cross_source_dup_matrix": cross_source_dup_matrix,
    "lsh_band_audit": lsh_band_audit,
}

# Shared CTE chain for the substring family: stride-1 char grams →
# duplicated grams (≥ SUBSTR_MIN_DOCS distinct docs) → per-doc hit
# positions → gaps-and-islands run ids.  (The oracle groups by the gram
# TEXT where the Spark plan shuffles a 128-bit hash of it — oracle
# clarity; identical output.)
_SUBSTR_RUNS_SQL = f"""
  pos AS (
          SELECT doc_id, text,
                 unnest(generate_series(0, length(text) - {SUBSTR_K})) AS i
          FROM documents WHERE length(text) >= {SUBSTR_K}
        ), g AS (
          SELECT doc_id, i, substring(text, i + 1, {SUBSTR_K}) AS gram FROM pos
        ), dup AS (
          SELECT gram FROM g
          GROUP BY gram HAVING count(DISTINCT doc_id) >= {SUBSTR_MIN_DOCS}
        ), hits AS (
          SELECT doc_id, i FROM g JOIN dup USING (gram)
        ), runs AS (
          SELECT doc_id, i,
                 i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
          FROM hits
        )
"""

_SHINGLES_SQL = f"""
  toks AS (
    SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
  ), sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(t) - {SHINGLE_N - 1}),
             i -> array_to_string(t[i:i+{SHINGLE_N - 1}], ' ')))) AS shingle
    FROM toks WHERE len(t) >= {SHINGLE_N}
  ), sizes AS (
    SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
  ), pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
  ), verified AS (
    SELECT doc_a, doc_b,
           common * 1.0 / (sa.n_shingles + sb.n_shingles - common) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE common * {JACCARD_DEN} >= {JACCARD_NUM} * (sa.n_shingles + sb.n_shingles - common)
  )
"""

_JACCARD_ORACLE = f"""
    WITH {_SHINGLES_SQL}
    SELECT doc_a, doc_b, jaccard FROM verified ORDER BY doc_a, doc_b
"""

# ngram variant: identical except the pair space is generated from the
# frequency-capped index (mirrors SHINGLE_DF_CAP — see dedup_ngram_jaccard).
# Exposed as a CTE fragment (ends at ``vpairs(doc_a, doc_b, jaccard)``) so
# downstream oracles (pipeline.py connected components) can build on the
# same verified pair set.
CAPPED_PAIRS_SQL = f"""
    toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(t) - {SHINGLE_N - 1}),
               i -> array_to_string(t[i:i+{SHINGLE_N - 1}], ' ')))) AS shingle
      FROM toks WHERE len(t) >= {SHINGLE_N}
    ), sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
    ), rare AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {SHINGLE_DF_CAP}
    ), idx AS (
      SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)
    ), cpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ), vpairs AS (
      SELECT doc_a, doc_b,
             common * 1.0 / (sa.n_shingles + sb.n_shingles - common) AS jaccard
      FROM cpairs
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE common * {JACCARD_DEN} >= {JACCARD_NUM} * (sa.n_shingles + sb.n_shingles - common)
    )
"""

_CAPPED_JACCARD_ORACLE = f"""
    WITH {CAPPED_PAIRS_SQL}
    SELECT doc_a, doc_b, jaccard FROM vpairs ORDER BY doc_a, doc_b
"""

ORACLES = {
    "dedup_exact": """
        WITH fp AS (
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(
                       string_split(lower(text), ' '))), ' ')) AS fp
          FROM documents
        )
        SELECT fp, min(doc_id) AS keep_doc_id, count(*) AS n_docs
        FROM fp GROUP BY fp HAVING count(*) > 1
        ORDER BY keep_doc_id
    """,
    "dedup_incremental": f"""
        WITH fp AS (
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(
                       string_split(lower(text), ' '))), ' ')) AS fp
          FROM documents
        ), corpus AS (
          SELECT fp, min(doc_id) AS corpus_keep_doc_id
          FROM fp WHERE doc_id % {INCREMENTAL_MOD} != {INCREMENTAL_MOD - 1}
          GROUP BY fp
        )
        SELECT i.doc_id AS incoming_doc_id, c.corpus_keep_doc_id, i.fp
        FROM fp i JOIN corpus c USING (fp)
        WHERE i.doc_id % {INCREMENTAL_MOD} = {INCREMENTAL_MOD - 1}
        ORDER BY incoming_doc_id
    """,
    "dedup_soft_weights": """
        WITH fp AS (
          SELECT doc_id, source,
                 len(string_split(lower(text), ' ')) AS n_tokens,
                 md5(array_to_string(list_sort(list_distinct(
                       string_split(lower(text), ' '))), ' ')) AS fp
          FROM documents
        ), g AS (
          SELECT fp, count(*) AS n_group FROM fp GROUP BY fp
        )
        SELECT f.doc_id, f.source,
               CAST(g.n_group AS BIGINT) AS n_group,
               1 / g.n_group AS weight,
               f.n_tokens / g.n_group AS eff_tokens
        FROM fp f JOIN g USING (fp)
        ORDER BY f.doc_id
    """,
    "dedup_substring": f"""
        WITH {_SUBSTR_RUNS_SQL}
        SELECT doc_id,
               CAST(min(i) AS BIGINT) AS span_start,
               CAST(max(i) + {SUBSTR_K} AS BIGINT) AS span_end,
               CAST(max(i) + {SUBSTR_K} - min(i) AS BIGINT) AS span_len
        FROM runs GROUP BY doc_id, grp
        ORDER BY doc_id, span_start
    """,
    "substring_scrub_stats": f"""
        WITH {_SUBSTR_RUNS_SQL}, spans AS (
          SELECT doc_id, min(i) AS span_start,
                 max(i) + {SUBSTR_K} AS span_end
          FROM runs GROUP BY doc_id, grp
        ), opens AS (
          SELECT doc_id, span_start, span_end,
                 CASE WHEN span_start > coalesce(max(span_end) OVER (
                        PARTITION BY doc_id ORDER BY span_start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                      THEN 1 ELSE 0 END AS new_iv
          FROM spans
        ), ivg AS (
          SELECT doc_id, span_start, span_end,
                 sum(new_iv) OVER (PARTITION BY doc_id ORDER BY span_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iv
          FROM opens
        ), merged AS (
          SELECT doc_id, iv, max(span_end) - min(span_start) AS dup_chars
          FROM ivg GROUP BY doc_id, iv
        ), per_doc AS (
          SELECT doc_id, sum(dup_chars) AS chars_dup FROM merged GROUP BY doc_id
        )
        SELECT d.source, count(*) AS n_docs,
               CAST(sum(CASE WHEN p.chars_dup IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_docs_affected,
               CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
               CAST(coalesce(sum(p.chars_dup), 0) AS BIGINT) AS chars_duplicated,
               coalesce(sum(p.chars_dup), 0) * 1.0 / sum(d.n_chars)
                 AS frac_duplicated
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        GROUP BY d.source ORDER BY d.source
    """,
    "dedup_ngram_jaccard": _CAPPED_JACCARD_ORACLE,
    # LSH-verified output provably equals the brute-force pair set on this
    # corpus (recall argument in the docstring) — same oracle.
    "dedup_minhash_lsh": _JACCARD_ORACLE,
    "dedup_containment": f"""
        WITH toks AS (
          SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        ), sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - {SHINGLE_N - 1}),
                   i -> array_to_string(t[i:i+{SHINGLE_N - 1}], ' ')))) AS shingle
          FROM toks WHERE len(t) >= {SHINGLE_N}
        ), sizes AS (
          SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
        ), rare AS (
          SELECT shingle FROM sh GROUP BY shingle
          HAVING count(*) BETWEEN 2 AND {SHINGLE_DF_CAP}
        ), idx AS (
          SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)
        ), cpairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY doc_a, doc_b
        )
        SELECT CASE WHEN sa.n_shingles < sb.n_shingles
                      OR (sa.n_shingles = sb.n_shingles AND doc_a < doc_b)
                    THEN doc_a ELSE doc_b END AS inner_doc,
               CASE WHEN sa.n_shingles < sb.n_shingles
                      OR (sa.n_shingles = sb.n_shingles AND doc_a < doc_b)
                    THEN doc_b ELSE doc_a END AS outer_doc,
               common * 1.0 / least(sa.n_shingles, sb.n_shingles)
                 AS containment
        FROM cpairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE common * {CONTAIN_DEN}
              >= {CONTAIN_NUM} * least(sa.n_shingles, sb.n_shingles)
        ORDER BY inner_doc, outer_doc
    """,
    # brute-force cross-pair (batch × corpus) Jaccard — the LSH lookup
    # equals it under the band-recall contract (see neardup_lookup)
    "neardup_lookup": f"""
        WITH toks AS (
          SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        ), sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - {SHINGLE_N - 1}),
                   i -> array_to_string(t[i:i+{SHINGLE_N - 1}], ' ')))) AS shingle
          FROM toks WHERE len(t) >= {SHINGLE_N}
        ), sizes AS (
          SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
        ), pairs AS (
          SELECT a.doc_id AS batch_doc, b.doc_id AS corpus_doc,
                 count(*) AS common
          FROM sh a JOIN sh b ON a.shingle = b.shingle
          WHERE a.doc_id % {INCREMENTAL_MOD} = {INCREMENTAL_MOD - 1}
            AND b.doc_id % {INCREMENTAL_MOD} != {INCREMENTAL_MOD - 1}
          GROUP BY batch_doc, corpus_doc
        )
        SELECT batch_doc, corpus_doc,
               common * 1.0 /
                     (sa.n_shingles + sb.n_shingles - common) AS jaccard
        FROM pairs
        JOIN sizes sa ON batch_doc = sa.doc_id
        JOIN sizes sb ON corpus_doc = sb.doc_id
        WHERE common * {JACCARD_DEN}
              >= {JACCARD_NUM} * (sa.n_shingles + sb.n_shingles - common)
        ORDER BY batch_doc, corpus_doc
    """,
    # full bit-exact oracle (long-form bit sums; DuckDB parses the md5
    # prefix via '0x'-cast and provides xor/bit_count/shifts) — upgraded
    # from a rows-only check once the bit ops proved expressible
    "dedup_simhash": """
        WITH toks AS (
          SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
          FROM documents
        ), h AS (
          SELECT doc_id,
                 ('0x' || substring(md5(tok), 1, 15))::UBIGINT::BIGINT AS h
          FROM toks
        ), bits AS (
          SELECT doc_id, j.j,
                 sum(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
          FROM h, (SELECT unnest(generate_series(0, 59)) AS j) j
          GROUP BY doc_id, j.j
        ), sigs AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)
                      AS BIGINT) AS sig
          FROM bits GROUP BY doc_id
        ), chunks AS (
          SELECT doc_id, sig, c.c AS chunk, (sig >> (c.c * 15)) & 32767 AS val
          FROM sigs, (SELECT unnest(generate_series(0, 3)) AS c) c
        ), cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.sig AS sig_a, b.sig AS sig_b
          FROM chunks a
          JOIN chunks b
            ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(xor(sig_a, sig_b)) <= 3
        ORDER BY doc_a, doc_b
    """,
}

# The serving form reads the persisted index but computes the identical
# result — it shares the inline form's brute-force cross-pair oracle.
ORACLES["neardup_lookup_served"] = ORACLES["neardup_lookup"]

ORACLES["cross_source_dup_matrix"] = f"""
    WITH {CAPPED_PAIRS_SQL},
    src AS (
      SELECT doc_id, source FROM documents
    )
    SELECT least(a.source, b.source) AS source_a,
           greatest(a.source, b.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM vpairs
    JOIN src a ON doc_a = a.doc_id
    JOIN src b ON doc_b = b.doc_id
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
"""

_MH_MINS_SQL = ",\n             ".join(
    f"min(('0x' || substring(md5('{i}:' || shingle), 1, 15))"
    f"::UBIGINT::BIGINT) AS m{i}"
    for i in range(MINHASH_K)
)
_MH_BANDS_SQL = "\n      UNION ALL\n      ".join(
    "SELECT CAST({b} AS BIGINT) AS band, md5({key}) AS bucket FROM mh".format(
        b=b,
        key=" || ',' || ".join(
            f"CAST(m{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
        ),
    )
    for b in range(LSH_BANDS)
)
ORACLES["lsh_band_audit"] = f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(t) - {SHINGLE_N - 1}),
               i -> array_to_string(t[i:i+{SHINGLE_N - 1}], ' ')))) AS shingle
      FROM toks WHERE len(t) >= {SHINGLE_N}
    ), mh AS (
      SELECT doc_id,
             {_MH_MINS_SQL}
      FROM sh GROUP BY doc_id
    ), bands AS (
      {_MH_BANDS_SQL}
    ), buckets AS (
      SELECT band, bucket, count(*) AS k FROM bands GROUP BY band, bucket
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_colliding_buckets,
           CAST(max(k) AS BIGINT) AS max_bucket_size,
           CAST(sum(k * (k - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM buckets GROUP BY band ORDER BY band
"""

# Oracle for the unregistered exact path (kept for tests/selfcheck of the
# guard-protected baseline; not part of the gate registry).
DEDUP_EMBEDDING_ORACLE = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= {EMB_THRESHOLD}
    ORDER BY vec_a, vec_b
"""
