"""Text-analysis operators over ``documents`` (north-star).

All pure JVM column expressions (regex + higher-order array functions) —
the whole pipeline is scan → codegen'd projections → one aggregation
shuffle.  No Python UDFs anywhere, so 100 TB is just more partitions.

- token counting      whitespace + a BPE-ish subword-regex count
- quality scoring     length / stopword-ratio / mean-token-length heuristics
- language ID         stopword-hit heuristic (deterministic lexicon)
- fingerprinting      md5 document fingerprints (full text + shingle set)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elastic_stream_spark.functions.textfns import bow_fingerprint, tokens
from elastic_stream_spark.sources.envelope import load_table_balanced

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in")
# BPE-ish token regex: word pieces of up to 4 chars — a deterministic
# stand-in for subword tokenization (no tokenizer libs in the image).
BPE_PIECE_RE = "[a-z]{1,4}"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table_balanced(spark, sf_dir, "documents")


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token statistics: docs, whitespace tokens, distinct
    tokens, BPE-ish subword pieces, chars."""
    d = _docs(spark, sf_dir)
    t = tokens("text")
    return (
        d.select(
            "source",
            F.size(t).alias("n_tokens"),
            F.size(F.array_distinct(t)).alias("n_distinct"),
            F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_PIECE_RE), 0)).alias(
                "n_pieces"
            ),
            F.length("text").alias("n_chars"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            # determinism: avg over INTs is Σint/n — an exact-integer
            # division, bit-identical unrounded in both engines; round()
            # on it can land on a decimal tie (timeseries.py note)
            F.avg("n_distinct").alias("avg_distinct"),
            F.sum("n_pieces").alias("total_pieces"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source")
    )


def quality_score_col() -> "F.Column":
    """The per-doc heuristic quality score in [0,1] (length band +
    stopword ratio + mean token length) as a reusable column expression
    over a ``text`` column — shared by ``text_quality_score`` and the
    end-to-end ``pipeline_keep_list``."""
    t = tokens("text")
    n_tok = F.size(t)
    stop_hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS_EN)))
    mean_len = (F.length("text") - n_tok + 1) / n_tok  # chars-per-token (spaces removed)
    score = (
        F.when(n_tok >= 30, F.lit(0.4)).otherwise(F.lit(0.1))
        + F.when((stop_hits / n_tok >= 0.02) & (stop_hits / n_tok <= 0.4), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 3) & (mean_len <= 8), F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return F.round(score, 4)


# DuckDB per-doc equivalent of quality_score_col (CTE fragment; yields
# (doc_id, lang, q) per document).
QUALITY_SQL = f"""
  q_per_doc AS (
    SELECT doc_id, lang,
           round(
             (CASE WHEN len(string_split(lower(text), ' ')) >= 30 THEN 0.4 ELSE 0.1 END)
           + (CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                        x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))
                     * 1.0 / len(string_split(lower(text), ' ')) >= 0.02
                AND len(list_filter(string_split(lower(text), ' '),
                                        x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))
                     * 1.0 / len(string_split(lower(text), ' ')) <= 0.4
               THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN (length(text) - len(string_split(lower(text), ' ')) + 1)
                          * 1.0 / len(string_split(lower(text), ' ')) >= 3
                AND (length(text) - len(string_split(lower(text), ' ')) + 1)
                          * 1.0 / len(string_split(lower(text), ' ')) <= 8
               THEN 0.3 ELSE 0.0 END)
           , 4) AS q
    FROM documents
  )
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score per doc: length band + stopword ratio +
    mean token length, combined into [0,1].  Returns the per-lang score
    distribution (docs, avg score, low-quality count at < 0.5)."""
    d = _docs(spark, sf_dir)
    scored = d.select("lang", quality_score_col().alias("q"))
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.sum(F.when(F.col("q") < 0.5, 1).otherwise(0)).alias("n_low_quality"),
        )
        .orderBy("lang")
    )


# --- model-based quality scorer (CCNet/fastText-style) -----------------
# A fixed-weight hashed-feature LINEAR classifier: every token hashes
# into one of QM_BUCKETS feature buckets, the document logit is the sum
# of the bucket weights, and the verdict thresholds the MEAN logit.
# This is the shape of fastText's quality filter (hashed bag-of-words ×
# dense weight row) with the trained weights replaced by a frozen
# deterministic vector — the serving plan is identical; training happens
# offline and ships as constants exactly like this.
QM_BUCKETS = 64  # 65536 % 64 == 0 → the 4-hex-digit hash is uniform mod B
# frozen "trained" weight row (integers so every sum is exact in both
# engines; random.Random(20260815).randint(-8, 8) × 64)
QM_WEIGHTS = [
    -6, -8, 8, 6, 1, -6, 7, 0, -7, -6, 5, -7, -4, 8, -5, 4,
    -4, 5, -8, -7, 2, 1, 0, -8, -2, 2, -7, 4, 6, 1, 7, -8,
    6, 8, 6, -7, -6, 7, 4, 5, -1, -5, -2, 7, -8, 5, 5, 7,
    2, -2, 4, -8, 2, 2, -6, -4, -7, 3, -7, 4, -8, 8, 4, -8,
]
# verdict: mean logit ≥ QM_THRESH_NUM / QM_THRESH_DEN (integer-exact
# comparison — logit_sum · DEN ≥ NUM · n_tokens; sigmoid is monotone, so
# thresholding the logit IS thresholding the probability: σ(0.25) ≈ 0.56)
QM_THRESH_NUM, QM_THRESH_DEN = 1, 4


def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring as a PURE COLUMN expression — the
    curation stage heuristics can't cover (CCNet: a classifier scores
    every document; docs.quality filtering in every LLM data pipeline).

    Per doc: token → md5-hash → bucket (mod ``QM_BUCKETS``), logit_sum =
    Σ ``QM_WEIGHTS[bucket]`` via ``aggregate(transform(...))`` — a
    higher-order fold INSIDE the row, so the whole operator is one
    map-only projection + the output sort: zero joins, zero aggregation
    shuffles, zero Python.  At 100 TB this is the ideal operator shape —
    embarrassingly parallel, scan-bound, whole-stage-codegen'd.

    Determinism: weights and logits are INTEGERS (sums exact in any
    order); ``score`` is the unrounded exact-integer division
    logit_sum/n_tokens (bit-identical IEEE doubles in Spark and DuckDB —
    see the timeseries.py determinism note); the keep verdict is a pure
    integer cross-multiplication, so no float ever decides anything."""
    d = _docs(spark, sf_dir)
    t = tokens("text")
    warr = F.array(*[F.lit(w) for w in QM_WEIGHTS])
    bucket = lambda tok: (  # noqa: E731 — column lambda, used twice
        F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("int") % QM_BUCKETS
    )
    logit = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, tok: acc + F.element_at(warr, bucket(tok) + 1),
    )
    scored = d.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        logit.alias("logit_sum"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "logit_sum",
        (F.col("logit_sum") / F.col("n_tokens")).alias("score"),
        (
            F.col("logit_sum") * QM_THRESH_DEN
            >= F.lit(QM_THRESH_NUM) * F.col("n_tokens")
        ).alias("keep_model"),
    ).orderBy("doc_id")


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID: EN stopword ratio ≥ 4% → 'en', else
    'other'; per-source prediction counts.  (The fixture corpus is a
    synthetic shared-vocabulary soup, so the interesting part is the
    operator shape: lexicon membership via array filter, argmax by
    deterministic tie-break — all codegen'd.)"""
    d = _docs(spark, sf_dir)
    t = tokens("text")
    ratio = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS_EN))) / F.size(t)
    pred = F.when(ratio >= 0.04, F.lit("en")).otherwise(F.lit("other"))
    return (
        d.select("source", pred.alias("pred_lang"))
        .groupBy("source", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("source", "pred_lang")
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact md5 + order-insensitive bag-of-words
    md5; per-source distinct-fingerprint counts (dup detection summary)."""
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "source",
            F.md5("text").alias("fp_exact"),
            bow_fingerprint("text").alias("fp_bow"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp_exact").alias("distinct_exact"),
            F.countDistinct("fp_bow").alias("distinct_bow"),
        )
        .orderBy("source")
    )


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "quality_model_score": quality_model_score,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
}

_QM_W_SQL = "[" + ", ".join(str(w) for w in QM_WEIGHTS) + "]"

_STOP_SQL = "('" + "', '".join(STOPWORDS_EN) + "')"

ORACLES = {
    "text_token_stats": f"""
        WITH per_doc AS (
          SELECT source,
                 len(string_split(lower(text), ' ')) AS n_tokens,
                 len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
                 len(regexp_extract_all(lower(text), '{BPE_PIECE_RE}')) AS n_pieces,
                 length(text) AS n_chars
          FROM documents
        )
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               avg(n_distinct) AS avg_distinct,
               CAST(sum(n_pieces) AS BIGINT) AS total_pieces,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM per_doc GROUP BY source ORDER BY source
    """,
    "text_quality_score": f"""
        WITH per_doc AS (
          SELECT lang,
                 len(string_split(lower(text), ' ')) AS n_tok,
                 len(list_filter(string_split(lower(text), ' '),
                                 x -> x IN {_STOP_SQL})) AS stop_hits,
                 (length(text) - len(string_split(lower(text), ' ')) + 1)
                   * 1.0 / len(string_split(lower(text), ' ')) AS mean_len
          FROM documents
        ), scored AS (
          SELECT lang,
                 round(
                   (CASE WHEN n_tok >= 30 THEN 0.4 ELSE 0.1 END)
                 + (CASE WHEN stop_hits * 1.0 / n_tok >= 0.02
                          AND stop_hits * 1.0 / n_tok <= 0.4 THEN 0.3 ELSE 0.0 END)
                 + (CASE WHEN mean_len >= 3 AND mean_len <= 8 THEN 0.3 ELSE 0.0 END)
                 , 4) AS q
          FROM per_doc
        )
        SELECT lang, count(*) AS n_docs, round(avg(q), 4) AS avg_quality,
               CAST(sum(CASE WHEN q < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
        FROM scored GROUP BY lang ORDER BY lang
    """,
    "quality_model_score": f"""
        WITH toks AS (
          SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        ), logits AS (
          SELECT doc_id, len(t) AS n_tokens,
                 CAST(list_sum(list_transform(t,
                     tok -> ({_QM_W_SQL})[
                       (('0x' || substr(md5(tok), 1, 4))::INT % {QM_BUCKETS}) + 1
                     ])) AS BIGINT) AS logit_sum
          FROM toks
        )
        SELECT doc_id, n_tokens, logit_sum,
               logit_sum * 1.0 / n_tokens AS score,
               logit_sum * {QM_THRESH_DEN} >= {QM_THRESH_NUM} * n_tokens
                 AS keep_model
        FROM logits ORDER BY doc_id
    """,
    "text_langid": f"""
        WITH per_doc AS (
          SELECT source,
                 CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                           x -> x IN {_STOP_SQL}))
                        * 1.0 / len(string_split(lower(text), ' ')) >= 0.04
                      THEN 'en' ELSE 'other' END AS pred_lang
          FROM documents
        )
        SELECT source, pred_lang, count(*) AS n
        FROM per_doc GROUP BY source, pred_lang ORDER BY source, pred_lang
    """,
    "text_fingerprint": """
        WITH fp AS (
          SELECT source, md5(text) AS fp_exact,
                 md5(array_to_string(list_sort(list_distinct(
                       string_split(lower(text), ' '))), ' ')) AS fp_bow
          FROM documents
        )
        SELECT source, count(*) AS n_docs,
               count(DISTINCT fp_exact) AS distinct_exact,
               count(DISTINCT fp_bow) AS distinct_bow
        FROM fp GROUP BY source ORDER BY source
    """,
}
