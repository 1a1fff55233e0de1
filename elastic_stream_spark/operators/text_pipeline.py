"""Training-data pipeline operators over ``documents`` (north-star) —
the corpus-preparation stages between raw text and a tokenized batch:
chunking, vocabulary statistics, and per-source domain signatures.

All pure JVM column expressions (``sequence``/``explode`` + substring
arithmetic + two-level aggregation) — no Python UDFs, so 100 TB is just
more partitions:

- doc_chunking              overlapping fixed-size chunks w/ char offsets+hashes
- token_heavy_hitters       corpus-wide top-k token frequencies
- source_distinctive_tokens per-source tokens over-represented vs corpus
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elastic_stream_spark.functions.textfns import tokens
from elastic_stream_spark.sources.envelope import load_table_balanced

CHUNK_CHARS = 200  # chunk window size
CHUNK_STRIDE = 150  # start-to-start distance (50-char overlap)
HEAVY_K = 20
DISTINCT_TOP = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table_balanced(spark, sf_dir, "documents")


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping fixed-size character chunks
    (200 chars, stride 150) with CHARACTER offsets and content hashes —
    the standard pre-tokenization windowing stage of a training pipeline.
    ``chunk_start``/``chunk_len`` are substring (code-point) offsets, NOT
    byte offsets: a consumer seeking into UTF-8 bytes must re-encode
    (the multibyte edge-corpus test pins character semantics in both
    engines).

    Start offsets are ``0, 150, 300, …`` while they still fall inside
    the document, so every chunk is non-empty and the last one may be
    short.  Pure per-row ``sequence``/``explode`` + ``substring`` —
    no shuffle at all; at 100 TB this is a map-only stage whose output
    is written straight back to partitioned parquet.  Chunk counts
    derive from the fixture's ``n_chars`` metadata column, which the
    generator guarantees equals ``length(text)`` (the edge-corpus test
    writes both consistently)."""
    d = _docs(spark, sf_dir)
    n_starts_minus1 = F.floor(
        (F.greatest(F.col("n_chars"), F.lit(1)) - 1) / CHUNK_STRIDE
    ).cast("int")
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_starts_minus1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * CHUNK_STRIDE).alias("chunk_start"),
            F.expr(
                f"substring(text, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_CHARS})"
            ).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_start",
            F.length("chunk").alias("chunk_len"),
            F.md5("chunk").alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 tokens by frequency.  Explode + count is one
    shuffle on the token key with map-side partial aggregation, so a hot
    token (they are ALL hot) arrives at the reducer as one partial row
    per input partition — frequency skew never concentrates raw rows.
    Ties at the cut line break deterministically by token."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(HEAVY_K)
    )


def source_distinctive_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source domain signature: the 5 tokens most over-represented in
    each source relative to the whole corpus, scored by lift
    ``(c_st / n_s) / (c_t / n)`` — the TF-IDF-ish fingerprint used to
    characterize / route corpus slices in a data-mixing pipeline.

    One explode + (source, token) aggregate is the only fact-sized
    shuffle.  Per-source totals (|sources| rows) and the corpus total
    (1 row) broadcast; per-token totals are VOCABULARY-sized — millions
    to billions of distinct tokens on a web corpus — so they join
    token-partitioned (an equi-join between two token-keyed aggregates
    of the same table, never a broadcast of the vocabulary)."""
    d = _docs(spark, sf_dir)
    st = (
        d.select("source", F.explode(tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("c_st"))
    )
    per_source = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    per_token = st.groupBy("token").agg(F.sum("c_st").alias("c_t"))
    total = per_token.agg(F.sum("c_t").alias("n")).withColumn("k", F.lit(1))
    scored = (
        st.join(F.broadcast(per_source), "source")
        .join(per_token, "token")
        .withColumn("k", F.lit(1))
        .join(F.broadcast(total), "k")
        .withColumn(
            "lift",
            F.round(
                (F.col("c_st") * F.col("n"))
                / (F.col("n_s") * F.col("c_t"))
                .cast("double"),
                6,
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("lift"), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= DISTINCT_TOP)
        .select("source", "token", "c_st", "lift", "rk")
        .orderBy("source", "rk")
    )


QUERIES = {
    "doc_chunking": doc_chunking,
    "token_heavy_hitters": token_heavy_hitters,
    "source_distinctive_tokens": source_distinctive_tokens,
}

ORACLES = {
    "doc_chunking": f"""
        WITH chunks AS (
          SELECT doc_id, unnest(generate_series(
                   0, CAST(floor((greatest(n_chars, 1) - 1)
                                 / {CHUNK_STRIDE}) AS BIGINT))) AS chunk_idx,
                 text
          FROM documents
        )
        SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
               CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
               length(substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT),
                                {CHUNK_CHARS})) AS chunk_len,
               md5(substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT),
                             {CHUNK_CHARS})) AS chunk_hash
        FROM chunks
        ORDER BY doc_id, chunk_idx
    """,
    "token_heavy_hitters": f"""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
              FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT {HEAVY_K}
    """,
    "source_distinctive_tokens": f"""
        WITH st AS (
          SELECT source, token, count(*) AS c_st
          FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS token
                FROM documents)
          GROUP BY source, token
        ),
        per_source AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY source),
        per_token AS (SELECT token, sum(c_st) AS c_t FROM st GROUP BY token),
        total AS (SELECT sum(c_t) AS n FROM per_token),
        scored AS (
          SELECT st.source, st.token, st.c_st,
                 round((st.c_st * total.n)
                       / CAST(per_source.n_s * per_token.c_t AS DOUBLE),
                       6) AS lift
          FROM st
          JOIN per_source ON st.source = per_source.source
          JOIN per_token ON st.token = per_token.token
          CROSS JOIN total
        ),
        ranked AS (
          SELECT source, token, c_st, lift,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY lift DESC, token) AS rk
          FROM scored
        )
        SELECT source, token, c_st, lift, rk
        FROM ranked WHERE rk <= {DISTINCT_TOP}
        ORDER BY source, rk
    """,
}
