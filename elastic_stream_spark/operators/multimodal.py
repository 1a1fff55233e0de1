"""Multimodal-column plumbing (north-star).

Images/audio/video are opaque ``binary`` columns + typed metadata structs
(SURVEY.md §1.2 — the reference's payload-is-bytes contract generalizes to
any modality).  The decode libraries aren't in this container, so the
codec boundary is STUBBED behind ``decode_image`` (NotImplementedError)
with a deterministic fake used by tests; everything Spark-side — schema,
binary handling, Arrow batch shape, ``mapInPandas`` signatures,
partitioning — is real and tested.

The fixture "media" blob is the document text encoded as bytes (ASCII), so
byte-level results are oracle-checkable in SQL.

Scale: blobs ride in their partitions; feature extraction is
``mapInPandas`` (Arrow batches, one pass, no shuffle); only the small
typed outputs shuffle into the downstream agg.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elastic_stream_spark.sources.envelope import load_table_balanced

MEDIA_SCHEMA = (
    "doc_id BIGINT, blob BINARY, "
    "meta STRUCT<mime: STRING, n_bytes: BIGINT, source: STRING>"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal table: opaque blob + typed metadata struct.
    Balanced load: blobs are built by projection, so rebalancing the
    single-split fixture BEFORE encoding shuffles the text once and every
    downstream Arrow stage uses the whole machine."""
    d = load_table_balanced(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, "image/png")
            .otherwise("audio/wav")
            .alias("mime"),
            F.length("text").cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(blob: bytes) -> "object":
    """Real image decode — requires PIL/opencv, not in this container.
    The Spark-side plumbing calls this per blob inside mapInPandas; swap
    in a real codec on a cluster with the libs installed."""
    raise NotImplementedError(
        "image codec libraries not available in this environment; "
        "use fake_byte_features for deterministic testing"
    )


def fake_byte_features(blob: bytes) -> tuple[int, float, int]:
    """Deterministic stand-in feature extractor: (byte_sum, mean_byte,
    n_bytes).  Stands where a resize/embed/fft would run.  Reference
    (per-blob) form kept for the pytest cross-check; the hot path uses the
    vectorized batch version below."""
    n = len(blob)
    s = sum(blob)
    return s, (s / n if n else 0.0), n


def batch_byte_features(blobs: "pd.Series") -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized (byte_sum, n_bytes) over a whole Arrow batch: one flat
    uint8 view of all blobs + a prefix-sum, so per-blob sums are two array
    lookups — no per-row Python in the loop.  Lengths fall out of the same
    pass, so callers never re-walk the blobs."""
    import numpy as np

    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=len(blobs))
    flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    csum = np.concatenate(([0], np.cumsum(flat, dtype=np.int64)))
    ends = np.cumsum(lens)
    starts = ends - lens
    return csum[ends] - csum[starts], lens


def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over the blob column via
    mapInPandas — the real multimodal hot path (decode→feature) with the
    codec stubbed to byte statistics.  Aggregated per mime type.

    The mime tag is projected JVM-side before the Python stage (only
    doc_id/blob/mime cross the Arrow boundary), and the byte stats are
    numpy-vectorized per batch — no per-row Python."""
    media = media_table(spark, sf_dir).select(
        "doc_id", "blob", F.col("meta.mime").alias("mime")
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums, lens = batch_byte_features(pdf["blob"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "byte_sum": sums,
                    "n_bytes": lens,
                }
            )

    feats = media.mapInPandas(
        extract, schema="doc_id BIGINT, mime STRING, byte_sum BIGINT, n_bytes BIGINT"
    )
    return (
        feats.groupBy("mime")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("byte_sum").alias("total_byte_sum"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("mime")
    )


def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata query over the multimodal table (no decode): per
    (mime, source) blob counts and byte totals — pure columnar pruning,
    the blob column is never read."""
    media = media_table(spark, sf_dir)
    return (
        media.select("meta.mime", "meta.source", "meta.n_bytes")
        .groupBy("mime", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_bytes").alias("total_bytes"))
        .orderBy("mime", "source")
    )


QUERIES = {
    "mm_byte_features": mm_byte_features,
    "mm_metadata_stats": mm_metadata_stats,
}

ORACLES = {
    "mm_byte_features": """
        WITH per_doc AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
                 list_sum(list_transform(generate_series(1, length(text)),
                                         i -> ord(text[i]))) AS byte_sum,
                 length(text) AS n_bytes
          FROM documents
        )
        SELECT mime, count(*) AS n_docs,
               CAST(sum(byte_sum) AS BIGINT) AS total_byte_sum,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        FROM per_doc GROUP BY mime ORDER BY mime
    """,
    "mm_metadata_stats": """
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
               source, count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS total_bytes
        FROM documents GROUP BY mime, source ORDER BY mime, source
    """,
}
