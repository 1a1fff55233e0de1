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


FRAME_SIZE = 256  # bytes per decoded "frame"
FRAME_STRIDE = 4  # keep every 4th frame (uniform temporal sampling)
FRAME_DOC_CAP = 50  # gate query bounds output to doc_id < cap


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media blobs — the video-pipeline shape
    (decode → pick every k-th frame → per-frame feature): blobs are cut
    into fixed 256-byte "frames" (the deterministic stand-in for a real
    frame decoder, same seam as ``decode_image``), every 4th frame is
    kept, and each kept frame emits (doc_id, frame_idx, n_bytes, md5).

    Plumbing is the real thing: one Arrow pass (``mapInPandas``), typed
    row-per-frame output, no shuffle before the final sort; a real
    decoder slots into ``extract`` unchanged.  At 100 TB frames explode
    ~1:N per blob inside the Python stage and only the small typed rows
    cross back.  The fixture blob is ASCII text, so the oracle derives
    identical frames with substr+md5 in SQL."""
    import hashlib

    media = media_table(spark, sf_dir).where(F.col("doc_id") < FRAME_DOC_CAP)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_len, out_md5 = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                n_frames = (len(b) + FRAME_SIZE - 1) // FRAME_SIZE
                for idx in range(0, n_frames, FRAME_STRIDE):
                    frame = b[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_len.append(len(frame))
                    out_md5.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_idx": out_idx,
                    "n_bytes": out_len,
                    "frame_md5": out_md5,
                }
            )

    frames = media.select("doc_id", "blob").mapInPandas(
        extract,
        schema="doc_id BIGINT, frame_idx INT, n_bytes INT, frame_md5 STRING",
    )
    return frames.orderBy("doc_id", "frame_idx")


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
    "mm_frame_sample": mm_frame_sample,
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
    "mm_frame_sample": f"""
        WITH frames AS (
          SELECT doc_id,
                 unnest(generate_series(0,
                     CAST(ceil(length(text) / {FRAME_SIZE}.0) AS BIGINT) - 1,
                     {FRAME_STRIDE})) AS frame_idx
          FROM documents
          WHERE doc_id < {FRAME_DOC_CAP} AND length(text) > 0
        )
        SELECT f.doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
               CAST(length(substr(d.text, f.frame_idx * {FRAME_SIZE} + 1,
                                  {FRAME_SIZE})) AS INT) AS n_bytes,
               md5(substr(d.text, f.frame_idx * {FRAME_SIZE} + 1,
                          {FRAME_SIZE})) AS frame_md5
        FROM frames f JOIN documents d USING (doc_id)
        ORDER BY doc_id, frame_idx
    """,
    "mm_metadata_stats": """
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
               source, count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS total_bytes
        FROM documents GROUP BY mime, source ORDER BY mime, source
    """,
}
