"""Incremental (streaming) curation pipeline — the nightly dataflow.

The batch gate ``operators/pipeline.py::pipeline_end_to_end`` certifies
the FULL-CORPUS rebuild; a real 100 TB pipeline runs the INCREMENTAL
form instead: documents arrive on a stream, every micro-batch dedups
against the standing corpus fingerprints plus everything admitted before
it, scores quality, appends exactly one manifest row, and registers its
own fingerprints so the NEXT batch sees them.  This module is that
``foreachBatch`` stage as a reusable component:

- **dedup state** = a standing fingerprint store (a parquet directory —
  at scale a bucketed table): corpus fps seeded once, each batch appends
  its distinct new fps after its verdicts are computed.  Duplicate fps
  in the store are harmless (the membership join reads it through
  ``distinct()``), which makes the fp append idempotent under microbatch
  replay without a second marker protocol.
- **exactly-once manifest** = ``ExactlyOnceAppendSink``'s two-phase
  batchId marker (sink.py): a replayed micro-batch returns before
  touching the data, so manifests never double.
- **equivalence contract** = the registered batch query
  ``operators/pipeline.py::stream_pipeline_replay`` computes the same
  verdicts with ONE arrival-ordered window; the streaming execution must
  reproduce its rows exactly (asserted in tests/test_streaming.py) —
  the same batch-replay-equivalence pattern as ``stream_join_replay``
  and ``stream_heavy_hitters_replay``.

Reference parity: the reference's streaming surface is append → FETCH
with offset admission (SURVEY.md §2.8); this composes that transport
with the curation operators into the multi-stage stateful dataflow a
training-data service actually serves.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from elastic_stream_spark.kv import KVStore
from elastic_stream_spark.log import StreamLog
from elastic_stream_spark.streaming.sink import ExactlyOnceAppendSink


class IncrementalCurationPipeline:
    """``foreachBatch`` callable: record envelope (payload = document
    text, properties carrying doc_id / batch_id) → incremental exact-dup
    + quality verdict → exactly-once manifest append.

    Batch contract: manifests are keyed by the LOGICAL batch_id carried
    in the records (event-derived, replay-stable); exactly-once is keyed
    by Spark's microbatch id (the sink marker), so a crashed/replayed
    trigger re-lands the SAME logical rows once.
    """

    def __init__(
        self,
        log: StreamLog,
        kv: KVStore,
        manifest_stream_id: int,
        standing_fps_dir: str,
        fp_term_mod: int,
    ):
        self.log = log
        self.kv = kv
        self.standing_fps_dir = standing_fps_dir
        self.fp_term_mod = fp_term_mod
        self.sink = ExactlyOnceAppendSink(
            log, kv, manifest_stream_id, "incremental_curation"
        )

    def seed_corpus(self, corpus_docs: DataFrame) -> None:
        """Register the standing corpus's fingerprints (run once — in
        production this is the output of the last full rebuild)."""
        from elastic_stream_spark.functions.textfns import bow_fingerprint

        corpus_docs.select(bow_fingerprint("text").alias("fp")).distinct().write.mode(
            "overwrite"
        ).parquet(self.standing_fps_dir)

    def _verdicts(self, batch_df: DataFrame) -> DataFrame:
        from elastic_stream_spark.functions.textfns import bow_fingerprint
        from elastic_stream_spark.operators.text import quality_score_col

        docs = batch_df.select(
            F.col("properties")["doc_id"].cast("long").alias("doc_id"),
            F.col("properties")["batch_id"].cast("long").alias("batch_id"),
            F.decode("payload", "UTF-8").alias("text"),
        )
        scored = docs.select(
            "doc_id",
            "batch_id",
            bow_fingerprint("text").alias("fp"),
            quality_score_col().alias("q"),
            F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tokens"),
        )
        standing = (
            self.log.spark.read.parquet(self.standing_fps_dir)
            .select("fp")
            .distinct()
            .withColumn("in_standing", F.lit(True))
        )
        w = Window.partitionBy("fp").orderBy("batch_id", "doc_id")
        return (
            scored.join(standing, "fp", "left")
            .withColumn("arrival_rn", F.row_number().over(w))
            .withColumn(
                "is_dup",
                F.coalesce("in_standing", F.lit(False)) | (F.col("arrival_rn") > 1),
            )
            .withColumn("keep", ~F.col("is_dup") & (F.col("q") >= 0.5))
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # pin the micro-batch: truncating the streaming-source lineage
        # keeps the verdict plan (window + join + two consumers) a plain
        # batch plan — Spark 4's optimizer re-resolution over a
        # foreachBatch source rejects it otherwise (PLAN_VALIDATION_
        # FAILED_RULE_IN_BATCH), and the two downstream actions (manifest
        # sink, fp append) would each re-read the source anyway
        batch_df = batch_df.localCheckpoint(eager=True)
        flagged = self._verdicts(batch_df)
        fp_term = (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            )
            .cast("decimal(20,0)")
            .cast("long")
            % self.fp_term_mod
        )
        manifest = (
            flagged.groupBy("batch_id")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
                F.sum(F.col("keep").cast("long")).alias("n_kept"),
                F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
                .cast("bigint")
                .alias("kept_tokens"),
                F.sum(F.when(F.col("keep"), fp_term).otherwise(0))
                .cast("bigint")
                .alias("manifest_fp"),
            )
        )
        envelope = manifest.select(
            F.timestamp_millis(F.col("batch_id")).alias("ts"),
            F.create_map(
                F.lit("batch_id"), F.col("batch_id").cast("string")
            ).alias("properties"),
            F.encode(
                F.to_json(
                    F.struct(
                        "batch_id",
                        "n_docs",
                        "n_dups",
                        "n_kept",
                        "kept_tokens",
                        "manifest_fp",
                    )
                ),
                "UTF-8",
            ).alias("payload"),
        )
        # manifest FIRST (two-phase marker makes it exactly-once; it also
        # forces the verdict evaluation against the PRE-update fp store),
        # then register this batch's fps for the next batch — the fp
        # append is idempotent under replay because membership reads the
        # store through distinct() and the sink short-circuits a
        # committed batch before any recompute could see the new fps.
        self.sink(envelope, batch_id)
        flagged.select("fp").distinct().write.mode("append").parquet(
            self.standing_fps_dir
        )

    def manifests(self) -> list[dict]:
        """Fetch + decode every manifest row appended so far (test/audit
        helper; production consumers fetch the stream directly)."""
        rows = self.log.fetch(self.sink.stream_id, 0, 1 << 40).collect()
        return sorted(
            (json.loads(bytes(r.payload).decode()) for r in rows),
            key=lambda d: d["batch_id"],
        )


class IncrementalCCAbsorber:
    """``foreachBatch`` stage: absorb each arriving micro-batch's
    near-dup pairs into STANDING cluster labels — the streaming form of
    ``operators/pipeline.py::cc_append`` (one contraction + small
    fixpoint per trigger instead of a nightly full-corpus rebuild).

    State = a VERSIONED label snapshot directory: ``v{n}`` parquet dirs;
    the highest n *whose ``_SUCCESS`` marker exists* is current.
    ``write.parquet`` is not atomic, so a crash mid-write leaves a
    partial ``v{n+1}`` — the marker gate makes readers skip it (the
    read side never sees a torn snapshot) and the micro-batch replay
    re-derives ``v{n+1}`` from the last COMMITTED snapshot, clobbering
    the partial dir with ``mode("overwrite")``.  Production keeps the
    same layout for time-travel.  Per batch: (1) pairs with
    BOTH endpoints admitted (standing ∪ this batch) that touch the
    batch; (2) corpus endpoints contract to their standing label; (3)
    the pointer-doubling fixpoint runs on the contracted graph only —
    O(batch + touched clusters); (4) standing labels re-map through the
    delta and the new snapshot version is written.

    Exactly-once: absorption is IDEMPOTENT under micro-batch replay —
    labels are component MINIMA, so re-absorbing the same pairs onto
    the post-merge labels is a fixpoint no-op (the replayed version
    rewrite produces identical rows); the ``_SUCCESS`` gate covers the
    remaining failure mode (a torn snapshot write, above).
    Exactness across batches: pair (a, b) is processed in the trigger
    where its LATER endpoint arrives, every pair is eventually
    processed, and min-label merging is order-insensitive — so after
    the last batch the labels equal the full-graph fixpoint (asserted
    against ``connected_components`` in tests/test_streaming.py)."""

    def __init__(
        self,
        spark,
        labels_root: str,
        all_pairs: DataFrame,
        retain: int | None = None,
    ):
        # all_pairs: the verified near-dup pair source (in production a
        # per-batch LSH probe against the served index; in the fixture
        # the deterministic ngram_pair_set, filtered per batch here)
        # retain: if set, auto-vacuum after each absorbed batch keeping
        # the newest `retain` committed snapshots (None = keep history —
        # the time-travel layout; a long-running stream sets retain)
        self.spark = spark
        self.labels_root = labels_root
        self.all_pairs = all_pairs
        self.retain = retain

    @staticmethod
    def _version_of(dirname: str) -> int | None:
        """``v{n}`` → n; anything else (scratch dirs, stray files) → None."""
        if dirname.startswith("v") and dirname[1:].isdigit():
            return int(dirname[1:])
        return None

    def _version_dirs(self) -> list[int]:
        """COMMITTED snapshot versions only: a ``v{n}`` dir counts iff
        Spark's ``_SUCCESS`` marker exists (the Hadoop committer writes
        it last), so a write that crashed mid-parquet is invisible to
        readers and gets overwritten by the replay."""
        import os

        if not os.path.isdir(self.labels_root):
            return []
        return sorted(
            v
            for d in os.listdir(self.labels_root)
            if (v := self._version_of(d)) is not None
            and os.path.exists(os.path.join(self.labels_root, d, "_SUCCESS"))
        )

    def seed(self, standing_labels: DataFrame) -> None:
        """``standing_labels`` must be COMPLETE — one row per corpus doc,
        pairless docs self-labeled (``label_corpus`` builds it).  The
        per-batch admitted-set test reads membership from this table, so
        a corpus doc absent here would silently drop its future pairs
        (a corpus doc whose only near-dup edge goes to a not-yet-arrived
        doc has no corpus-pair CC row — the exact case a CC-output-only
        seed misses)."""
        standing_labels.select("doc_id", "cluster_id").write.mode(
            "overwrite"
        ).parquet(f"{self.labels_root}/v0")

    @staticmethod
    def label_corpus(corpus_docs: DataFrame, corpus_pairs: DataFrame) -> DataFrame:
        """Complete standing labels for a corpus: CC labels where edges
        exist, self-labels for pairless docs — one row per doc."""
        from elastic_stream_spark.operators.pipeline import connected_components

        comp = connected_components(corpus_pairs)
        return corpus_docs.select("doc_id").join(comp, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
        )

    def labels(self) -> DataFrame:
        vs = self._version_dirs()
        if not vs:
            raise RuntimeError(
                f"no committed label snapshot under {self.labels_root} "
                "(seed() first; a _SUCCESS-less dir is an aborted write)"
            )
        return self.spark.read.parquet(f"{self.labels_root}/v{vs[-1]}")

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Retention for the snapshot history: drop committed versions
        older than the newest ``keep_last``, plus any TORN dir (no
        ``_SUCCESS``) strictly below the current committed version —
        that is aborted-write garbage no replay will ever target.  A
        torn dir ABOVE current is left alone: it is the next version's
        write target and may belong to an in-flight writer.  Returns
        the removed version numbers (the same keep-newest/never-current
        contract as the log's retention sweep, log.py sweep).

        Concurrency contract: ONE writer (Structured Streaming
        serializes ``foreachBatch`` invocations per query, so the
        auto-vacuum path inherits this for free); concurrent READERS
        are safe for any snapshot inside the retained window — a reader
        pinned to an older version races its deletion, which is the
        standard retention trade-off (same as the log sweep)."""
        import os
        import shutil

        committed = self._version_dirs()
        if not committed:
            return []
        cur = committed[-1]
        keep = set(committed[-max(keep_last, 1):])
        removed = []
        for d in os.listdir(self.labels_root):
            v = self._version_of(d)
            if v is None:
                continue
            torn = not os.path.exists(
                os.path.join(self.labels_root, d, "_SUCCESS")
            )
            if (v in keep) or (torn and v >= cur):
                continue
            shutil.rmtree(os.path.join(self.labels_root, d))
            removed.append(v)
        return sorted(removed)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from elastic_stream_spark.operators.pipeline import connected_components

        if batch_df.isEmpty():
            return
        batch_ids = (
            batch_df.select(
                F.col("properties")["doc_id"].cast("long").alias("doc_id")
            )
            .distinct()
            .localCheckpoint(eager=True)  # truncate the streaming lineage
        )
        standing = self.labels()
        admitted = standing.select("doc_id").unionByName(
            batch_ids.select("doc_id")
        )
        in_batch = batch_ids.withColumnRenamed("doc_id", "b")
        pairs = (
            self.all_pairs.join(
                in_batch.withColumnRenamed("b", "doc_a"), "doc_a", "leftsemi"
            )
            .unionByName(
                self.all_pairs.join(
                    in_batch.withColumnRenamed("b", "doc_b"), "doc_b", "leftsemi"
                )
            )
            .distinct()
            # both endpoints must be admitted (a pair whose partner
            # arrives later is processed in the partner's trigger)
            .join(
                admitted.withColumnRenamed("doc_id", "doc_a"), "doc_a", "leftsemi"
            )
            .join(
                admitted.withColumnRenamed("doc_id", "doc_b"), "doc_b", "leftsemi"
            )
        )
        sa = standing.select(
            F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("la")
        )
        sb = standing.select(
            F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("lb")
        )
        contracted = (
            pairs.join(sa, "doc_a", "left")
            .join(sb, "doc_b", "left")
            .select(
                F.coalesce("la", F.col("doc_a")).alias("doc_a"),
                F.coalesce("lb", F.col("doc_b")).alias("doc_b"),
            )
        )
        delta = connected_components(contracted)
        lmap = delta.select(
            F.col("doc_id").alias("old_label"),
            F.col("cluster_id").alias("new_label"),
        )
        relabeled = standing.join(
            lmap, standing.cluster_id == lmap.old_label, "left"
        ).select(
            "doc_id", F.coalesce("new_label", "cluster_id").alias("cluster_id")
        )
        extra = delta.join(
            standing.select("doc_id"), "doc_id", "left_anti"
        ).select("doc_id", "cluster_id")
        # batch docs touching no pair are singleton clusters of themselves
        singleton = (
            batch_ids.join(relabeled.select("doc_id"), "doc_id", "left_anti")
            .join(extra.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.col("doc_id").alias("cluster_id"))
        )
        nxt = self._version_dirs()[-1] + 1
        relabeled.unionByName(extra).unionByName(singleton).write.mode(
            "overwrite"
        ).parquet(f"{self.labels_root}/v{nxt}")
        if self.retain is not None:
            self.vacuum(keep_last=self.retain)
