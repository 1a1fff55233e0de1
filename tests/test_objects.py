"""Objects catalog (COMMIT_OBJECT ≙ rpc.fbs:653-689) + compaction
(≙ range_accumulator.rs:129-170): commit idempotence, footer-exact
counts, and the fetch-identical-pre/post-compaction invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from elastic_stream_spark.catalog import StreamCatalog
from elastic_stream_spark.log import StreamLog
from elastic_stream_spark.objects import parquet_files


@pytest.fixture()
def log(spark, workdir):
    return StreamLog(spark, StreamCatalog(workdir))


def _events(spark, n, base_ts=0):
    return spark.range(n).select(
        F.timestamp_millis(F.lit(base_ts) + F.col("id") * 1000).alias("ts"),
        F.encode(F.col("id").cast("string"), "UTF-8").alias("payload"),
    )


def test_commit_objects_idempotent_and_footer_exact(spark, log):
    sid = log.catalog.create_stream().stream_id
    log.append(sid, _events(spark, 7))
    log.append(sid, _events(spark, 5, base_ts=10_000))

    assert log.commit_objects(sid) >= 2  # at least one file per append
    objs = log.objects.list_objects(sid)
    assert sum(o.n_records for o in objs) == 12
    assert all(o.n_bytes > 0 and o.range_index == 0 for o in objs)
    assert log.commit_objects(sid) == 0  # idempotent re-commit


def test_optimize_compacts_sealed_range_fetch_identical(spark, log):
    sid = log.catalog.create_stream().stream_id
    for i in range(5):  # five small appends → ≥5 files in range 0
        log.append(sid, _events(spark, 4, base_ts=i * 100_000))
    log.catalog.seal_range(sid, epoch=0)
    log.commit_objects(sid)

    d = log._range_dir(sid, 0)
    files_before = parquet_files(d)
    assert len(files_before) >= 5
    before = [(r.offset, bytes(r.payload)) for r in log.fetch(sid, 0, 100).collect()]
    assert len(before) == 20

    result = log.optimize(sid)
    assert result[0][0] >= 5 and result[0][1] == 1  # files: many → one
    assert len(parquet_files(d)) == 1

    after = [(r.offset, bytes(r.payload)) for r in log.fetch(sid, 0, 100).collect()]
    assert after == before  # byte-identical fetch

    # objects catalog reflects the rewrite: one object, same record count
    objs = log.objects.list_objects(sid)
    range0 = [o for o in objs if o.range_index == 0]
    assert len(range0) == 1 and range0[0].n_records == 20


def test_optimize_skips_mutable_range(spark, log):
    sid = log.catalog.create_stream().stream_id
    for i in range(3):
        log.append(sid, _events(spark, 2, base_ts=i * 100_000))
    # range 0 is still mutable — optimize must not touch it
    assert log.optimize(sid) == {}
    assert len(parquet_files(log._range_dir(sid, 0))) >= 3
