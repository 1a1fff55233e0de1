"""SDK facade lifecycle — the reference frontend's client contract
(sdks/frontend-rs/src/frontend.rs + stream.rs) driven end to end on this
engine: create → open(epoch) → append → read → takeover-fencing → trim →
close."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elastic_stream_spark.catalog import FencedError
from elastic_stream_spark.client import Frontend, StreamOptions


@pytest.fixture()
def fe(spark, workdir):
    return Frontend(spark, workdir)


def _batch(spark, n, base_ts=0):
    return spark.range(n).select(
        F.timestamp_millis(F.lit(base_ts) + F.col("id") * 1000).alias("ts"),
        F.encode(F.col("id").cast("string"), "UTF-8").alias("payload"),
    )


def test_create_open_append_read_roundtrip(spark, fe):
    sid = fe.create(StreamOptions(replica=3, ack=2))
    s = fe.open(sid, epoch=0)
    assert (s.start_offset(), s.next_offset()) == (0, 0)

    r1 = s.append(_batch(spark, 5))
    assert (r1.base_offset, r1.end_offset) == (0, 5)
    r2 = s.append([b"alpha", b"beta"], ts_ms=10_000)
    assert (r2.base_offset, r2.end_offset) == (5, 7)
    assert s.next_offset() == 7

    got = s.read(0, 7).select("offset").collect()
    assert [r.offset for r in got] == list(range(7))
    assert s.read_payloads(5, 7) == [b"alpha", b"beta"]

    # options persisted on the stream record
    meta = fe.catalog.describe_stream(sid)
    assert (meta.replica, meta.ack_count) == (3, 2)


def test_open_takeover_fences_prior_handle(spark, fe):
    """≙ the zombie-writer scenario: a second open() with a later epoch
    seals the old mutable range; the first handle's next append dies with
    FencedError (EXPIRED_RANGE_EPOCH)."""
    sid = fe.create()
    w1 = fe.open(sid, epoch=0)
    w1.append(_batch(spark, 3))

    w2 = fe.open(sid, epoch=w1.epoch)  # takeover
    w2.append(_batch(spark, 2, base_ts=60_000))

    with pytest.raises(FencedError):
        w1.append(_batch(spark, 1, base_ts=120_000))

    # the new writer's records landed after the old ones, offsets dense
    assert w2.next_offset() == 5
    assert [r.offset for r in w2.read(0, 5).select("offset").collect()] == [
        0,
        1,
        2,
        3,
        4,
    ]


def test_trim_then_read_clamps_to_horizon(spark, fe):
    sid = fe.create()
    s = fe.open(sid, epoch=0)
    s.append(_batch(spark, 10))
    s.trim(4)
    assert s.start_offset() == 4
    got = [r.offset for r in s.read(0, 10).select("offset").collect()]
    assert got == [4, 5, 6, 7, 8, 9]


def test_read_with_byte_budget_truncates_whole_records(spark, fe):
    sid = fe.create()
    s = fe.open(sid, epoch=0)
    s.append([b"x" * 100] * 8)
    df = s.read(0, 8, batch_max_bytes=250)
    offs = [r.offset for r in df.select("offset").collect()]
    # whole records only, from the start, never exceeding the budget
    assert offs == list(range(len(offs)))
    assert 1 <= len(offs) < 8


def test_closed_handle_rejects_operations(spark, fe):
    sid = fe.create()
    s = fe.open(sid, epoch=0)
    s.close()
    with pytest.raises(RuntimeError):
        s.append(_batch(spark, 1))
    with pytest.raises(RuntimeError):
        s.read(0, 1)
