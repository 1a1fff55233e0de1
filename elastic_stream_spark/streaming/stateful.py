"""Custom stateful streaming operator: per-stream offset accounting.

≙ the reference's per-stream commit/confirm-offset tracking
(components/replication/src/stream/replication_stream.rs confirm-offset
advance + REPORT_METRICS gauges): as records stream in, each stream's
cumulative record count, payload bytes, and high-water offset advance
monotonically and are re-emitted every microbatch.

This is the SURVEY §2.9 custom-stateful seam: semantics Spark's built-in
windowed aggregations don't express (monotone per-key accumulators
emitted per batch, not per window) — implemented with
``applyInPandasWithState`` over ``groupBy(stream_id)``.  State is a
3-field tuple per stream; batches arrive as Arrow-backed pandas frames,
reduced vectorized (no per-row Python).

Scale: state is O(#streams), partitioned by stream_id across executors;
per-batch work is one vectorized reduction per stream partition — the
same distribution the log's write path uses.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "stream_id long, n_records long, n_bytes long, max_offset long"
)
STATE_SCHEMA = "n_records long, n_bytes long, max_offset long"


def _track(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, nbytes, mx = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        n += len(pdf)
        nbytes += int(pdf["payload"].map(lambda b: 0 if b is None else len(b)).sum())
        if len(pdf):
            mx = max(mx, int(pdf["offset"].max()))
    state.update((n, nbytes, mx))
    yield pd.DataFrame(
        {
            "stream_id": [key[0]],
            "n_records": [n],
            "n_bytes": [nbytes],
            "max_offset": [mx],
        }
    )


def stream_offset_tracker(records: DataFrame) -> DataFrame:
    """Apply the stateful per-stream accounting to a streaming records
    DataFrame (envelope schema); emits one row per stream per
    microbatch with the accumulated totals."""
    return records.groupBy("stream_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------- streaming heavy hitters

HH_OUTPUT_SCHEMA = (
    "stream_id long, key string, est_count long, err long, rank int"
)
HH_STATE_SCHEMA = "keys array<string>, counts array<long>, errs array<long>"
HH_CAPACITY = 64
HH_TOP = 5


def space_saving_update(
    table: dict[str, list[int]], batch_counts, capacity: int
) -> None:
    """Fold one batch's (key → count) pairs into a space-saving counter
    table ``{key: [est_count, err]}`` in place.  A new key arriving at a
    full table evicts the minimum counter and inherits its count as the
    error bound; when ``capacity ≥ |vocabulary|`` no eviction ever fires
    and every est_count is the exact count with err = 0 — the property
    the batch replay gate query (operators/streaming_ops.py) relies on.
    Shared by the streaming operator below and the batch replay."""
    for kk, c in batch_counts.items():
        c = int(c)
        if kk in table:
            table[kk][0] += c
        elif len(table) < capacity:
            table[kk] = [c, 0]
        else:
            evict = min(table.items(), key=lambda it: (it[1][0], it[0]))
            m = evict[1][0]
            del table[evict[0]]
            table[kk] = [m + c, m]


def space_saving_top(table: dict[str, list[int]], k: int) -> list:
    """Deterministic top-k of a counter table: (est_count DESC, key ASC)."""
    return sorted(table.items(), key=lambda it: (-it[1][0], it[0]))[:k]


def streaming_heavy_hitters(
    keyed: DataFrame, capacity: int = HH_CAPACITY, k: int = HH_TOP
) -> DataFrame:
    """Streaming top-k keys per stream under BOUNDED state: the
    space-saving sketch (Metwally et al., "Efficient computation of
    frequent and top-k elements in data streams") as an
    ``applyInPandasWithState`` operator.

    Input: a streaming DataFrame with (stream_id, key) columns — the
    caller derives ``key`` from the payload.  Per stream the state holds
    at most ``capacity`` (key, count, err) counters: a new key arriving
    at a full table evicts the minimum counter and INHERITS its count as
    the new key's error bound, so for every tracked key
    ``est_count - err ≤ true_count ≤ est_count`` and any key with true
    count above the evicted minimum is guaranteed present.  Each
    microbatch emits the current top-``k`` (update mode).

    The unbounded-vocabulary analogue of the batch
    ``token_heavy_hitters``: state is O(capacity · #streams) no matter
    how many distinct keys stream through — the property that lets it
    run forever at 100 TB/day.  Per batch the Python work is one
    ``value_counts`` per stream partition (vectorized) plus one dict
    merge per DISTINCT batch key, never per record.
    """

    def _sketch(
        group_key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, errs = state.get
            table: dict[str, list[int]] = {
                kk: [int(c), int(e)] for kk, c, e in zip(keys, counts, errs)
            }
        else:
            table = {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            space_saving_update(table, pdf["key"].value_counts(), capacity)
        state.update(
            (
                list(table.keys()),
                [v[0] for v in table.values()],
                [v[1] for v in table.values()],
            )
        )
        top = space_saving_top(table, k)
        yield pd.DataFrame(
            {
                "stream_id": [group_key[0]] * len(top),
                "key": [kk for kk, _ in top],
                "est_count": [v[0] for _, v in top],
                "err": [v[1] for _, v in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return keyed.groupBy("stream_id").applyInPandasWithState(
        _sketch,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
