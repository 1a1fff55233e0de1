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
