"""Custom stateful streaming operator on the ``transformWithState`` API
(Spark 4.x ``StatefulProcessor``): per-key running totals.

≙ the same reference seam as ``stateful.py`` (per-stream monotone
accumulators, components/replication/src/stream/replication_stream.rs
confirm-offset advance + REPORT_METRICS gauges), re-expressed on the
NEWER engine surface: ``transformWithStateInPandas`` with typed,
individually-updatable state variables (``getValueState``) instead of
``applyInPandasWithState``'s single state tuple.  Covering both APIs
matters because transformWithState is where Spark's custom-stateful
roadmap lives (timers, TTL state, multiple state variables, initial
state) — a consumer porting the reference's accounting to Spark today
should start here.

Scale: state is one (count, sum) pair per key, hash-partitioned across
executors by the grouping key; each microbatch does one vectorized
pandas reduction per key group — no per-row Python, no growth with
history (the state never stores events, only the two accumulators).

ENVIRONMENT-GATED: transformWithState's Python state server speaks a
protobuf protocol, and this container ships no ``google.protobuf``
(verified: the streaming runner dies with ``ImportError: cannot import
name 'descriptor'``; pip installs are unavailable).  The operator and
its test are real and complete — ``tests/test_streaming.py::
test_transform_with_state_running_totals`` runs the full
stream-vs-batch equivalence whenever protobuf is importable and SKIPS
otherwise, exactly like the ``decode_image`` codec seam
(operators/multimodal.py).  The ``applyInPandasWithState`` operators in
``stateful.py`` carry the custom-stateful contract on this host.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues

RT_OUTPUT_SCHEMA = "key long, n_events long, total_value double"
RT_STATE_SCHEMA = "n_events long, total_value double"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key (count, sum) accumulators re-emitted every microbatch —
    monotone n_events, state bounded at two scalars per key."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", RT_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [s]}
        )

    def close(self) -> None:  # nothing to release; state is engine-held
        pass


def stream_running_totals(df: DataFrame) -> DataFrame:
    """Apply the running-totals processor to a streaming DataFrame with
    columns (key long, value double); emits one row per key per
    microbatch with the accumulated totals."""
    return df.groupBy("key").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=RT_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
