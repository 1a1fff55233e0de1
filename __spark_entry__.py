"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``    — every implemented operator from SURVEY.md §2 (+ the
                   north-star LLM-pipeline operators), keyed by name.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents; keys absent here
                   are non-SQL-expressible (driver does rows-only check).

Implementation lives in ``elastic_stream_spark``; this module only adapts
it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: stream-envelope tumbling-window aggregation (the
    reference's append→fetch log expressed as a windowed analytics query)
    at sf0.001."""
    from elastic_stream_spark.operators.streaming_ops import tumbling_window_counts

    return tumbling_window_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from elastic_stream_spark.operators import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from elastic_stream_spark.operators import all_oracles

    return all_oracles()
