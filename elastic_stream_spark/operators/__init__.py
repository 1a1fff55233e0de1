"""Operator registry.

Each operator module exposes:
- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]``  (DuckDB-runnable ANSI SQL; a key absent here
  marks the operator non-SQL-expressible → driver does a rows-only check)

``all_queries()`` / ``all_oracles()`` merge every module for
``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from elastic_stream_spark.operators import (
        curation,
        dedup,
        multimodal,
        pipeline,
        relational,
        relational_ext,
        relational_tpch,
        similarity,
        stream_ops,
        streaming_ops,
        text,
    )

    return [
        stream_ops,
        relational,
        relational_ext,
        relational_tpch,
        dedup,
        pipeline,
        similarity,
        text,
        curation,
        streaming_ops,
        multimodal,
    ]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict = {}
    for m in _modules():
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict = {}
    for m in _modules():
        out.update(m.ORACLES)
    return out
