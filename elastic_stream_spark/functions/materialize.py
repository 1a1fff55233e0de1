"""Eager in-memory materialization for reused intermediate tables.

``materialize(df)`` = ``persist(MEMORY_AND_DISK_DESER)`` + a count action,
used for the dedup-family intermediates every consumer reads 2-6× (the
shingle index, minhash bands, simhash signatures, LSH signatures).

Why persist and not ``localCheckpoint``: both store the partitions in the
block manager, but localCheckpoint serializes every row into checkpoint
blocks through a dedicated eager job — measured as the common factor in
the dedup family's 3.4-5.4× run-to-run spread (multi-second stalls inside
the checkpoint jobs, r5 VERDICT "What's wrong" #3) — while persist keeps
the deserialized columnar batches in storage memory, spilling only under
pressure, with no extra serialization pass.  Lineage is retained (an
evicted block recomputes instead of failing), which is the right trade
for these derived tables; iterative lineage TRUNCATION (the CC fixpoint,
session memos that must outlive ``spark.catalog.clearCache()``) still
uses localCheckpoint.

Cached entries register with Spark's CacheManager keyed by canonicalized
plan, so re-running an identical query reuses the cache — bench.py calls
``clearCache()`` between timed samples so construction queries measure
the build, not a cache hit.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    out = df.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    out.count()
    return out
