"""Vector column functions over ``array<float>`` embeddings.

All JVM-side higher-order functions (zip_with / aggregate) — no Python
boundary, so brute-force scoring runs inside whole-stage codegen.  Inputs
are cast to ``array<double>`` before arithmetic so results are bitwise
comparable with the DuckDB oracle (both engines then do the same IEEE
double ops in the same element order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(_d(a), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """DuckDB oracle: ``list_cosine_similarity(CAST(a AS DOUBLE[]),
    CAST(b AS DOUBLE[]))`` — formula differences are ~1e-16 relative and
    vanish under round(·, 6)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit(a: Column) -> Column:
    """L2-normalized copy of the vector.  Pre-normalizing once per row
    turns pairwise cosine into a single dot per pair — the only sane shape
    for pairwise scoring (higher-order fns are interpreted, not
    codegen'd, so per-pair work must be minimal)."""
    n = l2_norm(a)
    return F.transform(_d(a), lambda x: x / n)
