"""Scale patterns: skew-salted join (and the bucketing demo in tests).

At 100 TB the two join problems Catalyst cannot always solve alone are
(1) a hot key overwhelming one shuffle partition and (2) repeated
shuffles of a fact table joined on the same key.  AQE's skew-join split
handles (1) at runtime when stats surface it; this module demonstrates
the PLANNED fix — salting — as a first-class, oracle-checked operator,
so the technique ships with hash-verified semantics-neutrality instead
of living in a doc.  (2) is bucketing: ``tests/test_plans.py`` asserts
the bucketed lineitem⋈orders join runs with ZERO exchanges.

Salting (≙ the standard recipe, e.g. Spark docs' skew hints): the fact
side appends a deterministic salt in [0, SALT); the dim side explodes
×SALT; the join key becomes (key, salt), spreading each hot key over
SALT shuffle partitions.  The salt derives from ``pmod(hash(l_orderkey,
l_linenumber), SALT)`` — deterministic (no ``rand()``, so the DuckDB
oracle, the PLAIN join, must hash-match exactly) yet full-width: every
salt value in [0, SALT) occurs, so a hot key genuinely spreads over all
SALT partitions (``l_linenumber`` alone ranges 1..7 and would populate
only 7 of 16 — tests/test_plans.py asserts the actual spread).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elastic_stream_spark.sources.envelope import load_table

SALT = 16


def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority via a SALTED lineitem⋈orders join:
    join key (o_orderkey, salt), dim side exploded ×SALT, shuffle-hash
    hinted so the salt demonstrably governs the shuffle (a broadcast
    would hide it).  Result is hash-checked equal to the plain join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    fact = li.withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SALT)).cast("int")
    )
    dim = orders.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    ).withColumn("salt", F.col("salt").cast("int"))
    joined = fact.join(
        dim.hint("shuffle_hash"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (fact["salt"] == dim["salt"]),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES = {
    "skew_salted_join_revenue": skew_salted_join_revenue,
}

ORACLES = {
    # the PLAIN join: salting must be invisible in the result
    "skew_salted_join_revenue": """
        SELECT o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
}
