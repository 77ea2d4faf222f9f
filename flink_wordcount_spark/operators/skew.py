"""Skew mitigation: salted two-phase aggregation.

The reference ships a dormant hot-key knob (RandomSentenceGenerator.java:47-53
emits the literal word "skew" with probability p) — at 100 TB a hot key turns
the word-hash exchange into a single straggler partition. Two mitigations:

1. AQE skew handling (on by default in session.py) — splits oversized
   shuffle partitions for joins.
2. Salting (this module) — for aggregations: split each key into S salt
   buckets, aggregate partially per (key, salt), then aggregate the S
   partials. Shuffle row count for the hot key drops from N to S; the
   second exchange carries one row per (key, salt).

Salted aggregation is exact for any commutative re-aggregatable measure
(sum/count/min/max); it composes as  final_agg(partial_agg(key, salt)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Exact per-key count via two-phase salted aggregation.

    Phase 1 shuffles on (key, salt) — the hot key spreads across
    ``salt_buckets`` reducers; phase 2 shuffles ``salt_buckets`` rows per key.
    The salt is random-per-row (spray), which is safe for counts because
    addition is commutative; for non-decomposable aggregates use a
    deterministic salt (hash of a secondary column) instead.
    """
    _assert_no_salt_column(df)
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").cast("bigint").alias("cnt"))


def _assert_no_salt_column(*dfs: DataFrame) -> None:
    """``__salt`` is this module's scratch column; withColumn/explode would
    silently overwrite (and the final drop remove) a caller column of the
    same name, corrupting results instead of failing loudly."""
    for df in dfs:
        if "__salt" in df.columns:
            raise ValueError(
                "input already has a '__salt' column; rename it before "
                "using the salted operators"
            )


def salted_agg(df: DataFrame, key: str, measure: Column, salt_buckets: int = 16) -> DataFrame:
    """Exact per-key SUM of ``measure`` with the same two-phase shape."""
    _assert_no_salt_column(df)
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(F.sum(measure).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias("total"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Skew join via salting: spread a hot join key across ``salt_buckets``
    reducers by replicating the dim side per salt value and salting the fact
    side per-row.

    Exact for any join where ``dim`` is unique on ``key``: each fact row
    meets its dim row exactly once, under whichever salt it drew. The salt is a
    deterministic hash of ``salt_on`` (pass a high-cardinality fact column,
    e.g. the fact PK; defaults to the join key, which spreads only if the
    key itself is high-cardinality) so speculative re-execution re-derives
    the same salt. This is the manual form of what AQE skew-join
    does at runtime; declared here for plans that must pin the shape (e.g.
    when the skew is known and the dim is too big to broadcast but cheap to
    replicate S times).
    """
    _assert_no_salt_column(fact, dim)
    salt_col = F.pmod(F.xxhash64(F.col(salt_on if salt_on else key)), F.lit(salt_buckets))
    fact_s = fact.withColumn("__salt", salt_col.cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return fact_s.join(dim_s, [key, "__salt"]).drop("__salt")
