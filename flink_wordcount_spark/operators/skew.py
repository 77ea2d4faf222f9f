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
    out = salted_measures(df, key, {"cnt": F.count(F.lit(1))}, salt_buckets)
    return out.withColumn("cnt", F.col("cnt").cast("bigint"))


def salted_measures(
    df: DataFrame,
    key: str,
    measures: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact per-key sums/counts for SEVERAL measures in ONE salted
    two-phase pass — one scan, one (key, salt) shuffle, one salt_buckets-
    rows-per-key reduce, however many measures ride along (review r08:
    computing each measure with its own salted pass doubles the fact-table
    I/O for no exactness gain).  Each measure must be sum-re-aggregatable
    (sum/count); the phase-2 combine is always SUM of the phase-1 partials.
    """
    _assert_no_salt_column(df)
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(
        *[m.alias(f"__p_{name}") for name, m in measures.items()]
    )
    return partial.groupBy(key).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in measures]
    )


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
    return salted_measures(df, key, {"total": F.sum(measure)}, salt_buckets)


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
