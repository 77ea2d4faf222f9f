"""Size-gated join hints.

An unconditional ``F.broadcast()`` bypasses
``spark.sql.autoBroadcastJoinThreshold``: fine for constant-cardinality
dimensions (nation has 25 rows and region 5 at every scale factor) but a
multi-TB OOM at the 100 TB design point for SF-scaling dimensions — TPC-H's
customer/part/supplier grow linearly with SF. ``maybe_broadcast`` hints only
when Catalyst's own size estimate for the sub-plan sits below the session
threshold; above it the hint is dropped and the join falls back to a shuffle
join, which AQE's dynamic broadcast conversion can still upgrade at runtime
from observed shuffle sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_UNITS = {
    "tb": 1 << 40,
    "gb": 1 << 30,
    "mb": 1 << 20,
    "kb": 1 << 10,
    "t": 1 << 40,
    "g": 1 << 30,
    "m": 1 << 20,
    "k": 1 << 10,
    "b": 1,
}


def _threshold_bytes(spark: SparkSession) -> int:
    """Parse autoBroadcastJoinThreshold ('-1', '67108864', '64MB', ...)."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    for suffix, mult in _UNITS.items():
        if raw.endswith(suffix):
            try:
                return int(float(raw[: -len(suffix)]) * mult)
            except ValueError:
                return -1
    try:
        return int(raw)
    except ValueError:
        return -1


def shuffle_partitions(spark: SparkSession) -> int:
    """``spark.sql.shuffle.partitions`` as an int, or defaultParallelism.

    ADVICE r15: the conf can be non-numeric on some platforms ("auto");
    a bare ``int(...)`` at plan-construction time would crash the query.
    """
    try:
        return int(str(spark.conf.get("spark.sql.shuffle.partitions")))
    except (ValueError, TypeError):
        return spark.sparkContext.defaultParallelism


def estimated_plan_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate (None if unavailable).

    The same statistic the planner itself uses for auto-broadcast decisions:
    file sizes for scans, propagated through filters/projections. Driver-side
    only — does not execute the plan.
    """
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def spread(df: DataFrame, min_bytes_per_task: int = 8 << 20) -> DataFrame:
    """Round-robin repartition a SMALL input across the cluster before
    CPU-heavy per-row work (char-gram explodes, per-token hashing, SimHash
    bit sums, Levenshtein) — and a NO-OP for inputs big enough to already
    parallelize.

    Why (guide §2.5): Spark splits a parquet scan by byte ranges, but rows
    land in the task holding their ROW GROUP — a table written as a single
    row group (any sub-128 MB file under default writer settings) is one
    working task no matter how many splits the planner makes, so heavy
    per-row compute layered directly on the scan serializes onto one core.
    The fix is one tiny round-robin shuffle of the (projected) input before
    the expensive map work.

    Scale-adaptivity: when Catalyst's own size estimate for the sub-plan is
    at least ``defaultParallelism * min_bytes_per_task`` (i.e. every core
    already has >= ~8 MB of scan to chew), the input is left untouched — at
    the 100 TB design point this returns ``df`` unchanged and no shuffle is
    added; the repartition only fires for inputs too small for the scan
    itself to spread, where the shuffle it adds is by construction tiny
    (est < cores * 8 MB).
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    est = estimated_plan_bytes(df)
    # ADVICE r15: treat an UNAVAILABLE estimate as "large" — fail safe, like
    # maybe_broadcast declining its hint.  A missing estimate on a
    # corpus-sized scan must not buy a full-corpus round-robin shuffle.
    if est is None or est >= cores * min_bytes_per_task:
        return df
    return df.repartition(cores)


def maybe_broadcast(df: DataFrame) -> DataFrame:
    """Broadcast-hint ``df`` iff its estimated size is under the threshold.

    Use for any join side whose cardinality scales with the data (customer,
    part, supplier, lists derived from facts). Keep plain ``F.broadcast``
    only for constant-cardinality sides: nation, region, single-row
    aggregates.
    """
    thr = _threshold_bytes(df.sparkSession)
    if thr <= 0:
        return df
    est = estimated_plan_bytes(df)
    if est is not None and est <= thr:
        return F.broadcast(df)
    return df
