"""Table IO over the driver fixtures.

All reads go through ``table()`` so every query gets: UTC session timezone
(oracle parity), parquet scans with Catalyst pushdown/pruning, and a single
place to swap in bucketed/partitioned layouts at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Keyed on applicationId (not id(): a stopped session's id can be reused by a
# new object, which would then serve stale plans — and a weak-keyed dict won't
# work either, because cached DataFrames strongly reference their session).
# Bounded: only the most recent few applications' caches are retained.
_CACHE: dict[str, dict[tuple[str, str], DataFrame]] = {}
_CACHE_MAX_APPS = 4


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TimestampType across fixture vintages.

    The driver has shipped ``ts`` both as parquet TIMESTAMP(NANOS) — which
    Spark reads as a raw nanos ``bigint`` under ``nanosAsLong`` (see
    session.RUNTIME_CONFS) — and as TIMESTAMP(MICROS), which Spark reads as
    ``timestamp_ntz``. Both become session-tz (UTC) micros timestamps, so
    every downstream window/watermark/oracle comparison is vintage-agnostic.
    Nanos use integer ``div``, not float math: 2024 epoch-nanos (~1.7e18)
    exceed double's 2^53 exact-integer range.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt != "timestamp":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one fixture table.

    Column pruning and predicate pushdown are Catalyst's job — callers
    ``select``/``filter`` declaratively and the scan narrows (verify with
    ``.explain``: ``ReadSchema``/``PushedFilters``).

    The returned DataFrame (an immutable logical plan) is memoized per
    (session, dir, table): re-reading skips the file listing + footer schema
    read (~0.5-1 s of driver time per call, paid 100+ times in a verify run).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    app_id = spark.sparkContext.applicationId
    per_session = _CACHE.setdefault(app_id, {})
    while len(_CACHE) > _CACHE_MAX_APPS:  # evict oldest app's plans
        _CACHE.pop(next(iter(k for k in _CACHE if k != app_id)))
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    per_session[key] = df
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [table(spark, sf_dir, n) for n in names]


def write_compacted(
    df: DataFrame, path: str, by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Write parquet with AQE-governed output compaction (the small-files fix).

    ``hint("rebalance")`` lets AQE split oversized and coalesce undersized
    shuffle partitions to ``spark.sql.adaptive.advisoryPartitionSizeInBytes``
    before the write — at 100 TB this is what keeps a 10k-task job from
    emitting 10k tiny files per partition directory, without a driver-side
    count() to pick a repartition factor.  Pass ``by`` to additionally
    cluster rows by key (range-style locality for downstream scan pruning);
    skewed keys are safe — REBALANCE splits hot partitions, unlike
    repartition(cols) which would hotspot them.
    """
    from pyspark.sql import functions as F

    hinted = df.hint("rebalance", *[F.col(c) for c in by]) if by else df.hint("rebalance")
    hinted.write.mode(mode).parquet(path)
