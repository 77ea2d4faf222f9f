"""SparkSession construction and tuning for the engine.

The driver may hand us an existing session; ``tune()`` applies the runtime
confs that are safe to set post-creation (timezone, AQE, shuffle sizing).
``get_spark()`` builds a local session with the full config for tests/bench.

Scale notes (100 TB / 1000-executor design):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast conversion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; at cluster
  scale set it ~2-3x total cores and let AQE coalesce.
- Session timezone is pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive UTC) and are cluster-independent.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

# Runtime-settable confs (safe on a live session).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # r15 (guide §3.1/§9): let the planner pick shuffled-hash join when its
    # size conditions hold (build side fits a per-partition hash map), and
    # let AQE rewrite sort-merge -> shuffled-hash at runtime when every
    # post-shuffle partition is under 64 MB.  Both paths are size-gated, so
    # a corpus-scaling build side still gets sort-merge's graceful spill;
    # the win is skipping the sort on bounded id-list/dimension joins
    # (measured at sf0.1: curation_end_to_end -0.9 s, suite total ~-1 s;
    # plan diff: the funnel's SortMergeJoins become ShuffledHashJoins).
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # r15 (guide §6 §1.2): file-split sizing is maxSplitBytes =
    # min(maxPartitionBytes, max(openCostInBytes, totalBytes/minPartitionNum)).
    # With the 4 MB default openCost, any table under 4 MB is ONE scan task —
    # and this engine runs heavy per-row JVM compute (trigrams, simhash bit
    # sums, char-gram explodes) directly over map-side/broadcast-joined scan
    # stages, so a sub-4 MB parquet serialized whole queries onto one core of
    # 32 (measured: the md5-simhash fingerprint stage 3.2 s -> 0.4 s at
    # sf0.1).  64 KB keeps small inputs split near totalBytes/parallelism
    # while leaving large-file behavior untouched (at 100 TB,
    # totalBytes/minPartitionNum >> maxPartitionBytes, so splits stay
    # maxPartitionBytes-sized; openCost only stops tiny-file packing from
    # under-splitting).  Env-overridable for cluster tuning.
    "spark.sql.files.openCostInBytes": os.environ.get(
        "SPARK_GRAFT_OPEN_COST_BYTES", str(64 * 1024)
    ),
    # r15 (guide §2.2): AQE coalesces post-shuffle partitions by BYTES
    # (advisory 64 MB, floor = this conf), but bytes are a poor proxy for
    # work in an engine whose post-shuffle stages run heavy per-row CPU:
    # a few hundred KB of candidate pairs coalesce to ONE partition and the
    # verify stage serializes onto one core.  A global 16k floor was A/B'd
    # as the fix and REJECTED: interleaved fresh-process sweeps (2x each
    # config, min-of-4) showed it wins only on the two RHP cosine-verify
    # queries (-36/-51%) while costing +17-35% across the minhash/simhash
    # family (many small exchanges -> hundreds of tiny tasks x many stages
    # of scheduler overhead).  The verify stages that need spreading get an
    # explicit pair-key REPARTITION_BY_NUM instead (dedup_edit_distance,
    # dedup_embed_cosine, embed_hard_negatives), which AQE never coalesces.
    # The floor stays at Spark's default, env-overridable for cluster tuning.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "SPARK_GRAFT_MIN_PARTITION_SIZE", "1m"
    ),
    # Some fixture vintages store events.ts as TIMESTAMP(NANOS); Spark lacks
    # a nanos timestamp type, so read those as long — io.normalize_event_ts
    # converts to micros timestamps for every vintage (floor-truncated exactly
    # like DuckDB's ns->us read). Harmless when the fixture is already micros.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


# Weak so a dead session can't alias a new one that reuses its id() (the
# round-3 id()-keyed set could mark a brand-new session as already tuned).
_TUNED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent).

    Applied once per session object: each conf.set is a py4j round-trip and
    ``tune`` sits on the per-table read path, so re-applying per query adds
    measurable driver time across a 100+-query verify run.
    """
    if spark in _TUNED:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the host session; proceed with its value
    _TUNED.add(spark)
    return spark


def get_spark(app_name: str = "flink_wordcount_spark", cpus: int | None = None) -> SparkSession:
    """Local session used by tests and bench.py.

    ``SPARK_GRAFT_CPUS`` (default 32) controls local parallelism; shuffle
    partitions are sized to the core count — at tiny scale factors AQE
    coalesces further, at large SFs raise it via conf.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = tune(builder.getOrCreate())
    # Non-local master: ship the package zip to executors (the Python
    # DataSource / stateful processors unpickle by reference and must
    # import flink_wordcount_spark worker-side). No-op on local[*].
    from .packaging import ship_package

    ship_package(spark)
    return spark
