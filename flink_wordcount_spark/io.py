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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one fixture table.

    Column pruning and predicate pushdown are Catalyst's job — callers
    ``select``/``filter`` declaratively and the scan narrows (verify with
    ``.explain``: ``ReadSchema``/``PushedFilters``).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [table(spark, sf_dir, n) for n in names]
