"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus DuckDB oracle SQL.

Contract (driver, ``__spark_entry__.py``): the driver runs each query at
sf0.01 and compares row count + schema + order-insensitive value hash against
the oracle SQL run by DuckDB over the same parquet tables. Rules enforced by
convention here:

- Deterministic output only: no ``rand()``; every LIMIT/top-k has a total
  tie-break order; floats that aggregate are rounded at the end.
- A rounded float that can sit near zero needs ``+ 0.0`` AFTER the round on
  BOTH sides: DuckDB's round emits IEEE -0.0 for tiny negatives, Spark's
  emits +0.0, and the exact-repr compare distinguishes them (bit us at
  sf0.1 in udf_grouped_map). Never round integer-quotient ratios at all —
  they land on exact decimal halves where Spark's BigDecimal HALF_UP and
  DuckDB's float-multiply diverge; emit the raw IEEE division.
- Column names identical on both sides (alias everything computed).
- Timestamps/dates leave the query as formatted strings (engine-neutral).
- Queries without an oracle entry (genuinely non-SQL-expressible) get the
  driver's weaker rows-only check; keep those rare and deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL over the fixture views."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
