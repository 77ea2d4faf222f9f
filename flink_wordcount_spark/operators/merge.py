"""MERGE INTO emulation (upsert / CDC apply) without a table format.

OSS Spark without Delta/Iceberg has no transactional MERGE; the standard
emulation rewrites the target as:

    anti(target, source on key)  UNION ALL  apply(source)

- upsert: apply = source rows as-is (insert + overwrite-matched)
- CDC apply: the source is a change log (I/U/D + ordering column); collapse
  it to the LAST change per key first, drop deletes, then merge.

At 100 TB the rewrite is partition-scoped: join source keys against the
target's partition values and rewrite only affected partitions (dynamic
partition overwrite), not the whole table. The logic below is the per-slice
kernel of that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Rows from source win on key collisions; unmatched target rows kept."""
    return target.join(source, key, "left_anti").unionByName(source)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply an insert/update/delete change log to the target.

    ``changes`` carries (key, payload..., op in {'I','U','D'}, seq). The last
    change per key (by seq, ties broken arbitrarily-but-deterministically by
    op) decides: D removes the key, I/U upserts its payload.
    """
    w = Window.partitionBy(key).orderBy(F.desc(seq_col), F.desc(op_col))
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = last.filter(F.col(op_col) != "D").drop(op_col, seq_col)
    deletes = last.filter(F.col(op_col) == "D").select(key)
    survivors = target.join(last.select(key), key, "left_anti")
    _ = deletes  # deleted keys simply don't re-enter via upserts
    return survivors.unionByName(upserts)
