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
    change per key (by seq, ties broken deterministically by op and then by
    EVERY payload column descending — a total order, so two conflicting
    changes with equal seq and op resolve identically across runs and
    partitionings; r08 review: the old (seq, op) order left full ties to
    shuffle arrival) decides: D removes the key, anything else upserts its
    payload.  An op outside {'I','U','D'} (including NULL) is treated as an
    upsert, NOT a delete: the delete predicate is null-safe, so malformed
    change rows surface in the output instead of silently erasing the key.
    """
    payload_cols = [c for c in changes.columns if c not in (key, op_col, seq_col)]
    order = [F.desc(seq_col), F.desc(op_col)] + [F.desc(c) for c in payload_cols]
    w = Window.partitionBy(key).orderBy(*order)
    last = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = last.filter(~F.col(op_col).eqNullSafe("D")).drop(op_col, seq_col)
    survivors = target.join(last.select(key), key, "left_anti")
    return survivors.unionByName(upserts)
