"""Two-table as-of join: cogrouped applyInPandas + merge_asof.

Spark has no native as-of join. Two equivalent forms live in this engine:

- window form (``plans/events_q.py::ev_asof_last_purchase``): when the
  "right" series can be derived from the same table, a running conditional
  max over an ordered window does it with one shuffle and zero Python.
- this module: the general two-table case — cogroup both sides on the key,
  ``pd.merge_asof`` inside the Arrow batch. One shuffle per side; Python
  cost is per-group vectorized. The guide's recommended shape for genuinely
  heterogeneous tables (trades/quotes, events/dim-history).

Scale note: each (key)-group must fit in one Arrow batch — true for
per-user/per-symbol histories; for pathological keys pre-split by time range
and stitch the boundary rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    schema: StructType | str,
    direction: str = "backward",
    keep_right_on: str | None = None,
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (direction='backward') its ``on`` value, matched within the ``by`` group.

    ``schema`` is the output schema: left columns plus right payload columns
    (right-side name collisions arrive suffixed ``_right``). Empty right
    groups yield left rows with nulls — preserved by merge_asof.

    ``keep_right_on``: column name under which the MATCHED right row's ``on``
    value is emitted (merge_asof drops the right on-column). Copied inside
    the pandas batch — duplicating it Spark-side as an alias doesn't survive
    Catalyst, which collapses the duplicate attribute out of the cogroup.

    ``tolerance``: optional max distance between left and matched right
    ``on`` values (e.g. ``pd.Timedelta(hours=1)``); a nearest match farther
    away than this is dropped (nulls), exactly pandas' merge_asof contract —
    the trades/quotes "stale quote" cutoff.
    """

    # resolve output column names DRIVER-side: schema parsing needs an active
    # session, which the executor-side pandas worker doesn't have
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        out_cols = [f.name for f in _parse_datatype_string(schema).fields]
    else:
        out_cols = [f.name for f in schema.fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=out_cols)
        l = l.sort_values(on, kind="mergesort")
        if len(r) == 0:
            out = l.copy()
            for c in out_cols:
                if c not in out.columns:
                    out[c] = None
            return out[out_cols]
        # Tie rule (r08 review): merge_asof matches the LAST right row at an
        # equal `on` value, and a bare sort on `on` preserves the cogroup's
        # nondeterministic arrival order among ties — sort the remaining
        # columns too so the matched row is the lexicographic max of the
        # tied set, identical across runs and partitionings.
        r = r.sort_values(
            [on, *[c for c in r.columns if c != on]], kind="mergesort"
        )
        if keep_right_on:
            r = r.assign(**{keep_right_on: r[on]})
        out = pd.merge_asof(
            l,
            r,
            on=on,
            by=by,
            direction=direction,
            suffixes=("", "_right"),
            tolerance=tolerance,
        )
        return out[out_cols]

    return left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas(merge, schema)
