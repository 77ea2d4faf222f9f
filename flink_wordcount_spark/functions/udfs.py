"""UDF implementations for the declared UDF surface (SURVEY §2.2 row
'UDF/UDAF/UDTF').

Guidance encoded here (and enforced by the benchmarks): built-in expressions
first; when Python is genuinely required, Arrow-vectorized ``pandas_udf``
(one serde per batch) — row-at-a-time ``udf`` exists for API parity and is
deliberately confined to tiny projections.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType


def _label_part(brand, size):
    return f"{brand}:{size:03d}"


#: Row-at-a-time Python UDF (API parity; slow path by design). Wrapped
#: without annotations: Arrow-optimized udf infers eval type from hints and
#: warns on plain-python ones.
label_part = F.udf(_label_part, StringType())


@F.pandas_udf(DoubleType())
def net_price(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Arrow-vectorized scalar UDF: elementwise float64 arithmetic is
    bit-identical to the SQL expression, so it stays oracle-checkable."""
    return price * (1.0 - discount) * (1.0 + tax)


@F.pandas_udf(LongType())
def distinct_count_agg(keys: pd.Series) -> int:
    """Grouped-aggregate pandas UDF: exact distinct count (integer-exact,
    engine-neutral — no float accumulation ordering to worry about)."""
    return int(keys.nunique())


def register_sql_udfs(spark) -> None:
    """SQL-registered UDF surface: usable from spark.sql text."""
    spark.udf.register(
        "price_bucket",
        lambda p: int(p // 10000) if p is not None else None,
        LongType(),
    )


@F.pandas_udf(DoubleType())
def net_price_iter(
    batches: Iterator[tuple[pd.Series, pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    """SCALAR_ITER pandas UDF: identical arithmetic to :func:`net_price`,
    but the iterator form — the shape used when per-worker initialization
    (loading a model/tokenizer once per executor, not once per batch) must
    amortize across Arrow batches. The "init" here is a constant factor so
    the result stays bit-identical and oracle-checkable."""
    one = 1.0  # stands in for the once-per-worker expensive setup
    for price, discount, tax in batches:
        yield price * (one - discount) * (one + tax)
