"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a declared query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, then compares row count, column names, and an
order-insensitive view of the values. Used by tests/test_oracle_parity.py so
mismatches surface locally before the driver's sf0.01 gate.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(x: Any) -> Any:
    import numpy as np

    if x is None:
        return None
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        # exact float compare via repr of the double value
        return repr(float(x))
    if isinstance(x, np.ndarray):  # array columns arrive as ndarrays
        return tuple(_canon_cell(v) for v in x.tolist())
    if isinstance(x, (list, tuple)):
        return tuple(_canon_cell(v) for v in x)
    return x


def canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((v is None, str(v)) for v in r))


def compare(
    spark: SparkSession, sf_dir: str, name: str, fn, sql: str | None
) -> tuple[bool, str]:
    """Returns (ok, message). If sql is None, only checks the query runs."""
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()
    if sql is None:
        return True, f"rows-only: {len(spdf)} rows"
    con = duckdb_conn(sf_dir)
    opdf = con.execute(sql).df()
    s_cols, o_cols = sorted(spdf.columns), sorted(opdf.columns)
    if s_cols != o_cols:
        return False, f"column mismatch: spark={s_cols} oracle={o_cols}"
    kinds = []
    for c in s_cols:
        sk, ok = spdf[c].dtype.kind, opdf[c].dtype.kind
        # arrow->pandas nullability wobble: ints may surface as float/object
        # when NULLs are present; treat numeric kinds as one family for the
        # kind check (values are still compared exactly below)
        num = set("iuf O")
        if sk != ok and not (sk in num and ok in num):
            kinds.append(f"{c}: spark={spdf[c].dtype} oracle={opdf[c].dtype}")
    if kinds:
        return False, "dtype kind mismatch: " + "; ".join(kinds)
    if len(spdf) != len(opdf):
        return False, f"row count mismatch: spark={len(spdf)} oracle={len(opdf)}"
    s_rows, o_rows = canon_rows(spdf), canon_rows(opdf)
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            return False, f"value mismatch at sorted row {i}:\n  spark : {a}\n  oracle: {b}"
    return True, f"match: {len(spdf)} rows x {len(s_cols)} cols"
