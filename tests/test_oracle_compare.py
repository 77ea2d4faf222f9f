"""Tests for the comparator in ``flink_wordcount_spark.oracle`` — the guard
that decides parity locally before the driver's gate.

The scariest failure class is a FALSE OK: a comparator that canonicalizes
too aggressively would wave through real engine divergences (the -0.0 and
NaN conventions the catalog's rounding rules exist for).  Each test feeds
``compare`` a hand-built Spark frame against a literal DuckDB SELECT and
asserts the verdict — both directions.
"""

from __future__ import annotations

from flink_wordcount_spark.oracle import compare


def _fn(df):
    return lambda spark, sf_dir: df


def test_identical_frames_match(spark, sf_dir):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", -2.0)], "k long, s string, v double")
    ok, msg = compare(
        spark, sf_dir, "t", _fn(df),
        "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a', 1.5), (2, 'b', -2.0)) t(k, s, v)",
    )
    assert ok, msg


def test_row_and_column_order_are_irrelevant(spark, sf_dir):
    df = spark.createDataFrame([(2, "b"), (1, "a")], "k long, s string")
    ok, msg = compare(
        spark, sf_dir, "t", _fn(df),
        "SELECT 'a' AS s, CAST(1 AS BIGINT) AS k UNION ALL SELECT 'b', 2",
    )
    assert ok, msg


def test_negative_zero_is_distinguished(spark, sf_dir):
    """-0.0 vs 0.0 must MISMATCH: the repo's `+ 0.0` guards exist precisely
    because the exact-repr compare tells them apart."""
    df = spark.createDataFrame([(-0.0,)], "v double")
    ok, _ = compare(spark, sf_dir, "t", _fn(df), "SELECT 0.0::DOUBLE AS v")
    assert not ok


def test_nan_equals_nan_and_float_null_conflates(spark, sf_dir):
    """NaN == NaN by design (canon maps it to a sentinel).  DOCUMENTED
    LIMITATION: the pandas bridge renders NULL::DOUBLE as NaN on BOTH
    engines (DuckDB .df() and Spark toPandas alike), so NULL-vs-NaN inside
    a float column is invisible to the comparator.  The conflation is
    symmetric — it cannot produce a one-sided false green — and the
    catalog's conventions keep NaN out of declared outputs (guards and
    rounding), but if that ever changes this test is the reminder that the
    comparator will not see the difference."""
    df_nan = spark.createDataFrame([(float("nan"),)], "v double")
    ok, msg = compare(
        spark, sf_dir, "t", _fn(df_nan), "SELECT 'NaN'::DOUBLE AS v"
    )
    assert ok, msg
    ok, _ = compare(
        spark, sf_dir, "t", _fn(df_nan), "SELECT NULL::DOUBLE AS v"
    )
    assert ok  # the conflation documented above — symmetric on both engines


def test_row_count_mismatch_fails(spark, sf_dir):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    ok, msg = compare(
        spark, sf_dir, "t", _fn(df), "SELECT CAST(1 AS BIGINT) AS k"
    )
    assert not ok and "row count" in msg


def test_column_name_mismatch_fails(spark, sf_dir):
    df = spark.createDataFrame([(1,)], "k long")
    ok, msg = compare(
        spark, sf_dir, "t", _fn(df), "SELECT CAST(1 AS BIGINT) AS other"
    )
    assert not ok and "column" in msg


def test_numeric_vs_string_kind_fails(spark, sf_dir):
    """A bigint column against a VARCHAR oracle column must fail the dtype
    kind check even when the stringified values would sort identically."""
    df = spark.createDataFrame([(1,)], "k long")
    ok, msg = compare(spark, sf_dir, "t", _fn(df), "SELECT '1' AS k")
    assert not ok


def test_array_columns_compare_elementwise(spark, sf_dir):
    df = spark.createDataFrame([([1, 2, 3],)], "a array<long>")
    ok, msg = compare(spark, sf_dir, "t", _fn(df), "SELECT [1, 2, 3]::BIGINT[] AS a")
    assert ok, msg
    ok, _ = compare(spark, sf_dir, "t", _fn(df), "SELECT [1, 2, 4]::BIGINT[] AS a")
    assert not ok


def test_value_mismatch_reports_rows(spark, sf_dir):
    df = spark.createDataFrame([(1, 10.0)], "k long, v double")
    ok, msg = compare(
        spark, sf_dir, "t", _fn(df),
        "SELECT CAST(1 AS BIGINT) AS k, 10.5::DOUBLE AS v",
    )
    assert not ok and "value mismatch" in msg
