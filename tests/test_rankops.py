"""Contract tests for operators/rankops.py: the grid-partitioned two-phase
global rank / ntile must agree BIT-FOR-BIT with the engine's own
single-partition window on awkward frame sizes — remainder buckets
(N % k != 0), N < k, heavy key ties (broken by the tiebreak column), and
constant keys (the lo == hi degenerate grid)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from flink_wordcount_spark.operators.rankops import (
    global_ntile,
    with_global_rank,
)


def _frame(spark, n: int, tie_every: int = 1):
    """n rows with key = id // tie_every (ties when tie_every > 1)."""
    return spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") % 7 * 13 % 11).alias("scr"),  # scrambled, many ties
        (F.floor(F.col("id") / tie_every)).alias("key"),
    )


def test_global_rank_matches_window_row_number(spark):
    for n, tie in [(1, 1), (7, 1), (23, 3), (100, 10)]:
        for desc in (False, True):
            df = _frame(spark, n, tie)
            order = [F.desc("key") if desc else F.asc("key"), F.asc("rid")]
            want = df.withColumn(
                "rank", F.row_number().over(Window.orderBy(*order)).cast("bigint")
            )
            got = with_global_rank(df, "key", "rid", descending=desc, n_ranges=5)
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, want.collect())
            ), (n, tie, desc)


def test_global_ntile_matches_window_ntile(spark):
    # sizes straddling every remainder case: N % k in {0, 1, k-1}, N < k
    for n in (1, 3, 5, 7, 10, 11, 23, 50, 101):
        for k in (5, 10):
            for desc in (False, True):
                df = _frame(spark, n, tie_every=3)
                order = [F.desc("scr") if desc else F.asc("scr"), F.asc("rid")]
                want = df.withColumn(
                    "t", F.ntile(k).over(Window.orderBy(*order)).cast("bigint")
                )
                got = global_ntile(
                    df, "scr", k, "rid", descending=desc, out="t", n_ranges=4
                )
                assert sorted(map(tuple, got.collect())) == sorted(
                    map(tuple, want.collect())
                ), (n, k, desc)


def test_constant_key_degenerate_grid(spark):
    """lo == hi: every row lands in pid 0; rank must still be exact."""
    df = spark.range(13).select(F.col("id").alias("rid"), F.lit(4.2).alias("key"))
    got = with_global_rank(df, "key", "rid", rank_col="rank")
    rows = {r.rid: r.rank for r in got.collect()}
    assert rows == {i: i + 1 for i in range(13)}


def test_rank_plan_has_no_corpus_single_partition(spark, sf_dir):
    """The point of the operator: the user-cardinality frames in the decile /
    RFM queries never cross an Exchange SinglePartition.  Every
    SinglePartition exchange in their plans must sit over the per-range
    grid aggregate (<= N_RANGES rows, hashpartitioning(pid) below it), the
    shard_by_token_budget-approved shape."""
    import re

    from flink_wordcount_spark.plans import QUERIES

    for q in ("ev_user_value_deciles", "ev_rfm_segmentation"):
        plan = QUERIES[q](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Window \[ntile", plan), q  # rewrite really landed
        for m in re.finditer(r"Exchange SinglePartition", plan):
            # The exchange's direct child is the next plan line: allowed
            # inputs are a scalar partial aggregate (keys=[], one row per
            # task — the min/max stats frame) or the grid-keyed per-range
            # aggregate/window (<= N_RANGES rows).
            child = plan[m.end():].split("\n", 2)[1]
            assert (
                "HashAggregate(keys=[]" in child or "_gr_pid" in child
            ), (q, "SinglePartition exchange over a corpus-scaling frame", child)


def test_global_rank_matches_window_with_null_keys(spark):
    """NULL order keys must land exactly where the engine's window puts
    them (F.asc = NULLS FIRST, F.desc = NULLS LAST) — the r08 review's
    repro: under descending=True a NULL key used to fall into pid 0 (the
    TOP bucket) and shift every non-null rank."""
    rows = [(1, 10.0), (2, None), (3, 5.0), (4, 20.0), (5, None)]
    df = spark.createDataFrame(rows, "rid bigint, key double")
    for desc in (False, True):
        order = [F.desc("key") if desc else F.asc("key"), F.asc("rid")]
        want = df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("bigint")
        )
        got = with_global_rank(df, "key", "rid", descending=desc, n_ranges=5)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), desc


def test_global_rank_all_null_and_empty_frames(spark):
    all_null = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "rid bigint, key double"
    )
    got = with_global_rank(all_null, "key", "rid", descending=True, n_ranges=5)
    want = all_null.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("key"), F.asc("rid")))
        .cast("bigint"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    empty = all_null.filter(F.lit(False))
    got_empty = with_global_rank(empty, "key", "rid", count_col="n")
    assert got_empty.collect() == []


def test_global_ntile_with_null_keys_matches_engine(spark):
    rows = [(i, float(i % 4) if i % 5 else None) for i in range(1, 24)]
    df = spark.createDataFrame(rows, "rid bigint, key double")
    want = df.withColumn(
        "tile",
        F.ntile(4).over(Window.orderBy(F.desc("key"), F.asc("rid"))).cast("bigint"),
    )
    got = global_ntile(df, "key", 4, "rid", descending=True, out="tile", n_ranges=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ntile_formula_matches_engine_across_nk_grid(spark):
    """The canonical-remainder closed form (ntile_from_rank) must equal the
    engine's ntile for EVERY (rank, n, k) — swept as one Spark job over a
    dense grid: n in 1..40, k in {2,3,4,5,7,10,16}, rank in 1..n.  The
    engine side computes ntile(k) per (n, k) frame via a window; the
    formula side is the pure expression.  Any off-by-one in the remainder
    head (the floor((rank-1)*k/n)+1 trap the docstring warns about) fails
    here on the first non-dividing pair."""
    from flink_wordcount_spark.operators.rankops import ntile_from_rank

    ks = [2, 3, 4, 5, 7, 10, 16]
    rows = [
        (n, k, r)
        for n in range(1, 41)
        for k in ks
        for r in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "n int, k int, rank int")
    got = {
        (r["n"], r["k"], r["rank"]): r["tile"]
        for k in ks
        for r in df.filter(F.col("k") == k)
        .withColumn("tile", ntile_from_rank(F.col("rank"), F.col("n"), k))
        .collect()
    }
    for k in ks:
        frame = df.filter(F.col("k") == k)
        w = Window.partitionBy("n").orderBy("rank")
        want = frame.withColumn("tile", F.ntile(k).over(w).cast("bigint"))
        for r in want.collect():
            assert got[(r["n"], k, r["rank"])] == r["tile"], (r["n"], k, r["rank"])


def test_global_rank_matches_window_with_nan_and_inf(spark):
    """NaN and +/-Inf keys must (a) rank exactly where Spark's window sorts
    them (NULL, -Inf, finite, +Inf, NaN ascending) and (b) NOT poison the
    grid: one NaN used to turn the bounds into width=NaN, collapsing every
    row into a single pid (r08 review)."""
    nan, inf = float("nan"), float("inf")
    rows = [
        (1, 10.0), (2, nan), (3, 5.0), (4, inf), (5, -inf),
        (6, None), (7, 20.0), (8, 1.0), (9, 30.0), (10, 15.0),
    ]
    df = spark.createDataFrame(rows, "rid bigint, key double")
    for desc in (False, True):
        order = [F.desc("key") if desc else F.asc("key"), F.asc("rid")]
        want = df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("bigint")
        )
        # compare (rid, rank) pairs — tuple equality on the key column
        # would fail on NaN != NaN even for identical results
        w = sorted((r["rid"], r["rank"]) for r in want.collect())
        g = sorted((r["rid"], r["rank"]) for r in got_rows(df, desc))
        assert g == w, desc


def got_rows(df, desc):
    return with_global_rank(df, "key", "rid", descending=desc, n_ranges=4).collect()
