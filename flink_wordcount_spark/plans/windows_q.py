"""Window-function surface: ranking, analytic (lag/lead/first/last), and
aggregate-over-frame (rows / range) windows.

Every window ORDER BY here includes a unique key so results are total-ordered
and deterministic (driver hash check). Window execution shuffles once on the
partition key then sorts within partitions — at 100 TB, partition keys must be
high-cardinality (they are: custkey/orderkey) so no single partition explodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from .catalog import query


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS c_acctbal,
               CAST(row_number() OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per segment — row_number + filter, the
    standard per-group top-k without a global sort."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT p_brand, p_partkey,
           CAST(rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS BIGINT) AS rk,
           CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS BIGINT) AS drk,
           CAST(ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS BIGINT) AS quartile
    FROM part
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    w_price = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    w_size = Window.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w_price).cast("bigint").alias("rk"),
        F.dense_rank().over(w_size).cast("bigint").alias("drk"),
        F.ntile(4).over(w_price).cast("bigint").alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(date_diff('day',
                lag(o_orderdate)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev,
           lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gaps per customer (lag/lead analytic functions)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend,
           CAST(count(*) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS nth_order
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer — rows-frame running aggregate; the batch
    analog of the reference's per-key running count (StatefulWordCount.java:160)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("nth_order"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                                         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2)
               AS spend_30d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: trailing 30-day spend, keyed on epoch-day so the
    range arithmetic is engine-neutral integer math."""
    o = table(spark, sf_dir, "orders")
    epoch_day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_day)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           CAST(count(*) OVER w AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an unbounded frame, collapsed to one row per key."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_orders"),
    ).distinct()


@query(
    "window_cume_percent",
    oracle="""
    SELECT c_custkey,
           c_nationkey,
           cume_dist() OVER w AS cd,
           percent_rank() OVER w AS pr
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + percent_rank per nation. The ratios are emitted RAW
    (k/n of small exact ints is correctly-rounded identical IEEE in every
    engine — rounding them is the parity trap); the unique-key tiebreak
    makes every rank peer-free and deterministic."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )
