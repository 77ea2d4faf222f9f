"""SQL-API surface: queries authored as SQL text over registered views —
subqueries (scalar / IN / correlated EXISTS), CTEs, and a TPC-H Q12 shape.

The engine side goes through ``spark.sql`` (same Catalyst plans as the
DataFrame API — this module proves the SQL entry point, not new operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import table
from .catalog import query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "sql_q12_priority_lines",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_linestatus
    """,
)
def sql_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority class counts for slow shipments), via SQL."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT l.l_linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
        GROUP BY l.l_linestatus
        """
    )


@query(
    "sql_scalar_subquery",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 3 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > 3 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "sql_in_subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (
        SELECT s_nationkey FROM supplier GROUP BY s_nationkey HAVING count(*) >= 3
    )
    """,
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (planned as a left-semi join on the aggregated inner)."""
    _views(spark, sf_dir, "customer", "supplier")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (
            SELECT s_nationkey FROM supplier GROUP BY s_nationkey HAVING count(*) >= 3
        )
        """
    )


@query(
    "sql_exists_correlated",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey
          AND l.l_shipdate >= TIMESTAMP '2000-01-01'
          AND l.l_quantity > 45
    )
    """,
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (decorrelated by Catalyst into a semi join)."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part p
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_partkey = p.p_partkey
              AND l.l_shipdate >= TIMESTAMP '2000-01-01'
              AND l.l_quantity > 45
        )
        """
    )


@query(
    "sql_cte_top_supplier",
    oracle="""
    WITH supp_rev AS (
        SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY l_suppkey
    ), ranked AS (
        SELECT s.s_nationkey, s.s_name, r.revenue,
               row_number() OVER (PARTITION BY s.s_nationkey
                                  ORDER BY r.revenue DESC, s.s_suppkey) AS rn
        FROM supp_rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    )
    SELECT s_nationkey, s_name, revenue FROM ranked WHERE rn = 1
    """,
)
def sql_cte_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE chain + window: top revenue supplier per nation."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH supp_rev AS (
            SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem GROUP BY l_suppkey
        ), ranked AS (
            SELECT s.s_nationkey, s.s_name, r.revenue,
                   row_number() OVER (PARTITION BY s.s_nationkey
                                      ORDER BY r.revenue DESC, s.s_suppkey) AS rn
            FROM supp_rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        )
        SELECT s_nationkey, s_name, revenue FROM ranked WHERE rn = 1
        """
    )


@query(
    "sql_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
    FROM (
        SELECT l_orderkey, l_linenumber, 'price' AS measure, l_extendedprice AS val
        FROM lineitem WHERE l_orderkey % 101 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'quantity', l_quantity
        FROM lineitem WHERE l_orderkey % 101 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey % 101 = 0
    )
    """,
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack(): wide measures -> (measure, val) long form."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
        FROM (
            SELECT l_orderkey, l_linenumber,
                   stack(3, 'price', l_extendedprice,
                            'quantity', l_quantity,
                            'discount', l_discount) AS (measure, val)
            FROM lineitem WHERE l_orderkey % 101 = 0
        )
        """
    )
