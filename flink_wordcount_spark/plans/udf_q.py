"""UDF query surface: row-wise Python, Arrow-vectorized pandas, grouped-agg
pandas, and SQL-registered UDFs — each oracle-checked where the computation
is engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import distinct_count_agg, label_part, net_price, register_sql_udfs
from ..io import table
from .catalog import query


@query(
    "udf_rowwise",
    oracle="""
    SELECT p_partkey, p_brand || ':' || lpad(CAST(p_size AS VARCHAR), 3, '0') AS part_label
    FROM part WHERE p_partkey % 7 = 0
    """,
)
def udf_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, confined to a filtered slice)."""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey", label_part("p_brand", "p_size").alias("part_label")
    )


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS net
    FROM lineitem WHERE l_orderkey % 97 = 0
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched vectorized UDF; float64 elementwise ops -> bit-exact
    against the equivalent SQL expression."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 97 == 0).select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount", "l_tax").alias("net"),
    )


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF surface), integer-exact."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        distinct_count_agg("o_custkey").alias("n_customers")
    )


@query(
    "udf_sql_registered",
    oracle="""
    SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket,
           count(*) AS n, round(sum(o_totalprice), 2) / count(*) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF registered for SQL text (spark.udf.register) and used via spark.sql."""
    register_sql_udfs(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_udf")
    return spark.sql(
        """
        SELECT price_bucket(o_totalprice) AS bucket,
               count(*) AS n, round(sum(o_totalprice), 2) / count(*) AS avg_price
        FROM orders_udf GROUP BY 1
        """
    )
