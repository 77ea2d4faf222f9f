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


@query(
    "udtf_token_positions",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\W+'), x -> length(x) > 0) AS t
        FROM documents
    )
    SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos, t[u.i] AS word
    FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) via LATERAL: one input doc row fans out
    to one row per token with its position — the user-defined analog of
    explode, Arrow-batched by the UDTF engine. Reference has no UDTF
    concept; this completes the UDF/UDAF/UDTF API surface.
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, word: string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(t for t in re.split(r"\W+", text or "") if t):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    d = table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.word FROM __udtf_docs d, LATERAL split_words(d.text) t"
    )
