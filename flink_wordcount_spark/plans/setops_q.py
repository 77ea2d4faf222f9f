"""Set operations + sort/limit/distinct surface.

Distinct-on-subset is expressed as groupBy+min (not dropDuplicates) wherever
the surviving row matters: dropDuplicates keeps an arbitrary row per key,
which is non-deterministic under parallel execution — fine for semantics-free
dedup, wrong for an oracle-checked query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from .catalog import query


@query(
    "setop_union_all",
    oracle="""
    SELECT k, name, kind FROM (
        SELECT c_custkey AS k, c_name AS name, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_suppkey AS k, s_name AS name, 'supplier' AS kind FROM supplier
    )
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = table(spark, sf_dir, "customer"), table(spark, sf_dir, "supplier")
    return c.select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    ).unionByName(
        s.select(
            F.col("s_suppkey").alias("k"), F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
        )
    )


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = table(spark, sf_dir, "customer"), table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select("s_nationkey"))
        .distinct()
    )


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = table(spark, sf_dir, "customer"), table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select("s_nationkey")
    )


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (set difference — ``subtract``,
    not ``exceptAll().distinct()`` which keeps keys that merely have surplus
    multiplicity on the left)."""
    c, s = table(spark, sf_dir, "customer"), table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select("s_nationkey")
    )


@query(
    "setop_except_all",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem WHERE l_linestatus = 'F'
    EXCEPT ALL
    SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'O'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference (keeps surplus multiplicity)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linestatus") == "F")
        .select(F.col("l_returnflag").alias("flag"))
        .exceptAll(li.filter(F.col("l_linestatus") == "O").select("l_returnflag"))
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "distinct_on_subset",
    oracle="""
    SELECT o_custkey, min(o_orderkey) AS first_orderkey
    FROM orders GROUP BY o_custkey
    """,
)
def distinct_on_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'keep one row per key' (see module docstring)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(F.min("o_orderkey").alias("first_orderkey"))


@query(
    "sort_multi_key",
    oracle="""
    SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_orderpriority ASC, price DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit -> TakeOrderedAndProject (no full global sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("price"))
        .orderBy(F.asc("o_orderpriority"), F.desc("price"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY price DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
        .orderBy(F.desc("price"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(25)
    )


@query(
    "setop_union_by_name",
    oracle="""
    SELECT key, name, bal FROM (
        SELECT c_custkey AS key, c_name AS name, c_acctbal AS bal FROM customer
        UNION ALL BY NAME
        SELECT s_name AS name, s_suppkey AS key FROM supplier
    )
    """,
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: schemas align by NAME (not
    position) and the supplier side's missing balance nulls in — the
    schema-evolution-safe union (positional union would silently mis-bind)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_suppkey").alias("key")
    )
    return c.unionByName(s, allowMissingColumns=True)
