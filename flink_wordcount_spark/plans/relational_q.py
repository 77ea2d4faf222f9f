"""Batch relational core: TPC-H-flavored queries + the full join family.

The reference has no joins/SQL at all (SURVEY §2.2 — verified absence); this
module is the target surface the driver contract requires. All queries are
built-in DataFrame expressions so Catalyst handles pushdown/pruning/join
selection; dimension tables are broadcast explicitly where we know they are
small at every scale factor (region/nation/supplier/customer vs the lineitem
fact table).

Scale notes: the fact-side joins key on l_orderkey/o_orderkey — at 100 TB both
sides would be bucketed on orderkey to avoid the shuffle entirely; here AQE
picks shuffle vs broadcast per measured sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..hints import maybe_broadcast
from ..io import table
from .catalog import query


def _r(c, n=2):
    return F.round(c, n)


def _rev():
    """Discounted line revenue — the SINGLE definition of the association
    order (review r08: eight inline copies risked a future edit changing
    the float evaluation order in only some of them)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------- TPC-H-ish

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide hash agg with filter pushed to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = _rev()
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(disc_price)).alias("sum_disc_price"),
            _r(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r(F.avg("l_quantity"), 4).alias("avg_qty"),
            _r(F.avg("l_extendedprice"), 4).alias("avg_price"),
            _r(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dims broadcast into the fact, agg, top-k."""
    c, o, li = (table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .join(
            o.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            maybe_broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(_r(F.sum(_rev())).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r JOIN nation n   ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o   ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                                 AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join chain; all dims broadcast, one fact shuffle.

    r16 (guide §3.1): the dims are hinted as BASE tables, not as a pre-joined
    c⋈n⋈r frame — Catalyst's size estimate for a join OUTPUT is inflated
    (row counts multiplied without NDV stats), so ``maybe_broadcast`` on the
    joined dims declined and the fact-scale li⋈o output was shuffled AND
    sorted into a SortMergeJoin on o_custkey (executed-plan evidence:
    plans/r16/q5_local_supplier_volume_exec_sf1_r15shape.txt).  Base-table
    estimates are file-size-accurate, so the customer projection broadcasts
    wherever it truly fits (and degrades to the same SMJ at 100 TB when it
    doesn't); nation⋈ASIA-region is constant-cardinality (5 rows) and keeps
    the unconditional broadcast the repo convention allows for fixed dims.
    The ASIA pruning moves one BHJ later in the same codegen stage — no
    extra materialization."""
    r, n, c, o, li, s = (
        table(spark, sf_dir, t)
        for t in ("region", "nation", "customer", "orders", "lineitem", "supplier")
    )
    n_asia = n.join(
        F.broadcast(r.filter(r.r_name == "ASIA")), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(
            o.filter(
                (o.o_orderdate >= F.lit("1996-01-01").cast("timestamp"))
                & (o.o_orderdate < F.lit("1998-01-01").cast("timestamp"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(
            maybe_broadcast(c.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n_asia), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            maybe_broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(_r(F.sum(_rev())).alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.08
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+single-row agg; every predicate pushable."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.08))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _r(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c JOIN orders o   ON o.o_custkey = c.c_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    c, o, li, n = (
        table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem", "nation")
    )
    return (
        li.filter(li.l_returnflag == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_r(F.sum(_rev())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l.l_partkey, s.s_suppkey, s.s_name, s.s_nationkey,
               min(l.l_extendedprice / l.l_quantity) AS unit_cost
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2, 3, 4
    )
    , ranked AS (
        SELECT l_partkey, s_name, unit_cost,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY unit_cost, s_suppkey) AS rn
        FROM costs
    )
    SELECT l_partkey AS p_partkey, s_name, unit_cost
    FROM ranked WHERE rn = 1
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (correlated-min, expressed
    as a window rank — the decorrelated form Catalyst would plan anyway,
    with a deterministic suppkey tie-break)."""
    from pyspark.sql import Window

    li, s = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "supplier")
    costs = (
        li.join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_nationkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey").orderBy(F.asc("unit_cost"), F.asc("s_suppkey"))
    return (
        costs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            # UNROUNDED: price/quantity quotients land on decimal halves
            # (e.g. 1106.29/40 = 27.65725) where engine rounding diverges;
            # the raw division is bit-identical (oracle-parity-discipline)
            "unit_cost",
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_name, o.o_orderkey, orderdate
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-volume orders (HAVING
    subquery -> semi join on the fact table, then enrich + top-k)."""
    c, o, li = (table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(
            maybe_broadcast(big.withColumnRenamed("l_orderkey", "bk")),
            li.l_orderkey == F.col("bk"),
            "leftsemi",
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated date comparison -> semi join
    with a mixed equi+range condition, then priority counts."""
    o, li = table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    window_o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = (li.l_orderkey == window_o.o_orderkey) & (
        li.l_shipdate > window_o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        window_o.join(li, late, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END), 2) AS promo_revenue,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue split by a dimension attribute
    (promo parts), dim broadcast into the filtered fact scan."""
    li, p = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    rev = _rev()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)), 2
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------- join family

@query(
    "join_inner",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return (
        o.join(maybe_broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), _r(F.sum("o_totalprice")).alias("total"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeps order-less customers (count = 0 rows present)."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal < -900
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .filter(c.c_acctbal < -900)
        .select("o_orderkey", "c_name")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT coalesce(cn.k, sn.k) AS nationkey,
           coalesce(cn.n_cust, 0) AS n_cust,
           coalesce(sn.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) cn
    FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) sn
    ON cn.k = sn.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = table(spark, sf_dir, "customer"), table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("ck")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = s.groupBy(F.col("s_nationkey").alias("sk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return cn.join(sn, cn.ck == sn.sk, "full").select(
        F.coalesce(cn.ck, sn.sk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers with >=1 urgent order; no duplication, no payload."""
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return c.join(
        o.filter(o.o_orderpriority == "1-URGENT"),
        c.c_custkey == o.o_custkey,
        "leftsemi",
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "leftanti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r, n = table(spark, sf_dir, "region"), table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_range",
    oracle="""
    SELECT o.o_orderkey, count(*) AS n_late_lines
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range predicate in the join condition (late shipments).

    Catalyst plans the equi part as the join key and evaluates the range
    residual post-match — the scalable shape for mixed conditions.
    """
    o, li = table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_late_lines"))


@query(
    "merge_upsert",
    oracle="""
    WITH source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 2 AS o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice, t.o_orderpriority
    FROM orders t LEFT JOIN source s ON s.o_orderkey = t.o_orderkey
    WHERE s.o_orderkey IS NULL
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority FROM source
    """,
)
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (anti-join + union): double every 10th order's
    price via an upsert source; output is the post-merge table. The price op
    is *2 (exact in IEEE — a *1.1 bump lands on half-cent rounding
    boundaries systematically). CDC/SCD pattern for engines without a
    transactional table format."""
    from ..operators.merge import merge_upsert

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    source = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    return merge_upsert(o, source, "o_orderkey")


@query(
    "join_theta",
    oracle="""
    SELECT a.s_nationkey AS nationkey, count(*) AS n_pairs
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_acctbal < b.s_acctbal
    GROUP BY a.s_nationkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self theta-join (inequality pairing), bounded per-nation."""
    s = table(spark, sf_dir, "supplier")
    a = s.select(F.col("s_nationkey").alias("nk"), F.col("s_acctbal").alias("bal_a"))
    b = s.select(F.col("s_nationkey").alias("nk2"), F.col("s_acctbal").alias("bal_b"))
    return (
        a.join(b, (a.nk == b.nk2) & (a.bal_a < b.bal_b))
        .groupBy(F.col("nk").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ------------------------------------------------- optimizer-shape TPC-H set
# Q7/Q8/Q16/Q19/Q21 shapes (adapted to the fixture schema, which has no
# partsupp/commitdate/receiptdate/container columns): multi-nation join
# trees, NOT IN + count distinct, disjunctive predicate pushdown, and
# double-correlated EXISTS/NOT EXISTS — each exercises a distinct Catalyst
# behavior nothing else in the registry does.

@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    Two independent nation lookups (supplier side and customer side) hang
    off opposite ends of the lineitem-orders fact join; the disjunctive
    nation-pair predicate can only be applied after both dims resolve.
    Dims (supplier, nation) broadcast; lineitem-orders is the one shuffle —
    at 100 TB both sides bucketed on orderkey remove it.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
        )
        .join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_r(F.sum(_rev())).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN n1.n_name = 'NATION_7'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END), 2) AS nation_volume,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_volume,
           round(sum(CASE WHEN n1.n_name = 'NATION_7'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END), 2)
             / round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS mkt_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'STANDARD'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey AND r.r_name = 'ASIA'
    WHERE o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional order volume by year.

    Seven-table join tree; the share is a ratio of two aggregates over the
    same rows (conditional / unconditional). Ratio computed from the two
    ROUNDED sums — division of identical doubles is bit-identical across
    engines, per the oracle-parity float rules (never round a ratio).
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2"))
    rev = _rev()
    nation_vol = F.round(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(0.0)), 2
    )
    total_vol = F.round(F.sum(rev), 2)
    return (
        li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("rk2") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            nation_vol.alias("nation_volume"),
            total_vol.alias("total_volume"),
            (nation_vol / total_vol).alias("mkt_share"),
        )
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group, excluding a
    NOT IN subquery's supplier set (fixture schema has no partsupp, so the
    lineitem fact stands in as the part-supplier relation).

    The NOT IN is rewritten as a plain (broadcast) anti join — equivalent
    here because BOTH keys are NOT-NULL by the TPC-H schema contract: a
    NULL probe-side l_suppkey would survive a leftanti but be dropped by
    SQL NOT IN (r08 review corrected this docstring, which previously
    claimed a null-aware anti join the operator does not perform).
    count(DISTINCT) expands to the two-phase distinct aggregate; the part
    filter is broadcast into the fact scan.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(maybe_broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "leftanti")
        .join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a three-branch disjunction mixing
    part-side and lineitem-side predicates.

    The per-side envelopes of the OR (brand IN the three, size 1..15;
    quantity 1..30) are applied BEFORE the join so each scan prunes — the
    manual form of the pushdown TPC-H Q19 exists to test — then the exact
    disjunction filters the joined rows. Part side broadcasts.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    p = table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(_r(F.sum(_rev())).alias("revenue"))
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for late multi-supplier
    orders (fixture schema has no commit/receipt dates, so "late" is
    l_shipdate > o_orderdate + 90 days).

    Double-correlated EXISTS / NOT EXISTS over the same fact: a left-semi
    self-join (another supplier exists in the order) then a left-anti
    self-join (no OTHER supplier was late in the order). Both correlate on
    orderkey with a suppkey inequality; top-10 via TakeOrderedAndProject
    with a total tie-break (s_name unique).
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    late_others = late.select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    waited = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "leftsemi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "leftanti",
        )
    )
    return (
        waited.join(maybe_broadcast(s), waited.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts, with the
    join predicate (not a WHERE) excluding one priority class so customers
    with zero qualifying orders still appear — the outer-join-with-
    ON-condition vs filter distinction Catalyst must preserve. Double
    aggregation: count per customer, then count per count.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue view reused twice — once aggregated to a
    scalar max, once joined back row-wise (view + scalar subquery). The
    rounded per-supplier totals make the float equality engine-stable.
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_r(F.sum(_rev())).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .join(maybe_broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice), 2) / 7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (SELECT round(0.2 * avg(l2.l_quantity), 4)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) gating the fact rows — decorrelated into a per-partkey
    aggregate joined back to the filtered fact. The ratio divides the
    ROUNDED sum by the exact constant 7.0 (raw IEEE division, engine-stable).
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(0.2 * F.avg("l_quantity"), 4).alias("qty_threshold")
    )
    return (
        li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(avg_q), li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((_r(F.sum("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


@query(
    "q20_excess_shippers",
    oracle="""
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 500
    )
    AND s.s_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
    )
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries, the inner one an aggregate
    with HAVING (suppliers who shipped >500 units of promo parts in 1996;
    fixture schema has no partsupp, so shipped volume stands in for
    availqty). Both INs become semi joins; the nation side broadcasts.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5")
    )
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 500)
        .select("l_suppkey")
    )
    return (
        s.join(maybe_broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "leftsemi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "leftsemi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT CAST(c.c_nationkey % 5 AS BIGINT) AS cntrycode,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT round(sum(c_acctbal), 2) / count(*)
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balance + NOT EXISTS correlate
    (customers with no recent orders; the fixture's every customer has SOME
    order, so the correlate is date-scoped). Scalar subquery broadcast as a
    1-row aggregate; NOT EXISTS as a left-anti join on the filtered orders.
    Country code adapted from nationkey (no phone column).
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "leftanti")
        .groupBy((F.col("c_nationkey") % 5).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.5 * p.p_retailprice * l.l_quantity), 2) + 0.0
               AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE contains(p.p_name, 'red')
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for parts matching
    a name substring (fixture schema has no partsupp, so half the retail
    price stands in for supply cost). The substring predicate prunes part
    before its broadcast; the profit expression mixes columns from three
    tables post-join.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(maybe_broadcast(p), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        # post-round +0.0: the only SIGNED rounded sum in this module — a
        # group near zero rounds to -0.0 in DuckDB and +0.0 in Spark
        .agg((_r(F.sum(profit)) + F.lit(0.0)).alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH v AS (
        SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS part_value
        FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, part_value FROM v
    WHERE part_value > (SELECT round(sum(part_value) * 1.4 / count(*), 2) FROM v)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value filtered by a fraction of the GLOBAL
    total — the aggregate-in-HAVING scalar subquery. The same aggregation
    feeds both the rows and the threshold (computed once, broadcast back).
    Like the real Q11 (whose fraction is 0.0001/SF), the cut scales with
    the part count (1.4/n ~= 2x the mean share at any SF); both sides round
    before the boundary compare so the cut is engine-stable.
    """
    li = table(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(
        _r(F.sum(F.col("l_extendedprice") * F.col("l_quantity"))).alias("part_value")
    )
    thr = v.agg(
        F.round(F.sum("part_value") * 1.4 / F.count(F.lit(1)), 2).alias("thr")
    )
    return (
        v.join(F.broadcast(thr))
        .filter(F.col("part_value") > F.col("thr"))
        .select("l_partkey", "part_value")
    )


#: Band half-width for the bucketed pure-range join (60 s in microseconds).
_BAND_US = 60_000_000


@query(
    "join_time_band_bucketed",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS purchase_id, epoch_us(ts) AS tp
        FROM events WHERE event_type = 'purchase'
    ), e AS (
        SELECT epoch_us(ts) AS te FROM events WHERE event_type = 'error'
    )
    SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_errors_60s
    FROM p JOIN e ON abs(tp - te) <= {_BAND_US}
    GROUP BY purchase_id
    """,
)
def join_time_band_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join with NO equi key — errors within 60 s of any
    purchase, across users — executed as an EQUI-join via band bucketing:
    each side keys on floor(epoch_us / width); the probe side explodes
    into its bucket and both neighbors, the exact |Δt| predicate filters
    residually.  Every qualifying pair matches in exactly one bucket (the
    build row's own), so counts need no dedup.  The oracle states the
    naive nested-loop semantics; the plan here is the scalable one — a
    hash-partitioned equi-join instead of the O(n·m) BroadcastNestedLoop
    Catalyst would otherwise emit (plan-pinned in test_plans_shape).

    Scale: 3x row fan-out on the probe side buys hash partitioning on the
    band key; skewed hot minutes split via AQE like any equi-join key.
    Timestamps key on MICROSECONDS on both engines (parity: whole-second
    keys truncate sub-second fixture timestamps differently)."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("tp"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.unix_micros("ts").alias("te"),
        F.floor(F.unix_micros("ts") / _BAND_US).alias("bucket"),
    )
    b = F.floor(F.col("tp") / _BAND_US)
    probe = p.select(
        "purchase_id",
        "tp",
        F.explode(F.array(b - 1, b, b + 1)).alias("bucket"),
    )
    return (
        probe.join(e, "bucket")
        .filter(F.abs(F.col("tp") - F.col("te")) <= _BAND_US)
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_errors_60s"))
    )
