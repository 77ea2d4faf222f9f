"""Aggregation surface: hash aggregates, multi-dim (cube/rollup/grouping sets),
distinct, collect, filtered and approximate aggregates.

All shapes plan as partial (map-side) + final hash aggregation around one
exchange on the grouping key — the scalable pattern; high-cardinality
count(DISTINCT) rewrites to a two-phase expand+agg which Catalyst does
automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..operators.text import TOKS_SQL as _CMS_TOKS  # shared tokenizer SQL
from .catalog import query


@query(
    "agg_basic_stats",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price,
           round(avg(o_totalprice), 4) AS avg_price,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(stddev_samp(o_totalprice), 4) AS sd_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           count(DISTINCT c_nationkey) AS n_nations,
           count(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations in one pass (Expand + agg)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n, round(sum(o_totalprice), 2) AS total,
           CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (DataFrame API exposes cube/rollup only)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT r.r_name, string_agg(DISTINCT n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> sort_array -> array_join: deterministic list aggregation."""
    r, n = table(spark, sf_dir, "region"), table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"))
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
           round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS disc_price,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — one scan, many filtered measures."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 2
        ).alias("disc_price"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)), 2
        ).alias("qty_f"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           round(var_samp(l_quantity), 4) AS qty_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics aggregates (corr/covar/variance)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
    )


@query(
    "approx_distinct_quantile",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_distinct_exact,
           TRUE AS distinct_ok,
           TRUE AS quantile_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct + approximate median, value-checked via ERROR BOUNDS.

    Sketch outputs are engine-specific, so instead of comparing raw sketch
    values the query emits per-group booleans asserting the published error
    contracts hold — ``approx_count_distinct(rsd=0.05)`` within 3·rsd of the
    exact distinct count, and ``percentile_approx(accuracy=1000)`` whose
    returned value's rank interval overlaps ``0.5·n ± 2n/accuracy``.  The
    oracle expects TRUE for every group, turning the former rows-only check
    into a value-checked one.  Second pass joins the 3-row sketch result
    back broadcast — no extra shuffle of the fact table.
    """
    li = table(spark, sf_dir, "lineitem")
    acc = 1000  # percentile_approx rank error <= n/acc
    apx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("apx_parts"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(acc)).alias("apx_median"),
    )
    joined = li.join(F.broadcast(apx), "l_returnflag")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_distinct_exact"),
            F.first("apx_parts").alias("apx_parts"),
            F.first("apx_median").alias("apx_median"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("apx_median"), 1).otherwise(0)
            ).alias("c_le"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("apx_median"), 1).otherwise(0)
            ).alias("c_lt"),
        )
        .select(
            "l_returnflag",
            "n_distinct_exact",
            (
                F.abs(F.col("apx_parts") - F.col("n_distinct_exact"))
                <= 0.15 * F.col("n_distinct_exact")
            ).alias("distinct_ok"),
            (
                (F.col("c_le") >= (0.5 - 2.0 / acc) * F.col("n"))
                & (F.col("c_lt") <= (0.5 + 2.0 / acc) * F.col("n"))
            ).alias("quantile_ok"),
        )
    )


@query(
    "agg_quantile_disc",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag,
           max(CASE WHEN rn = (n + 1) // 2 THEN l_extendedprice END) AS median_price,
           max(CASE WHEN rn = (9 * (n - 1)) // 10 + 1 THEN l_extendedprice END) AS p90_price
    FROM ranked GROUP BY l_returnflag
    """,
)
def agg_quantile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles via rank — engine-neutral arithmetic (an
    interpolated median of 2-decimal prices lands on half-cent boundaries
    where float rounding diverges across engines, so we rank instead)."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    at = lambda cond: F.max(F.when(cond, F.col("l_extendedprice")))  # noqa: E731
    return ranked.groupBy("l_returnflag").agg(
        at(F.col("rn") == F.floor((F.col("n") + 1) / 2)).alias("median_price"),
        at(F.col("rn") == F.floor(9 * (F.col("n") - 1) / 10) + 1).alias("p90_price"),
    )


@query(
    "agg_salted_two_phase",
    oracle="""
    SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigating salted aggregation as a declared query: the 3-value
    l_returnflag key is exactly the hot-key shape (3 reducers own the whole
    table in a naive groupBy). Each key sprays across 16 salt buckets, is
    partially aggregated per (key, salt), then reduced — identical results
    (count and the integral quantity sums are exact under any grouping
    order), shuffle rows per hot key drop from N to 16.
    """
    from ..operators.skew import salted_measures

    li = table(spark, sf_dir, "lineitem")
    # ONE salted pass carries both measures (r08 review: a pass per measure
    # doubled the fact scan + shuffle and needed a join to recombine)
    return salted_measures(
        li,
        "l_returnflag",
        {"cnt": F.count(F.lit(1)), "total_qty": F.sum("l_quantity")},
        salt_buckets=16,
    ).select("l_returnflag", F.col("cnt").cast("bigint").alias("cnt"), "total_qty")


@query(
    "dq_constraint_report",
    oracle="""
    SELECT 'lineitem_quantity_range' AS constraint, CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS violations FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range', CAST(count(*) FILTER (l_discount < 0 OR l_discount > 0.1) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'lineitem_orphans', CAST(count(*) AS BIGINT) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_nonpositive_total', CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orders_null_date', CAST(count(*) FILTER (o_orderdate IS NULL) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orders_dup_pk', CAST(coalesce(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey) g WHERE n > 1
    UNION ALL
    SELECT 'orders_without_lineitems', CAST(count(*) AS BIGINT) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality audit: one row per declared constraint with
    its violation count (range checks, null checks, PK uniqueness, and
    referential integrity both directions).

    Scale shape: ALL of a table's row-local checks (ranges, nulls) ride ONE
    conditional aggregate inside that table's single scan and unpivot via
    stack() — one 1-row result per fact table, structurally one scan, not
    an optimizer-dependent ReuseExchange across union branches (r08 review:
    each check used to be its own aggregation subtree, re-scanning lineitem
    4x and orders 5x).  PK-dup and the two referential checks shuffle only
    on the join/group key.  Every counter is coalesced to 0 so an EMPTY
    vintage table reports zero violations like the oracle's count(*) FILTER
    (Spark's sum over zero rows is NULL).
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def viol(cond) -> F.Column:
        return (
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
        )

    def unpivot(agg_df: DataFrame, names: list[str]) -> DataFrame:
        pairs = ", ".join(f"'{n}', {n}" for n in names)
        return agg_df.select(
            F.expr(f"stack({len(names)}, {pairs}) AS (constraint, violations)")
        )

    def count_rows(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("constraint"),
            F.count(F.lit(1)).cast("bigint").alias("violations"),
        )

    li_checks = unpivot(
        li.agg(
            viol(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
            ).alias("lineitem_quantity_range"),
            viol(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
            ).alias("lineitem_discount_range"),
        ),
        ["lineitem_quantity_range", "lineitem_discount_range"],
    )
    o_checks = unpivot(
        o.agg(
            viol(F.col("o_totalprice") <= 0).alias("orders_nonpositive_total"),
            viol(F.col("o_orderdate").isNull()).alias("orders_null_date"),
        ),
        ["orders_nonpositive_total", "orders_null_date"],
    )
    orphans = count_rows(
        "lineitem_orphans",
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "leftanti"),
    )
    dup_pk = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(
            F.lit("orders_dup_pk").alias("constraint"),
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("bigint").alias("violations"),
        )
    )
    childless = count_rows(
        "orders_without_lineitems",
        o.join(li.select("l_orderkey"), o.o_orderkey == li.l_orderkey, "leftanti"),
    )
    # union order is immaterial: the driver's value compare is
    # order-insensitive (constraint names key the rows)
    return (
        li_checks.unionAll(o_checks)
        .unionAll(orphans)
        .unionAll(dup_pk)
        .unionAll(childless)
    )


@query(
    "sketch_hll_shard_merge",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS sketch_ok
    FROM events GROUP BY event_type
    """,
)
def sketch_hll_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-hour HLL sketches of user_id, merged per
    event_type — the 100 TB distinct-count shape (shard-local sketches, a
    few-KB merge; raw IDs never re-shuffle across the day boundary).

    Like approx_distinct_quantile, the engine-specific sketch is value-checked
    via its error contract: DataSketches HLL at default lgConfigK=12 has
    rsd ~1.6%, so the merged estimate must sit within 5% (≈3σ) of the exact
    distinct count; the oracle expects sketch_ok = TRUE per group.
    """
    e = table(spark, sf_dir, "events")
    partials = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("apx_users")
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users_exact")
    )
    # eqNullSafe: GROUP BY keeps a NULL event_type as its own group in both
    # engines, but a plain equi-join between the two rollups would silently
    # drop that group's row (NULL never equals NULL — NULL-vintage sweep, r08)
    return exact.join(
        F.broadcast(merged.withColumnRenamed("event_type", "et")),
        F.col("event_type").eqNullSafe(F.col("et")),
    ).select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("apx_users") - F.col("n_users_exact"))
            <= 0.05 * F.col("n_users_exact")
        ).alias("sketch_ok"),
    )



@query(
    "sketch_cms_topk_bounds",
    oracle=f"""
    WITH t AS (
        SELECT unnest({_CMS_TOKS}) AS word FROM documents
    ),
    c AS (
        SELECT word, count(*) AS exact_cnt FROM t GROUP BY word
        ORDER BY exact_cnt DESC, word LIMIT 10
    )
    SELECT word, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           TRUE AS no_undercount, TRUE AS within_eps
    FROM c
    """,
)
def sketch_cms_topk_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy-hitter audit over the token stream: build a
    CMS (eps=0.001, conf=0.99, fixed seed) distributed, then check its
    estimates for the exact top-10 words against the CMS error contract —
    ``no_undercount`` (CMS never underestimates) and ``within_eps``
    (overcount <= ceil(eps x stream length) at the stated confidence).
    The frequency twin of ``sketch_hll_shard_merge``'s distinct-count
    contract: the sketch itself is engine-specific, so what the oracle
    value-checks is the exact counts plus the error-bound booleans.

    Scale: the sketch is the point — counter arrays merge by addition
    (order-independent, a few KB per task), so token frequencies at 100 TB
    cost one partial-aggregated sketch merge with NO keyed shuffle at all;
    the exact top-10 here is the fixture-scale ground truth the contract
    is audited against (at production scale you'd audit against a sampled
    or per-shard exact count instead).  The sketch binary comes back from
    the ``count_min_sketch`` SQL aggregate and is queried driver-side via
    the JVM ``CountMinSketch.readFrom`` (PySpark 4 dropped the
    ``df.stat.countMinSketch`` wrapper); the stream length for the eps
    slack is the sketch's own totalCount — no separate count scan
    (r08 review)."""
    import math

    from ..operators.text import tokenize, top_k_words

    d = table(spark, sf_dir, "documents")
    toks = tokenize(d.select("text"), "text").select("word")
    eps = 0.001
    sk = toks.agg(
        F.expr(f"count_min_sketch(word, {eps}d, 0.99d, 42)").alias("sk")
    ).first()["sk"]
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk))
    )
    top = (
        top_k_words(d, 10)
        .withColumnRenamed("cnt", "exact_cnt")
        .collect()
    )
    slack = math.ceil(eps * cms.totalCount())
    rows = [
        (
            r["word"],
            r["exact_cnt"],
            cms.estimateCount(r["word"]) >= r["exact_cnt"],
            cms.estimateCount(r["word"]) <= r["exact_cnt"] + slack,
        )
        for r in top
    ]
    return spark.createDataFrame(
        rows, "word string, exact_cnt bigint, no_undercount boolean, within_eps boolean"
    )
