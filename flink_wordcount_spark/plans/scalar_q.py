"""Scalar function library surface: string / date / math / array / map / JSON.

The reference's only scalar operation is ``String.split`` inside the tokenizer
(StatefulWordCount.java:118); the driver contract requires the full built-in
library (SURVEY §2.2). Everything here is a narrow projection over one table —
the point is function parity, verified value-by-value against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from .catalog import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name)  AS lo,
           upper(p_brand) AS up,
           trim('  ' || p_name || ' ') AS trimmed,
           substring(p_name, 2, 4) AS sub,
           length(p_name) AS len,
           concat_ws('|', p_brand, p_type) AS joined,
           regexp_extract(p_brand, '[0-9]+') AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_split_to_array(p_name, ' ')[1] AS first_tok,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           reverse(p_brand) AS rev,
           CAST(ascii(p_name) AS INTEGER) AS first_byte,
           CASE WHEN contains(p_name, 'red') THEN 1 ELSE 0 END AS has_red
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lo"),
        F.upper("p_brand").alias("up"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.substring("p_name", 2, 4).alias("sub"),
        F.length("p_name").cast("bigint").alias("len"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.element_at(F.split("p_name", " "), 1).alias("first_tok"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.reverse("p_brand").alias("rev"),
        F.ascii("p_name").alias("first_byte"),
        F.when(F.col("p_name").contains("red"), 1).otherwise(0).cast("int").alias("has_red"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)  AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT)   AS dy,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS plus30,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95
    FROM orders WHERE o_orderkey % 37 = 0
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.filter(F.col("o_orderkey") % 37 == 0).select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dy"),
        F.quarter(d).cast("bigint").alias("qtr"),
        (F.weekday(d) + 1).cast("bigint").alias("iso_dow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("bigint").alias("days_since_95"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS r1,
           CAST(ceil(l_quantity) AS BIGINT)  AS up,
           CAST(floor(l_quantity) AS BIGINT) AS down,
           abs(l_discount - 0.05) AS dev,
           round(sqrt(l_extendedprice), 4) AS rt,
           round(pow(l_quantity, 2), 2) AS sq,
           round(ln(l_extendedprice), 6) AS nat_log,
           round(log10(l_extendedprice), 6) AS log_ten,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
           CAST(mod(CAST(l_quantity AS BIGINT), 7) AS BIGINT) AS m7,
           round(greatest(l_tax, l_discount), 2) AS hi,
           round(least(l_tax, l_discount), 2) AS lo
    FROM lineitem WHERE l_orderkey % 53 = 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 53 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.ceil("l_quantity").cast("bigint").alias("up"),
        F.floor("l_quantity").cast("bigint").alias("down"),
        F.abs(F.col("l_discount") - 0.05).alias("dev"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("rt"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("nat_log"),
        F.round(F.log10("l_extendedprice"), 6).alias("log_ten"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("sgn"),
        (F.col("l_quantity").cast("bigint") % 7).cast("bigint").alias("m7"),
        F.round(F.greatest("l_tax", "l_discount"), 2).alias("hi"),
        F.round(F.least("l_tax", "l_discount"), 2).alias("lo"),
    )


@query(
    "fn_array",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\W+') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq,
           CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END AS has_spark,
           list_sort(list_distinct(toks))[1] AS first_alpha,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
           CAST(len(list_filter(toks, x -> length(x) >= 6)) AS INTEGER) AS n_long
    FROM t
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array transform/filter/aggregate stay in Catalyst (no UDF, codegen'd)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", r"\W+")
    uniq_sorted = F.sort_array(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).cast("int").alias("has_spark"),
        F.element_at(uniq_sorted, 1).alias("first_alpha"),
        F.array_join(F.slice(uniq_sorted, 1, 3), ",").alias("first3"),
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)).alias(
            "total_chars"
        ),
        F.size(F.filter(toks, lambda x: F.length(x) >= 6)).alias("n_long"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           event_type AS type_via_map,
           CAST(user_id AS VARCHAR) AS uid_via_map,
           'type,uid' AS keys_sorted,
           2 AS n_keys
    FROM events WHERE event_id % 41 = 0
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at/map_keys; the oracle states the expected
    values relationally (DuckDB MAPs serialize differently, so the query emits
    scalars extracted from the map rather than the map itself)."""
    e = table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return e.filter(F.col("event_id") % 41 == 0).select(
        "event_id",
        F.element_at(m, "type").alias("type_via_map"),
        F.element_at(m, "uid").alias("uid_via_map"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_nulls",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS BIGINT) AS gap_days
        FROM orders
    )
    SELECT o_custkey, o_orderkey, gap_days,
           CASE WHEN gap_days IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END AS is_first,
           coalesce(gap_days, -1) AS gap_or_default,
           nullif(gap_days, 0) AS gap_nonzero,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY gap_days ASC NULLS FIRST, o_orderkey) AS BIGINT) AS rn_nulls_first,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY gap_days ASC NULLS LAST, o_orderkey) AS BIGINT) AS rn_nulls_last
    FROM gaps
    """,
)
def fn_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics surface: null-safe equality (<=>), coalesce/nullif,
    and NULLS FIRST/LAST sort placement (value-visible via row_number)."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("gap_days"),
    )
    w_nf = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_first("gap_days"), F.asc("o_orderkey")
    )
    w_nl = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("gap_days"), F.asc("o_orderkey")
    )
    return gaps.select(
        "o_custkey",
        "o_orderkey",
        "gap_days",
        F.when(F.col("gap_days").eqNullSafe(F.lit(None).cast("bigint")), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_first"),
        F.coalesce("gap_days", F.lit(-1).cast("bigint")).alias("gap_or_default"),
        F.nullif(F.col("gap_days"), F.lit(0).cast("bigint")).alias("gap_nonzero"),
        F.row_number().over(w_nf).cast("bigint").alias("rn_nulls_first"),
        F.row_number().over(w_nl).cast("bigint").alias("rn_nulls_last"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS valid
    FROM events WHERE event_id % 29 = 0
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access over events.props: path extraction and schema-full parsing."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.filter(F.col("event_id") % 29 == 0).select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.when(parsed.isNotNull(), 1).otherwise(0).cast("int").alias("valid"),
    )


@query(
    "fn_regex",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '[a-z]{6,}') AS first_long,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS devoweled_len,
           CAST(len(regexp_extract_all(text, '[a-z]+e ')) AS BIGINT) AS e_words,
           CASE WHEN regexp_matches(text, 'spark.*sort|sort.*spark') THEN 1 ELSE 0 END AS has_both
    FROM documents
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family: first-match extract, global replace, match
    count, and boolean pattern test — Java regex and RE2 agree on this
    POSIX-class-free subset (the dialect-portable core)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "[a-z]{6,}", 0).alias("first_long"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("bigint").alias("devoweled_len"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+e "), 0)).cast("bigint").alias("e_words"),
        F.when(F.col("text").rlike("spark.*sort|sort.*spark"), 1).otherwise(0).alias("has_both"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_partkey & 255 AS band,
           p_partkey | 7 AS bor,
           xor(p_partkey, p_size) AS bxor,
           CAST(p_size AS BIGINT) << 2 AS shl,
           p_partkey >> 3 AS shr,
           CAST(bit_count(p_partkey) AS INTEGER) AS popcount
    FROM part
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family: and/or/xor, shifts, popcount (the hash/
    partitioning primitives the LSH operators build on, exposed as scalars)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("p_partkey & 255").alias("band"),
        F.expr("p_partkey | 7").alias("bor"),
        F.expr("p_partkey ^ p_size").alias("bxor"),
        F.shiftleft(F.col("p_size").cast("bigint"), 2).alias("shl"),
        F.shiftright("p_partkey", 3).alias("shr"),
        F.bit_count("p_partkey").alias("popcount"),
    )
