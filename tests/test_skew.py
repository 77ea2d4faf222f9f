"""Salted two-phase aggregation: exactness under a manufactured hot key
(the reference's dormant skew knob, RandomSentenceGenerator.java:47-53)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_wordcount_spark.operators.skew import salted_agg, salted_count
from flink_wordcount_spark.operators.text import tokenize
from flink_wordcount_spark.streaming.sentences import batch_golden


def test_salted_count_exact_under_skew(spark):
    # 30% of tokens are the literal hot key "skew"
    sent = batch_golden(spark, 400, sentence_size=10, skew_percent=30)
    toks = tokenize(sent.select("sentence"), text_col="sentence")
    plain = {r.word: r.cnt for r in toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r.word: r.cnt for r in salted_count(toks, "word", salt_buckets=8).collect()}
    assert salted == plain
    assert plain["skew"] > 1000  # the hot key is actually hot


def test_salted_sum_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r.l_returnflag: round(r.total, 2)
        for r in li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("total")).collect()
    }
    salted = {
        r.l_returnflag: round(r.total, 2)
        for r in salted_agg(li, "l_returnflag", F.col("l_quantity"), 8).collect()
    }
    assert salted == plain


def test_salted_plan_has_two_exchanges(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = salted_count(li, "l_returnflag", 8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") >= 2  # (key,salt) exchange + key exchange


def test_salted_ops_reject_existing_salt_column(spark, sf_dir):
    """A caller '__salt' column would be silently overwritten (and dropped)
    by the salting scratch column — must fail loudly instead (ADVICE r04)."""
    import pytest

    from flink_wordcount_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10)
    poisoned = li.withColumn("__salt", F.lit(99))
    with pytest.raises(ValueError, match="__salt"):
        salted_count(poisoned, "l_returnflag")
    with pytest.raises(ValueError, match="__salt"):
        salted_agg(poisoned, "l_returnflag", F.col("l_quantity"))
    with pytest.raises(ValueError, match="__salt"):
        salted_join(poisoned, li.limit(1), "l_orderkey")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(li.limit(1), poisoned, "l_orderkey")
