"""Tokenizer/wordcount unit + property tests (SURVEY §2.3 traps, §5.2.5).

Reference semantics: split on \\W+ (NOT whitespace), drop empties, no
lowercasing (StatefulWordCount.java:118-121)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from flink_wordcount_spark.operators.text import (
    TOKEN_SPLIT_REGEX,
    token_count_expr,
    tokenize,
    word_counts,
)


def _spark_tokens(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.word for r in tokenize(df).select("word").collect()]


def test_tokenizer_edge_cases(spark):
    # apostrophes split (SURVEY §2.3.1): "don't" -> don, t
    assert _spark_tokens(spark, ["don't"]) == ["don", "t"]
    # digits are word chars; punctuation runs collapse; case preserved
    assert _spark_tokens(spark, ["ab12 CD!!ef"]) == ["ab12", "CD", "ef"]
    # leading/trailing separators produce no empty tokens
    assert _spark_tokens(spark, ["  hi  "]) == ["hi"]
    # lone separators -> nothing (blank wordlist lines, SURVEY §2.3.7)
    assert _spark_tokens(spark, [" ", "...", ""]) == []


def test_token_count_expr_matches_explode(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    via_expr = d.select(F.sum(token_count_expr("text")).alias("n")).collect()[0].n
    via_explode = tokenize(d.select("text")).count()
    assert via_expr == via_explode


_texts = st.lists(
    st.text(alphabet="abc AB12,.!'\t", min_size=0, max_size=40), min_size=0, max_size=6
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(a=_texts, b=_texts)
def test_wordcount_merge_property(spark, a, b):
    """wordcount(a ++ b) == merge(wordcount(a), wordcount(b)) — the partial
    aggregation law the distributed map-side combine relies on."""

    def counts(texts):
        out = {}
        for t in texts:
            for w in re.split(r"\W+", t):
                if w:
                    out[w] = out.get(w, 0) + 1
        return out

    df = spark.createDataFrame([(t,) for t in a + b] or [("",)], "text string")
    spark_counts = {r.word: r.cnt for r in word_counts(df).collect()}
    merged = counts(a)
    for w, c in counts(b).items():
        merged[w] = merged.get(w, 0) + c
    assert spark_counts == merged


def test_java_python_regex_agreement(spark, sf_dir):
    """Spark (Java regex) and Python re agree on \\W+ over the fixture corpus
    (the oracle bridge depends on this agreement)."""
    texts = [r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50).collect()]
    got = _spark_tokens(spark, texts)
    want = [w for t in texts for w in re.split(r"\W+", t) if w]
    assert sorted(got) == sorted(want)
    assert TOKEN_SPLIT_REGEX == r"\W+"
