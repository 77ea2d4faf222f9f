"""Python DataSource (Spark 4 pyspark.sql.datasource) sentence source.

Contracts: bit-identical content to the shared generator core at any
parallelism (the reference's parallel-source-instance semantics,
RateControlledSourceFunction.java:11-124 — partitions() = instances), and
full coverage of the requested id range with no duplicates.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_wordcount_spark.sources import register_sentence_source
from flink_wordcount_spark.streaming.sentences import with_sentences


def _read(spark, n, size, seed, parts):
    register_sentence_source(spark)
    return (
        spark.read.format("sentences")
        .option("n", n)
        .option("size", size)
        .option("seed", seed)
        .option("numPartitions", parts)
        .load()
    )


def test_datasource_matches_batch_generator(spark):
    df = _read(spark, 300, 7, 42, 5)
    ref = with_sentences(spark.range(300), row_id="id", sentence_size=7, seed=42)
    j = df.join(ref.select("seq", F.col("sentence").alias("ref")), "seq")
    assert j.count() == 300
    assert j.filter(F.col("sentence") != F.col("ref")).count() == 0


def test_datasource_parallelism_invariant(spark):
    a = {r.seq: r.sentence for r in _read(spark, 200, 5, 7, 3).collect()}
    b = {r.seq: r.sentence for r in _read(spark, 200, 5, 7, 11).collect()}
    assert a == b
    assert set(a) == set(range(200)), "id range must be covered exactly once"


def test_datasource_seed_and_partition_count(spark):
    df = _read(spark, 100, 5, 7, 4)
    assert df.rdd.getNumPartitions() == 4
    other = {r.seq: r.sentence for r in _read(spark, 100, 5, 8, 4).collect()}
    same = {r.seq: r.sentence for r in df.collect()}
    assert same != other, "different seeds must give different corpora"
