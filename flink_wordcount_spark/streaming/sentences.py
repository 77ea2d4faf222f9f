"""Rate-controlled random-sentence source (reference-parity semantics).

Reference behavior re-expressed (citations into /root/reference):
- RateControlledSourceFunction emits ``rate`` sentences/sec per instance,
  tagging every ``sample_period``-th record with a wall-clock timestamp and
  the rest with a sentinel (RateControlledSourceFunction.java:70-91); the
  sentinel becomes a proper NULL here (SURVEY §1.4).
- RandomSentenceGenerator draws ``sentence_size`` WORDS (the "(in chars)"
  comment is wrong — the loop decrements per word, RandomSentenceGenerator.
  java:39-43) uniformly from a wordlist, with an optional skew knob that
  emits the literal word "skew" with probability skew_percent/100
  (RandomSentenceGenerator.java:47-53 — dormant in the reference, exposed
  here but defaulted off).

Spark-first design: the generator is a pure column expression over a
monotonically increasing row id — seeded xxhash64 instead of java.util.Random,
so any row of the stream is reproducible from (seed, row_id) alone. That makes
the source replayable (exactly-once restart semantics fall out of the
rate-micro-batch source's offset tracking + deterministic generation) and lets
batch jobs regenerate the identical stream for golden checks (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Deterministic ~1k wordlist standing in for the reference's 354,986-line
#: words.txt (FIXTURES.md §B): syllable products, all lowercase.
_SYL_A = ("ba", "de", "fi", "go", "hu", "ka", "lo", "mi", "na", "pe")
_SYL_B = ("ra", "se", "ti", "vo", "wu", "ya", "zo", "qua", "ne", "li")
_SYL_C = ("", "n", "s", "t", "x", "m", "r", "l", "k", "d")


def wordlist() -> list[str]:
    return [a + b + c for a in _SYL_A for b in _SYL_B for c in _SYL_C]


def with_sentences(
    df: DataFrame,
    row_id: str = "value",
    sentence_size: int = 100,
    sample_period: int = 1000,
    seed: int = 42,
    skew_percent: int = 0,
    source_id: int = 7,
) -> DataFrame:
    """Attach (sample_ts, sentence, source_id) columns to a row-id frame.

    Works identically over ``spark.range`` (batch golden copy) and the
    rate/rate-micro-batch streaming sources (streaming run) — same seed,
    same rows, same sentences. The sentence is ONE transform over ONE
    wordlist array column (not sentence_size copies of the literal array —
    that would put 100k literal nodes in the plan).
    """
    words = wordlist()
    rid = F.col(row_id)

    def pick(i: Column) -> Column:
        h = F.xxhash64(rid, i, F.lit(seed))
        word = F.element_at(F.col("__words"), F.pmod(h, F.lit(len(words))).cast("int") + 1)
        if skew_percent > 0:
            skew_h = F.pmod(F.xxhash64(rid, i, F.lit(seed + 1)), F.lit(100))
            word = F.when(skew_h < skew_percent, F.lit("skew")).otherwise(word)
        return word

    sentence = F.concat_ws(" ", F.transform(F.sequence(F.lit(1), F.lit(sentence_size)), pick))
    # Rate-aligned per-record sample timestamp (reference semantics:
    # recordTimestamp = startTime + eventsCount/rate, RateControlledSource-
    # Function.java:75-87). The rate sources emit exactly that as their
    # per-row `timestamp` column; batch golden runs (spark.range) synthesize
    # an equivalent unique-per-record base. current_timestamp() alone would
    # be constant per micro-batch -> colliding sample timestamps.
    if "timestamp" in df.columns:
        base_ms = F.unix_millis(F.col("timestamp"))
    else:
        base_ms = F.unix_millis(F.current_timestamp()) + (rid * 1000).cast("long") / F.lit(12500)
    sample_ts = F.when(F.pmod(rid, F.lit(sample_period)) == 0, base_ms).cast("long")
    return (
        df.withColumn("__words", F.array(*[F.lit(w) for w in words]))
        .select(
            sample_ts.alias("sample_ts"),
            sentence.alias("sentence"),
            F.lit(source_id).cast("int").alias("source_id"),
            rid.cast("long").alias("seq"),
        )
    )


def rate_stream(
    spark: SparkSession,
    rows_per_second: int = 12500,
    num_partitions: int = 4,
    micro_batch: bool = True,
    rows_per_batch: int | None = None,
    **sentence_kwargs,
) -> DataFrame:
    """Streaming sentence source at a controlled rate.

    rate-micro-batch pins rows per batch (deterministic batch sizing, the
    closest analog of the reference's sleep-to-timestamp loop at
    RateControlledSourceFunction.java:75-87); plain rate is wall-clock.
    """
    if micro_batch:
        reader = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_batch or rows_per_second)
            .option("numPartitions", num_partitions)
        )
    else:
        reader = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .option("numPartitions", num_partitions)
        )
    return with_sentences(reader.load(), **sentence_kwargs)


def batch_golden(spark: SparkSession, n_rows: int, **sentence_kwargs) -> DataFrame:
    """Batch regeneration of the identical stream prefix (golden check)."""
    return with_sentences(spark.range(n_rows).withColumnRenamed("id", "value"), **sentence_kwargs)
