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

Spark-first design: the generator is a pure function of a monotonically
increasing row id — seeded splitmix64 instead of java.util.Random, so any row
of the stream is reproducible from (seed, row_id) alone. That makes the
source replayable (exactly-once restart semantics fall out of the
rate-micro-batch source's offset tracking + deterministic generation) and lets
batch jobs regenerate the identical stream for golden checks (FIXTURES.md §B).
The word lookup runs as an Arrow-vectorized UDF over a broadcast vocabulary —
see ``_sentence_column`` for why that beats a plan-literal array at 355k words.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: The reference vocabulary: 354,986-line words.txt, loaded verbatim
#: (RandomSentenceGenerator.java:23-31 reads /words.txt from the jar).
#: Vocabulary size bounds the streaming wordcount's state cardinality and
#: shuffle key space, so using the real list keeps the stateful-agg
#: operating point honest (a 1k synthetic list understates state ~355x).
#: Loaded through importlib.resources so it also resolves when the package
#: is shipped to executors as a zip (packaging.ship_package) — a bare
#: Path(__file__) breaks under zipimport.
def _words_resource():
    from importlib import resources

    return resources.files("flink_wordcount_spark") / "resources" / "words.txt"

#: Fallback-only synthetic list (FIXTURES.md §B): syllable products.
_SYL_A = ("ba", "de", "fi", "go", "hu", "ka", "lo", "mi", "na", "pe")
_SYL_B = ("ra", "se", "ti", "vo", "wu", "ya", "zo", "qua", "ne", "li")
_SYL_C = ("", "n", "s", "t", "x", "m", "r", "l", "k", "d")

_WORDLIST_CACHE: list[str] | None = None


def synthetic_wordlist() -> list[str]:
    """1,000-word deterministic fallback (tests that want tiny vocab)."""
    return [a + b + c for a in _SYL_A for b in _SYL_B for c in _SYL_C]


def wordlist() -> list[str]:
    """The generator vocabulary: reference words.txt when present (normal),
    the synthetic list otherwise (keeps the package importable standalone)."""
    global _WORDLIST_CACHE
    if _WORDLIST_CACHE is None:
        res = _words_resource()
        if res.is_file():
            _WORDLIST_CACHE = res.read_text(encoding="utf-8").splitlines()
        else:
            _WORDLIST_CACHE = synthetic_wordlist()
    return _WORDLIST_CACHE


#: One broadcast of the vocabulary per application (4 MB, shipped once).
#: Keyed on applicationId, NOT id(sc): a stopped context's id() can be
#: reused by a new object, which would hand out a broadcast handle from a
#: dead JVM (the same round-3 bug class io._CACHE and session._TUNED were
#: moved off id() for).  Bounded like io._CACHE so dead apps' handles are
#: dropped instead of accumulating across a long pytest session.
_WORDS_BC = {}
_WORDS_BC_MAX_APPS = 4


def _words_broadcast(spark: SparkSession):
    import numpy as np

    sc = spark.sparkContext
    key = sc.applicationId
    if key not in _WORDS_BC:
        while len(_WORDS_BC) >= _WORDS_BC_MAX_APPS:
            # Best-effort release of the evicted handle's JVM-side blocks:
            # for a still-live app the 4 MB broadcast would otherwise leak
            # until app shutdown (and a re-request would ship a duplicate);
            # for a dead app the unpersist raises into the except (ADVICE
            # r08).
            evicted = _WORDS_BC.pop(next(iter(_WORDS_BC)))
            try:
                evicted.unpersist()
            except Exception:
                pass  # owning JVM already gone
        _WORDS_BC[key] = sc.broadcast(np.array(wordlist(), dtype=object))
    else:
        # LRU, not insertion-order FIFO: refresh recency on hit so a hot
        # app's live broadcast is not the one evicted under concurrent-app
        # pressure (ADVICE r08).
        _WORDS_BC[key] = _WORDS_BC.pop(key)
    return _WORDS_BC[key]


def sentences_for_ids(rids, sentence_size: int, seed: int, skew_percent: int, words):
    """Deterministic sentences for a numpy uint64 row-id array — the shared
    generation core behind the Arrow UDF below AND the Python DataSource
    (``sources/sentence_source.py``); one implementation, so the two
    surfaces can never drift.  splitmix64 over (row_id, slot, seed); see
    ``_sentence_column`` for the semantics citations."""
    import numpy as np

    def _mix(z):
        # splitmix64 finalizer (public-domain constants)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    n = np.uint64(len(words))
    r = np.asarray(rids, dtype=np.uint64)
    cols = []
    with np.errstate(over="ignore"):
        for slot in range(sentence_size):
            z = (
                r * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(slot + 1) * np.uint64(0xD1B54A32D192ED03)
                + np.uint64(seed) * np.uint64(0x8CB92BA72F3D8DD7)
            )
            h = _mix(z)
            w = words[(h % n).astype(np.int64)]
            if skew_percent > 0:
                sk = _mix(z + np.uint64(0xA0761D6478BD642F)) % np.uint64(100)
                w = np.where(sk < np.uint64(skew_percent), "skew", w)
            cols.append(w)
    mat = np.stack(cols, axis=1)
    return [" ".join(row) for row in mat]


def _sentence_column(
    spark: SparkSession, sentence_size: int, seed: int, skew_percent: int, rid: Column
) -> Column:
    """Deterministic sentence from a row id, as an Arrow-vectorized UDF.

    Why a UDF and not a column expression: the vocabulary is 355k words
    (~3.7 MB). As a plan literal (element_at into a folded array constant)
    every micro-batch re-analyzes/re-codegens a 3.7 MB plan — measured ~2.5 s
    of fixed driver cost PER BATCH, which caps the rate source at ~0.9 M
    words/s and makes 1 s triggers impossible. As a broadcast variable the
    vocabulary ships to executors once and the per-batch cost is a vectorized
    numpy lookup (~0.1 s per 600k words). This is the documented exception to
    "UDFs are the slow path": the UDF wins because it keeps 3.7 MB out of
    the query plan, not because Python is fast.

    Word choice is splitmix64 over (row_id, slot, seed) — pure, so any row
    of the stream is reproducible from (seed, row_id) alone, which is what
    makes the source replayable and batch-goldenable (FIXTURES.md §B).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    words_bc = _words_broadcast(spark)
    n_words_known = len(wordlist())

    @pandas_udf("string")
    def gen(rid_s: pd.Series) -> pd.Series:
        return pd.Series(
            sentences_for_ids(
                rid_s.to_numpy(np.uint64),
                sentence_size,
                seed,
                skew_percent,
                words_bc.value,
            )
        )

    assert n_words_known > 0
    return gen(rid.cast("long"))


def with_sentences(
    df: DataFrame,
    row_id: str = "value",
    sentence_size: int = 100,
    sample_period: int = 1000,
    seed: int = 42,
    skew_percent: int = 0,
    source_id: int = 7,
    rows_per_second: int = 12500,
) -> DataFrame:
    """Attach (sample_ts, sentence, source_id) columns to a row-id frame.

    Works identically over ``spark.range`` (batch golden copy) and the
    rate/rate-micro-batch streaming sources (streaming run) — same seed,
    same rows, same sentences. The sentence is ONE transform over ONE
    wordlist array column (not sentence_size copies of the literal array —
    that would put 100k literal nodes in the plan).
    """
    rid = F.col(row_id)
    sentence = _sentence_column(
        df.sparkSession, sentence_size, seed, skew_percent, rid
    )
    # Rate-aligned per-record sample timestamp (reference semantics:
    # recordTimestamp = startTime + eventsCount/rate, RateControlledSource-
    # Function.java:75-87). The rate sources emit exactly that as their
    # per-row `timestamp` column; batch golden runs (spark.range) synthesize
    # an equivalent unique-per-record base. current_timestamp() alone would
    # be constant per micro-batch -> colliding sample timestamps.
    if "timestamp" in df.columns:
        base_ms = F.unix_millis(F.col("timestamp"))
    else:
        # batch golden copies synthesize the rate source's record timestamp
        # spacing from the SAME rows_per_second a paired live run would use
        base_ms = F.unix_millis(F.current_timestamp()) + (rid * 1000).cast(
            "long"
        ) / F.lit(rows_per_second)
    sample_ts = F.when(F.pmod(rid, F.lit(sample_period)) == 0, base_ms).cast("long")
    return (
        df
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
    ramp_up_sec: int = 0,
    **sentence_kwargs,
) -> DataFrame:
    """Streaming sentence source at a controlled rate.

    rate-micro-batch pins rows per batch (deterministic batch sizing, the
    closest analog of the reference's sleep-to-timestamp loop at
    RateControlledSourceFunction.java:75-87); plain rate is wall-clock.

    ``ramp_up_sec`` (plain-rate only): the rate source backdates its clock
    to query start, which sits ~8 s of stream initialization before the
    first trigger — at full rate that manufactures a ~100k-row backlog that
    a pipeline running near capacity takes minutes to drain. Ramping over
    the init window keeps the backlog out of steady-state latency
    measurements without changing the steady rate.
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
        if ramp_up_sec > 0:
            reader = reader.option("rampUpTime", f"{ramp_up_sec}s")
    return with_sentences(reader.load(), **sentence_kwargs)


def batch_golden(spark: SparkSession, n_rows: int, **sentence_kwargs) -> DataFrame:
    """Batch regeneration of the identical stream prefix (golden check)."""
    return with_sentences(spark.range(n_rows).withColumnRenamed("id", "value"), **sentence_kwargs)
