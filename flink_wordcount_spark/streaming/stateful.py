"""Bit-exact CountWords parity: per-key running count with emit-on-sample.

Reference semantics (StatefulWordCount.java:134-180): state (a per-word
running Long) updates on EVERY record; an output row is emitted ONLY for
records carrying a sample timestamp (value.f0 != -1, :162-164), as
``(sample_ts, word, cumulative_count, source_id)``.

An idiomatic ``groupBy().count()`` in update mode emits per changed key per
micro-batch instead (SURVEY §2.3.3 accepts it as the primary mapping); this
module implements the exact-sampled variant with ``applyInPandasWithState``
— per-key state in the state store, arbitrary emission logic in an
Arrow-batched pandas function.

Determinism: rows are processed in ``seq`` order within each (key, batch), so
the cumulative value attached to each sampled record is reproducible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("sample_ts", LongType()),
        StructField("word", StringType()),
        StructField("cnt", LongType()),
        StructField("source_id", IntegerType()),
    ]
)

STATE_SCHEMA = StructType([StructField("cnt", LongType())])


def _count_words(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Reference CountWords.flatMap (StatefulWordCount.java:154-171) over an
    Arrow batch: state += 1 per row; emit running total at sampled rows."""
    (word,) = key
    (prev,) = state.get if state.exists else (0,)
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values("seq", kind="mergesort").reset_index(drop=True)
    running = prev + pd.RangeIndex(1, len(batch) + 1)
    sampled = batch["sample_ts"].notna()
    out = pd.DataFrame(
        {
            "sample_ts": batch.loc[sampled, "sample_ts"].astype("int64"),
            "word": word,
            "cnt": running[sampled.to_numpy()].astype("int64"),
            "source_id": batch.loc[sampled, "source_id"].astype("int32"),
        }
    )
    state.update((prev + len(batch),))
    yield out


def emit_on_sample_counts(tokens: DataFrame) -> DataFrame:
    """tokens: (sample_ts, word, source_id, seq) stream -> sampled running
    counts, exactly the reference's output tuple shape."""
    return tokens.groupBy("word").applyInPandasWithState(
        _count_words,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def final_state_counts(tokens: DataFrame) -> DataFrame:
    """Stateful-API word count emitting one (word, cnt) row per key per batch
    with the post-batch running total — with single-batch replay this equals
    the batch groupBy count (oracle-checkable driver entry)."""

    def totals(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (word,) = key
        (prev,) = state.get if state.exists else (0,)
        n = sum(len(p) for p in pdfs)
        total = prev + n
        state.update((total,))
        yield pd.DataFrame({"word": [word], "cnt": [total]})

    schema = StructType([StructField("word", StringType()), StructField("cnt", LongType())])
    return tokens.groupBy("word").applyInPandasWithState(
        totals,
        outputStructType=schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
