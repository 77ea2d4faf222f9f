"""CountWords on the Spark 4 stateful-processor API (transformWithStateInPandas).

Same semantics as stateful.py's applyInPandasWithState implementation
(reference CountWords, StatefulWordCount.java:134-180) on the newer API:
explicit named ValueState, per-key Arrow-batched processing, Update mode.

Environment gate: transformWithState's Python state-server worker imports
``google.protobuf``, which is not functional in this container — check
``tws_available()`` before use (the applyInPandasWithState path in
stateful.py is the primary, always-available implementation). It also needs
the RocksDB state store provider conf (set in ``tws_wordcount``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [StructField("word", StringType()), StructField("cnt", LongType())]
)


class RunningCountProcessor(StatefulProcessor):
    """Per-word running total in a named ValueState; emits the post-batch
    total per key (single-batch replay -> equals the batch groupBy count)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("cnt", "cnt BIGINT")

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        prev = self._count.get()[0] if self._count.exists() else 0
        n = sum(len(p) for p in rows)
        total = prev + n
        self._count.update((total,))
        yield pd.DataFrame({"word": [key[0]], "cnt": [total]})

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """True iff the protobuf runtime transformWithState depends on imports."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def tws_wordcount(tokens: DataFrame) -> DataFrame:
    """tokens(word) stream -> (word, running cnt) via transformWithStateInPandas."""
    tokens.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return tokens.groupBy("word").transformWithStateInPandas(
        statefulProcessor=RunningCountProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
