"""The reference's sentence generator as a first-class Python DataSource.

Spark 4's pyspark.sql.datasource API lets the seeded generator
(``streaming/sentences.py``) register as a real ``spark.read.format(...)``
source instead of a transform over ``spark.range`` — the idiomatic mapping
of the reference's RichParallelSourceFunction
(RateControlledSourceFunction.java:11-124): ``partitions()`` plays the role
of the parallel source instances, each reading a disjoint, deterministic
id range, so output is identical at ANY parallelism and replayable from
(seed, row_id) alone.

Usage::

    register_sentence_source(spark)
    df = (spark.read.format("sentences")
          .option("n", 2000).option("size", 20).option("seed", 42)
          .option("numPartitions", 8).load())   # (seq bigint, sentence string)

The generation core is shared with the streaming UDF path
(``sentences_for_ids``) — one implementation, so the DataSource and the
rate-source stream can never drift.

DEPLOYMENT (ADVICE r07, built r09): ``_PKG_ROOT`` below captures the repo's
absolute path at import time and ``read()`` re-inserts it into ``sys.path``
on the executor — the local-mode fast path (workers share the driver's
filesystem).  On a real cluster the package travels with the job instead:
``packaging.ship_package(spark)`` zips ``flink_wordcount_spark`` and
``addPyFile``s it (``session.get_spark`` does this automatically for
non-local masters), after which this insert is a harmless no-op; the
executor import path from the zip alone — repo stripped from ``sys.path``
— is pinned by ``tests/test_packaging.py``.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: repo root captured at class-definition time; read() re-inserts it on the
#: executor worker so the shared generator module imports anywhere
_PKG_ROOT = str(Path(__file__).resolve().parents[2])


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SentenceBatchReader(DataSourceReader):
    """Parallel batch reader: disjoint id ranges, deterministic content."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.size = int(options.get("size", 100))
        self.seed = int(options.get("seed", 42))
        self.skew = int(options.get("skew", 0))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self):  # the "parallel source instances"
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _IdRange(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _IdRange):
        if _PKG_ROOT not in sys.path:
            sys.path.insert(0, _PKG_ROOT)
        import numpy as np

        from flink_wordcount_spark.streaming.sentences import (
            sentences_for_ids,
            wordlist,
        )

        rids = np.arange(partition.start, partition.end, dtype=np.uint64)
        if len(rids) == 0:
            return
        words = np.array(wordlist(), dtype=object)
        for rid, s in zip(
            rids.tolist(),
            sentences_for_ids(rids, self.size, self.seed, self.skew, words),
        ):
            yield (int(rid), s)


class SentenceDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sentences"

    def schema(self) -> str:
        return "seq bigint, sentence string"

    def reader(self, schema) -> SentenceBatchReader:
        return SentenceBatchReader(self.options)

    def simpleStreamReader(self, schema) -> "SentenceStreamReader":
        return SentenceStreamReader(self.options)


def register_sentence_source(spark) -> None:
    """Idempotent ``spark.dataSource.register`` of the sentences format."""
    spark.dataSource.register(SentenceDataSource)


class SentenceStreamReader(SimpleDataSourceStreamReader):
    """Streaming reader: rate-micro-batch semantics over the same generator.

    Offsets are plain row positions, so ``readBetweenOffsets`` (replay after
    restart) regenerates EXACTLY the rows of the original batch — the
    reference's ListCheckpointed source-replay contract
    (RateControlledSourceFunction.java:102-123) falls out of deterministic
    generation instead of snapshotted state.  ``n`` caps the stream (the
    reference's maxEvents); once reached the reader reports no new data.

    Scale note: the Simple reader generates on the DRIVER (per the API
    contract) — right for control-plane-sized rates; a cluster-scale
    generator would implement the partitioned DataSourceStreamReader the
    same way the batch reader above partitions its id range.
    """

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.size = int(options.get("size", 100))
        self.seed = int(options.get("seed", 42))
        self.skew = int(options.get("skew", 0))
        self.rows_per_batch = int(options.get("rowsperbatch", 500))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _gen(self, start: int, end: int):
        if _PKG_ROOT not in sys.path:
            sys.path.insert(0, _PKG_ROOT)
        import numpy as np

        from flink_wordcount_spark.streaming.sentences import (
            sentences_for_ids,
            wordlist,
        )

        rids = np.arange(start, end, dtype=np.uint64)
        if len(rids) == 0:
            return []
        words = np.array(wordlist(), dtype=object)
        return [
            (int(r), s)
            for r, s in zip(
                rids.tolist(),
                sentences_for_ids(rids, self.size, self.seed, self.skew, words),
            )
        ]

    def read(self, start: dict):
        lo = start["row"]
        hi = min(lo + self.rows_per_batch, self.n)
        return iter(self._gen(lo, hi)), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._gen(start["row"], end["row"]))


