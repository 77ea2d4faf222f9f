"""Exactly-once batch sinks for streaming queries.

Structured Streaming guarantees at-least-once foreachBatch invocation after
recovery: a batch can be REPLAYED with the same batch_id. Exactly-once
delivery to a file sink therefore needs idempotence keyed on batch_id —
write each micro-batch to ``<root>/batch_id=<id>`` and skip ids that already
committed. Combined with checkpointed offsets this yields end-to-end
exactly-once for the file target (the reference gets the same property from
source-replay checkpoints + a side-effect-free sink,
RateControlledSourceFunction.java:102-123).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class IdempotentParquetSink:
    """foreachBatch target: one parquet dir per micro-batch, replay-safe."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _dir(self, batch_id: int) -> str:
        return os.path.join(self.root, f"batch_id={batch_id}")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        target = self._dir(batch_id)
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # replayed batch: already committed, skip (idempotence)
        batch_df.write.mode("overwrite").parquet(target)

    def read(self, spark) -> DataFrame:
        return spark.read.option("basePath", self.root).parquet(self.root)
