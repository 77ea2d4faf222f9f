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


class StreamingUpsertSink:
    """foreachBatch target: maintain a keyed table under streaming updates —
    the streaming MERGE shape (CDC apply without a lakehouse format).

    Each micro-batch upserts into a versioned parquet snapshot: new version
    dir = (previous snapshot anti-join batch keys) union batch rows, written
    to ``<root>/v=<batch_id>`` before ``_LATEST`` flips to it.  Replay-safe
    the same way IdempotentParquetSink is (a replayed batch_id finds its
    version already committed and skips), and readers always see a complete
    snapshot (version flip is a one-line pointer write, never an in-place
    mutation).

    At 100 TB you would use a format with transactional metadata (Iceberg/
    Delta/Hudi) and partition-level rewrite; the foreachBatch + anti-join +
    union core — and its exactly-once contract — is exactly what those
    writers do under the hood per commit.
    """

    def __init__(self, root: str, key: str) -> None:
        self.root = root
        self.key = key
        os.makedirs(root, exist_ok=True)

    def _vdir(self, batch_id: int) -> str:
        return os.path.join(self.root, f"v={batch_id}")

    def _latest_path(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        target = self._vdir(batch_id)
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            self._commit(batch_id)  # replay: version exists, just re-point
            return
        spark = batch_df.sparkSession
        latest = self.read(spark)
        merged = batch_df if latest is None else (
            latest.join(batch_df.select(self.key), self.key, "leftanti")
            .unionByName(batch_df)
        )
        merged.write.mode("overwrite").parquet(target)
        self._commit(batch_id)

    def _commit(self, batch_id: int) -> None:
        # Forward-only: recovery replays the LAST batch (highest id), so a
        # replayed older id must never point the table backwards.  Batch ids
        # are unique only within one query/checkpoint lineage — pair one
        # sink root with one checkpointLocation (a fresh query against an
        # old root would restart ids at 0 and silently collide).
        try:
            with open(self._latest_path()) as f:
                if batch_id < int(f.read().strip()):
                    return
        except FileNotFoundError:
            pass
        tmp = self._latest_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._latest_path())

    def read(self, spark) -> DataFrame | None:
        """Latest committed snapshot, or None before the first commit."""
        try:
            with open(self._latest_path()) as f:
                v = int(f.read().strip())
        except FileNotFoundError:
            return None
        return spark.read.parquet(self._vdir(v))
