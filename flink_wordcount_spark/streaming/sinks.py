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

    Intra-batch key duplicates (CDC batches carrying several updates to one
    key): pass ``order_col`` (e.g. the change's event-time or LSN column)
    and the sink keeps the last write per key within the batch before
    merging. Without ``order_col`` the batch is REQUIRED to be unique per
    key — the usual contract for update-mode streaming aggregates, which
    emit one row per changed key per batch — because the anti-join only
    removes prior-snapshot rows, so duplicates inside one batch would both
    survive and break the keyed-table invariant.
    """

    def __init__(self, root: str, key: str, order_col: str | None = None) -> None:
        self.root = root
        self.key = key
        self.order_col = order_col
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
        if self.order_col is not None:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            w = Window.partitionBy(self.key).orderBy(F.col(self.order_col).desc())
            batch_df = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
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
