"""Latency/throughput instrumentation (DummyLatencyCountingSink parity).

Reference (DummyLatencyCountingSink.java): per sampled element log
``LATENCY <sink_id> <sample_ts> <now_ms>``; every >=500ms log
``THROUGHPUT <sink_id> <records> <now_ms> <records/s>``; scraped into CSVs
``sink_id,timestamp,cur_time,latency`` (collect_latencies.sh:9-16).

Spark equivalents:
- throughput: StreamingQueryListener progress events already carry
  inputRowsPerSecond/batch durations — recorded per micro-batch.
- latency: a foreachBatch hook computes ``now - sample_ts`` for the sampled
  rows (the 1-in-N records carrying a timestamp) — same metric, same CSV.

Scale note: the recorder appends driver-side (metrics are tiny: one row per
batch + one per sampled record); the data path itself never collects.
"""

from __future__ import annotations

import csv
import random
import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Collects per-micro-batch throughput rows; ``to_csv`` dumps them with
    the reference CSV dialect (one row per progress event)."""

    def __init__(self) -> None:
        self.rows: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.rows.append(
            {
                "sink_id": p.name or p.id,
                "batch_id": p.batchId,
                "cur_time": p.timestamp,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def to_csv(self, path: str) -> None:
        if not self.rows:
            return
        with Path(path).open("w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(self.rows[0]))
            w.writeheader()
            w.writerows(self.rows)


class LatencyRecorder:
    """foreachBatch hook: per sampled record, record sink-arrival latency.

    CSV schema matches collect_latencies.sh:9-10:
    ``sink_id,timestamp,cur_time,latency``.
    """

    def __init__(
        self, path: str, ts_col: str = "sample_ts", key_col: str = "word"
    ) -> None:
        self.path = Path(path)
        self.ts_col = ts_col
        self.key_col = key_col
        # reference: random sink id in [0,1000) (DummyLatencyCountingSink.java:58-59)
        self.sink_id = random.Random(0).randrange(1000)
        # record-once semantics: update-mode aggregates re-emit a key's
        # max(sample_ts) on every later update of that key, which would
        # re-log a stale timestamp each batch and inflate 'latency' into
        # elapsed-time-since-sample. The reference sink logs each sampled
        # record exactly once (DummyLatencyCountingSink.java:63-65) — keyed
        # on (word, sample_ts), not bare sample_ts, so the ~sentence_size
        # distinct words sampled at one timestamp each get their own row.
        self._seen: set[tuple] = set()
        # monotonic floor on sample_ts, pushed down as a JVM-side filter:
        # update-mode re-emissions carry a key's OLD max(sample_ts), so
        # without the floor the per-batch collect grows with the cumulative
        # number of ever-sampled keys (measured: batch durations doubling
        # within 30 s at the reference rate). Sample timestamps are
        # generation-monotonic, so new samples always clear the floor.
        self._floor = 0
        self.path.write_text("sink_id,timestamp,cur_time,latency\n")

    def carry_over(self, prev: "LatencyRecorder") -> None:
        """Adopt a previous epoch's record-once set (kill/recover runs):
        update-mode re-emission of keys whose max(sample_ts) was ALREADY
        LOGGED pre-kill must not re-log those stale timestamps with
        post-recovery wall-clock, which would inflate 'latency' into
        time-since-kill.  The floor is deliberately NOT carried: an
        in-flight sample (taken pre-kill, first reaching the sink in the
        replayed batch) sits below the old floor but is absent from
        ``_seen`` — it must be logged, and its kill-inflated latency is the
        honest end-to-end number the reference sink would report.  The
        floor rebuilds from the first post-recovery batch."""
        self._seen |= prev._seen

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        cols = [self.ts_col]
        if self.key_col in batch_df.columns:
            cols.append(self.key_col)
        sampled = (
            batch_df.filter(F.col(self.ts_col) > F.lit(self._floor))
            .select(*cols)
            .collect()
        )
        now_ms = int(time.time() * 1000)
        with self.path.open("a", newline="") as f:
            w = csv.writer(f)
            for row in sampled:
                ts = row[self.ts_col]
                k = (row[self.key_col], ts) if len(cols) > 1 else (ts,)
                if k in self._seen:
                    continue
                self._seen.add(k)
                w.writerow([self.sink_id, ts, now_ms, now_ms - ts])
        if sampled:
            self._floor = max(self._floor, max(r[self.ts_col] for r in sampled))
            # _seen is retained, not cleared: past the floor it is only
            # consulted for floor-tied rows and for replayed batches after a
            # kill (where it is what separates logged-pre-kill samples from
            # in-flight ones). Memory is one tuple per sampled record — the
            # sample period keeps that ~1e4/min at the reference rate.
