#!/usr/bin/env python3
"""Streaming latency lever sweep (VERDICT r03 #4).

Measures end-to-end sampled-record latency (DummyLatencyCountingSink parity,
reference rate 12,500 sentences/s) across the candidate levers, ONE CONFIG
PER JVM — stopped streaming queries leave state-store caches on the heap, so
in-process sweeps degrade monotonically and mis-rank the levers.

Usage:
  python scripts/latency_sweep.py            # full sweep, prints a table
  python scripts/latency_sweep.py --one '<json config>'   # internal: one run

Each config: {"name": ..., "trigger_sec": ..., "partitions": ...,
              "changelog": true/false, "extra": {conf: value}}
Results print as JSON lines; the final line is a summary table (also written
to LATENCY_SWEEP.json at the repo root for SCALE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

RUN_SEC = int(os.environ.get("SPARK_GRAFT_SWEEP_SEC", "30"))

CONFIGS = [
    # r02/r03 operating point: the baseline to beat
    {"name": "base_1s_16p_snapshot", "trigger_sec": 1.0, "partitions": 16,
     "changelog": False, "extra": {}},
    # lever 1: changelog checkpointing alone (commit = delta append)
    {"name": "changelog_1s_16p", "trigger_sec": 1.0, "partitions": 16,
     "changelog": True, "extra": {}},
    # lever 2: shorter trigger (needs lever 1's fast commits to not queue)
    {"name": "changelog_500ms_16p", "trigger_sec": 0.5, "partitions": 16,
     "changelog": True, "extra": {}},
    {"name": "changelog_250ms_16p", "trigger_sec": 0.25, "partitions": 16,
     "changelog": True, "extra": {}},
    {"name": "changelog_100ms_16p", "trigger_sec": 0.1, "partitions": 16,
     "changelog": True, "extra": {}},
    # lever 3: partition count at the best trigger
    {"name": "changelog_250ms_8p", "trigger_sec": 0.25, "partitions": 8,
     "changelog": True, "extra": {}},
    {"name": "changelog_250ms_32p", "trigger_sec": 0.25, "partitions": 32,
     "changelog": True, "extra": {}},
    # lever 4: async progress tracking (offset/commit log writes off the
    # critical path) on top of the best synchronous config
    {"name": "changelog_250ms_16p_async", "trigger_sec": 0.25, "partitions": 16,
     "changelog": True,
     "extra": {"spark.sql.streaming.asyncProgressTrackingEnabled": "true"}},
    # control: default HDFS-backed store at the best trigger (is RocksDB
    # itself on the floor?)
    {"name": "defaultstore_250ms_16p", "trigger_sec": 0.25, "partitions": 16,
     "changelog": False, "extra": {},
     "provider": "default"},
]


def run_one(cfg: dict) -> dict:
    import bench
    from flink_wordcount_spark.session import get_spark

    spark = get_spark(f"latency_sweep_{cfg['name']}")
    spark.sparkContext.setLogLevel("ERROR")
    extra = dict(cfg.get("extra", {}))
    if cfg.get("provider") != "default":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            bench.ROCKSDB_PROVIDER,
        )
    extra[
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    ] = "true" if cfg.get("changelog") else "false"
    res = bench.bench_latency(
        spark,
        trigger_sec=cfg["trigger_sec"],
        partitions=cfg["partitions"],
        extra_confs=extra,
        run_sec=RUN_SEC,
    )
    res["name"] = cfg["name"]
    spark.stop()
    return res


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        print("SWEEPRESULT " + json.dumps(run_one(json.loads(sys.argv[2]))))
        return 0

    results = []
    for cfg in CONFIGS:
        proc = subprocess.run(
            [sys.executable, __file__, "--one", json.dumps(cfg)],
            capture_output=True, text=True, timeout=600, cwd=str(ROOT),
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("SWEEPRESULT ")),
            None,
        )
        if line is None:
            results.append({"name": cfg["name"], "error": proc.stderr[-500:]})
        else:
            results.append(json.loads(line[len("SWEEPRESULT "):]))
        r = results[-1]
        print(json.dumps(r))
    out = {"run_sec_per_config": RUN_SEC, "results": results}
    (ROOT / "LATENCY_SWEEP.json").write_text(json.dumps(out, indent=1))
    print(f"wrote {ROOT / 'LATENCY_SWEEP.json'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
