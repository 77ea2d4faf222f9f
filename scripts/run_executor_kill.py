#!/usr/bin/env python3
"""Run the executor hard-kill drill N times and publish the MEDIAN.

Usage: python scripts/run_executor_kill.py [--runs N] [--out FILE]

VERDICT r11 #3: kill-to-next-commit is a noisy quantity (3.3-7.4 s across
committed single runs); the docs must quote a median measured in one
session, never whichever single run last wrote the artifact.  This script
runs ``killdrill.run_drill`` N >= 3 times back-to-back, asserts
exactly-once held in EVERY run, and writes the median + full run list to
the round artifact (default ``EXECUTOR_KILL_r12.json``).  SCALE.md and
COVERAGE.md cite the median from this file.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flink_wordcount_spark.streaming.killdrill import run_drill  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    args = sys.argv[1:]
    runs, out = 3, REPO_ROOT / "EXECUTOR_KILL_r12.json"
    while args:
        a = args.pop(0)
        if a == "--runs":
            runs = int(args.pop(0))
        elif a == "--out":
            out = Path(args.pop(0))
    if runs < 3:
        raise SystemExit("--runs must be >= 3: a median of fewer is a best-of")
    results = []
    for i in range(runs):
        with tempfile.TemporaryDirectory(prefix="killdrill_") as tmp:
            t0 = time.time()
            r = run_drill(tmp)
            print(
                f"run {i + 1}/{runs}: kill_to_next_commit_sec="
                f"{r['kill_to_next_commit_sec']} exactly_once_ok="
                f"{r['exactly_once_ok']} ({time.time() - t0:.0f}s total)",
                flush=True,
            )
            results.append(r)
    secs = [r["kill_to_next_commit_sec"] for r in results]
    artifact = {
        "experiment": results[0]["experiment"],
        "reference_analog": results[0]["reference_analog"],
        "n_runs": runs,
        "kill_to_next_commit_sec_median": round(statistics.median(secs), 2),
        "kill_to_next_commit_sec_runs": secs,
        "kill_to_next_commit_sec_spread": [min(secs), max(secs)],
        "exactly_once_ok_all_runs": all(r["exactly_once_ok"] for r in results),
        "distinct_words": results[0]["distinct_words"],
    }
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps(artifact))
    return 0 if artifact["exactly_once_ok_all_runs"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
