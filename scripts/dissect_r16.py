#!/usr/bin/env python3
"""Execute a query at sf0.1 and synthetic sf1 and dump the EXECUTED
(post-AQE) plans — the r16 scale-dissection tool (guide §7.2).

The initial plan (`explain`) shows `isFinalPlan=false`; the strategies that
matter for the sf1 warm-ratio outliers (did a broadcast flip to sort-merge?
did AQE coalesce a verify stage to one task?) only appear in the executed
plan after an action.

Usage: python scripts/dissect_r16.py <query> [<query> ...] [--sf01-only]
Writes plans/r16/<query>_exec_{sf01,sf1}.txt and prints a one-line digest.
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_sf1, materialize  # noqa: E402
from flink_wordcount_spark.plans import QUERIES  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402


def digest(plan: str) -> str:
    counts = {
        "Exch": len(re.findall(r"\bExchange\b", plan)),
        "Reused": len(re.findall(r"ReusedExchange|ReusedQueryStage", plan)),
        "SMJ": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "SHJ": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "BHJ": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "AQERead": len(re.findall(r"AQEShuffleRead", plan)),
        "coalesced": len(re.findall(r"coalesced", plan)),
    }
    return " ".join(f"{k}={v}" for k, v in counts.items())


def main() -> int:
    args = sys.argv[1:]
    sf01_only = "--sf01-only" in args
    names = [a for a in args if not a.startswith("--")]
    spark = get_spark("dissect_r16")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["wordcount_stats"](spark, "/root/testdata/sf0.1").collect()
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)

    scales = [("sf01", "/root/testdata/sf0.1")]
    if not sf01_only:
        sf1_dir = build_sf1(spark)
        scales.append(("sf1", sf1_dir))

    for name in names:
        for tag, d in scales:
            spark.catalog.clearCache()
            df = QUERIES[name](spark, d)
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"dissect:{name}:{tag}")
            materialize(df)
            sec = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            executed = df._jdf.queryExecution().executedPlan().toString()
            (out_dir / f"{name}_exec_{tag}.txt").write_text(executed)
            print(f"{name} [{tag}] {sec:.2f}s  {digest(executed)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
