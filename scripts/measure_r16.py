#!/usr/bin/env python3
"""r16 optimization-round measurement harness (guide §1).

Two modes:

- default (sf0.1 wall time): min-of-N noop-sink passes, clearCache between
  runs — bench.py's methodology, same as scripts/measure_r15.py.
- ``--sf1``: the r16 battleground (VERDICT r15 #3: sf0.1 wall time is
  overhead-bound — 8-core ≈ 32-core on every headline query — so r16 claims
  need sf1 evidence).  Reuses bench.build_sf1 (10 key-shifted replicas of
  sf0.1, documents text-mutated) and measures the CONTROLLED-WARM ratio the
  driver's bench ledgers: min-of-3 per scale, scales back-to-back in one
  JVM, ratio of mins.

Usage:
  python scripts/measure_r16.py [--sf DIR] [--passes N] [--explain TAG] \
        [--names a,b,c] [--sf1] [--out FILE]

Defaults: bench.py's HEADLINE list, sf0.1, 3 passes, no explain dump.
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE, build_sf1, materialize  # noqa: E402
from flink_wordcount_spark.plans import QUERIES  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchanges": len(re.findall(r"\bReusedExchange\b", plan)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "broadcast_hash_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "python_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", plan)
        ),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def _timed(spark, name: str, sf_dir: str, passes: int) -> list[float]:
    times = []
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"measure:{name}:{sf_dir.rsplit('/', 1)[-1]}")
        materialize(QUERIES[name](spark, sf_dir))
        spark.sparkContext.setJobDescription(None)
        times.append(round(time.time() - t0, 3))
    spark.catalog.clearCache()
    return times


def main() -> int:
    args = sys.argv[1:]
    sf_dir, passes, explain_tag, names = "/root/testdata/sf0.1", 3, None, list(HEADLINE)
    sf1_mode, out_file = False, None
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)
        elif a == "--passes":
            passes = int(args.pop(0))
        elif a == "--explain":
            explain_tag = args.pop(0)
        elif a == "--names":
            names = args.pop(0).split(",")
        elif a == "--sf1":
            sf1_mode = True
        elif a == "--out":
            out_file = args.pop(0)
    spark = get_spark("measure_r16")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen path once (bench.py parity)
    QUERIES["wordcount_stats"](spark, sf_dir).collect()

    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)
    results: dict[str, dict] = {}

    sf1_dir = None
    if sf1_mode:
        t0 = time.time()
        sf1_dir = build_sf1(spark)
        print(f"sf1 built/reused at {sf1_dir} in {time.time() - t0:.1f}s", flush=True)

    for name in names:
        times = _timed(spark, name, sf_dir, passes)
        row: dict = {"sec_min": min(times), "sec_all": times}
        if sf1_mode:
            big = _timed(spark, name, sf1_dir, passes)
            row["sf1_sec_min"] = min(big)
            row["sf1_sec_all"] = big
            row["warm_ratio"] = (
                round(min(big) / min(times), 2) if min(times) > 0 else None
            )
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        row.update(plan_stats(plan))
        if explain_tag:
            (out_dir / f"{name}_{explain_tag}.txt").write_text(plan)
        results[name] = row
        print(f"{name}: {row}", flush=True)

    payload = {
        "sf_dir": sf_dir,
        "passes": passes,
        "sf1": sf1_mode,
        "results": results,
        "total_min_sec": round(sum(r["sec_min"] for r in results.values()), 3),
    }
    if out_file:
        Path(out_file).write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
