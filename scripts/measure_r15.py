#!/usr/bin/env python3
"""r15 optimization-round measurement harness (guide §1).

Times each named query with the noop sink (min over N passes, clearCache
between runs — bench.py's methodology) and optionally dumps
``.explain("formatted")`` to plans/r15/<name>_<tag>.txt so before/after
plan shapes are committed evidence.

Usage:
  python scripts/measure_r15.py [--sf DIR] [--passes N] [--explain TAG] \
        [--names a,b,c]

Defaults: bench.py's HEADLINE list, sf0.1, 3 passes, no explain dump.
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE, materialize  # noqa: E402
from flink_wordcount_spark.plans import QUERIES  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchanges": len(re.findall(r"\bReusedExchange\b", plan)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "broadcast_hash_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "python_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow", plan)
        ),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> int:
    args = sys.argv[1:]
    sf_dir, passes, explain_tag, names = "/root/testdata/sf0.1", 3, None, list(HEADLINE)
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
    spark = get_spark("measure_r15")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen path once (bench.py parity)
    QUERIES["wordcount_stats"](spark, sf_dir).collect()

    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    results: dict[str, dict] = {}
    for name in names:
        times = []
        for _ in range(passes):
            spark.catalog.clearCache()
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"measure:{name}")
            materialize(QUERIES[name](spark, sf_dir))
            spark.sparkContext.setJobDescription(None)
            times.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        stats = plan_stats(plan)
        if explain_tag:
            (out_dir / f"{name}_{explain_tag}.txt").write_text(plan)
        results[name] = {"min_sec": min(times), "runs": times, **stats}
        print(f"{min(times):7.3f}s  {name}  {stats}", flush=True)
    total = round(sum(r["min_sec"] for r in results.values()), 3)
    print(json.dumps({"sf_dir": sf_dir, "total_min_sec": total}))
    (out_dir / f"measure_{explain_tag or 'run'}.json").write_text(
        json.dumps({"sf_dir": sf_dir, "total_min_sec": total, "queries": results}, indent=1)
        + "\n"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
