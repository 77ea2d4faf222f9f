#!/usr/bin/env python3
"""Run measure_r16-style passes with host STEAL-TIME deltas per pass.

r16 finding: this host has bursty hypervisor CPU steal (cumulative ~8000 s
of steal in /proc/stat at round open; single queries swing 3 s <-> 60 s on
an otherwise idle box).  loadavg (bench.py's quiet gate) cannot see steal,
so every r16 absolute measurement records the steal share alongside the
wall time: passes with steal_pct above ~5% are storm-contaminated and
excluded from mins.

Usage: python scripts/steal_probe.py <out.json> <sf1|sf01> name1,name2 [passes]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_sf1, materialize  # noqa: E402
from flink_wordcount_spark.plans import QUERIES  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402


def cpu_totals() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from /proc/stat line 1."""
    parts = Path("/proc/stat").read_text().splitlines()[0].split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def main() -> int:
    out_path = Path(sys.argv[1])
    mode = sys.argv[2]
    names = sys.argv[3].split(",")
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    spark = get_spark("steal_probe")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["wordcount_stats"](spark, "/root/testdata/sf0.1").collect()
    dirs = {"sf01": "/root/testdata/sf0.1"}
    if mode == "sf1":
        dirs["sf1"] = build_sf1(spark)

    results: dict = {}
    for name in names:
        results[name] = {}
        for tag, sf_dir in dirs.items():
            rows = []
            for _ in range(passes):
                spark.catalog.clearCache()
                t_tot0, t_st0 = cpu_totals()
                t0 = time.time()
                materialize(QUERIES[name](spark, sf_dir))
                wall = time.time() - t0
                t_tot1, t_st1 = cpu_totals()
                d_tot = max(1, t_tot1 - t_tot0)
                rows.append(
                    {
                        "wall": round(wall, 3),
                        "steal_pct": round(100.0 * (t_st1 - t_st0) / d_tot, 2),
                    }
                )
                print(f"{name} {tag}: {rows[-1]}", flush=True)
            quiet = [r["wall"] for r in rows if r["steal_pct"] < 5.0]
            results[name][tag] = {
                "passes": rows,
                "min_all": min(r["wall"] for r in rows),
                "min_quiet": min(quiet) if quiet else None,
            }
        if "sf1" in results[name] and results[name]["sf01"]["min_quiet"]:
            q1 = results[name]["sf1"]["min_quiet"]
            q0 = results[name]["sf01"]["min_quiet"]
            results[name]["warm_ratio_quiet"] = (
                round(q1 / q0, 2) if q1 and q0 else None
            )
    out_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
