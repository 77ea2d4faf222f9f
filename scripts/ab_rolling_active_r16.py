#!/usr/bin/env python3
"""Interleaved A/B for ev_rolling_active_users (r16).

OLD (r15 shape): (user,day) distinct -> x7 fan explode -> broadcast
semi-join on observed days -> two-phase count-distinct over 7x rows.
NEW (shipped): per-user collect_set -> coverage-interval deltas -> running
sum over the calendar-bounded day grid.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bench import build_sf1, materialize  # noqa: E402
from flink_wordcount_spark.io import table  # noqa: E402
from flink_wordcount_spark.plans.events_q import ev_rolling_active_users  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402


def old_shape(spark, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = daily.select("day").distinct()
    fan = daily.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        F.col("day").alias("src_day"),
    ).select("user_id", F.date_add("src_day", F.col("off")).alias("day"))
    return (
        fan.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "active_7d")
    )


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab_rolling_r16")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = build_sf1(spark)
    scales = {"sf01": "/root/testdata/sf0.1", "sf1": sf1}
    builders = {"old": old_shape, "new": ev_rolling_active_users}
    materialize(old_shape(spark, scales["sf01"]))  # warm

    eq = {}
    for tag, d in scales.items():
        a = sorted(tuple(r) for r in old_shape(spark, d).collect())
        b = sorted(tuple(r) for r in ev_rolling_active_users(spark, d).collect())
        eq[tag] = a == b

    times = {w: {s: [] for s in scales} for w in builders}
    for p in range(passes):
        order = ("old", "new") if p % 2 == 0 else ("new", "old")
        for which in order:
            for tag, d in scales.items():
                spark.catalog.clearCache()
                t0 = time.time()
                spark.sparkContext.setJobDescription(f"ab_rolling:{which}:{tag}:{p}")
                materialize(builders[which](spark, d))
                times[which][tag].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)

    out = {"equal": eq}
    for which, per in times.items():
        mins = {tag: min(v) for tag, v in per.items()}
        out[which] = {
            "all": per,
            "min": mins,
            "warm_ratio": round(mins["sf1"] / mins["sf01"], 2),
        }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
