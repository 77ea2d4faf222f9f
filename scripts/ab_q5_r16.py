#!/usr/bin/env python3
"""Interleaved A/B for q5_local_supplier_volume (r16).

OLD (r15 shape): maybe_broadcast(c⋈n⋈r dims) — the join-output estimate is
inflated, the hint declines, and the fact-scale li⋈o output is shuffled +
sorted into a SortMergeJoin on o_custkey.
NEW (shipped): base-table hints — maybe_broadcast(customer projection) +
unconditional broadcast(nation⋈ASIA-region, 5 rows).
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bench import build_sf1, materialize  # noqa: E402
from flink_wordcount_spark.hints import maybe_broadcast  # noqa: E402
from flink_wordcount_spark.io import table  # noqa: E402
from flink_wordcount_spark.plans.relational_q import (  # noqa: E402
    _r,
    _rev,
    q5_local_supplier_volume,
)
from flink_wordcount_spark.session import get_spark  # noqa: E402


def old_q5(spark, sf_dir: str) -> DataFrame:
    r, n, c, o, li, s = (
        table(spark, sf_dir, t)
        for t in ("region", "nation", "customer", "orders", "lineitem", "supplier")
    )
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r.filter(r.r_name == "ASIA")), n.n_regionkey == r.r_regionkey
    )
    return (
        li.join(
            o.filter(
                (o.o_orderdate >= F.lit("1996-01-01").cast("timestamp"))
                & (o.o_orderdate < F.lit("1998-01-01").cast("timestamp"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(maybe_broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            maybe_broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(_r(F.sum(_rev())).alias("revenue"))
    )


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab_q5_r16")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = build_sf1(spark)
    scales = {"sf01": "/root/testdata/sf0.1", "sf1": sf1}
    builders = {"old": old_q5, "new": q5_local_supplier_volume}
    materialize(old_q5(spark, scales["sf01"]))  # warm

    eq = {}
    for tag, d in scales.items():
        a = sorted(tuple(x) for x in old_q5(spark, d).collect())
        b = sorted(tuple(x) for x in q5_local_supplier_volume(spark, d).collect())
        eq[tag] = a == b

    times = {w: {s: [] for s in scales} for w in builders}
    for p in range(passes):
        order = ("old", "new") if p % 2 == 0 else ("new", "old")
        for which in order:
            for tag, d in scales.items():
                spark.catalog.clearCache()
                t0 = time.time()
                spark.sparkContext.setJobDescription(f"ab_q5:{which}:{tag}:{p}")
                materialize(builders[which](spark, d))
                times[which][tag].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)

    # executed join strategies at sf1 for both shapes
    strat = {}
    for which, b in builders.items():
        df = b(spark, sf1)
        materialize(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        strat[which] = {
            "SMJ": len(re.findall(r"\bSortMergeJoin\b", plan)),
            "BHJ": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
            "Exchange": len(re.findall(r"\bExchange\b", plan)),
        }

    out = {"equal": eq, "executed_sf1": strat}
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
