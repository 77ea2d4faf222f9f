#!/usr/bin/env python3
"""Interleaved A/B for the q3_shipping_priority join order (r16).

OLD (shipped): li BHJ-probes date-filtered orders (ALL segments, broadcast),
then BHJ-probes BUILDING customers.
NEW: customers join INTO orders first (dim-first), so lineitem probes ONE
broadcast that is ~1/5 the rows.

Also times the two candidate broadcast builds alone (guide §1: find which
stage grows before crediting a fix).
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
from flink_wordcount_spark.hints import maybe_broadcast  # noqa: E402
from flink_wordcount_spark.io import table  # noqa: E402
from flink_wordcount_spark.plans.relational_q import _r, _rev  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402


def old_q3(spark, sf_dir: str) -> DataFrame:
    c, o, li = (table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .join(
            o.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            maybe_broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(_r(F.sum(_rev())).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def new_q3(spark, sf_dir: str) -> DataFrame:
    c, o, li = (table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    o2 = (
        o.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .join(
            maybe_broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .join(maybe_broadcast(o2), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(_r(F.sum(_rev())).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab_q3_r16")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = build_sf1(spark)
    scales = {"sf01": "/root/testdata/sf0.1", "sf1": sf1}
    builders = {"old": old_q3, "new": new_q3}
    materialize(old_q3(spark, scales["sf01"]))  # warm

    # stage probe: the broadcast-side builds alone at sf1 (count = collect-free)
    o = table(spark, sf1, "orders")
    c = table(spark, sf1, "customer")
    probe = {}
    for tag, df in {
        "orders_datefilter_rows": o.filter(
            F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
        ),
        "orders_joined_building_rows": o.filter(
            F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
        ).join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        ),
    }.items():
        probe[tag] = df.count()

    times = {w: {s: [] for s in scales} for w in builders}
    for p in range(passes):
        order = ("old", "new") if p % 2 == 0 else ("new", "old")
        for which in order:
            for tag, d in scales.items():
                spark.catalog.clearCache()
                t0 = time.time()
                spark.sparkContext.setJobDescription(f"ab_q3:{which}:{tag}:{p}")
                materialize(builders[which](spark, d))
                times[which][tag].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)

    # result equality check (both scales)
    eq = {}
    for tag, d in scales.items():
        a = [tuple(r) for r in old_q3(spark, d).collect()]
        b = [tuple(r) for r in new_q3(spark, d).collect()]
        eq[tag] = a == b
    out = {"probe_rows": probe, "equal": eq}
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
