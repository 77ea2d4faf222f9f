#!/usr/bin/env python3
"""Interleaved A/B for the r16 `_shared_span_profile` restructure.

OLD (r15 shape): span-freq groupBy -> shared list -> join sp back -> per-doc
counts (3 shingle passes, corpus-scaling broadcast).
NEW (shipped): freq + min(id) in one aggregate; n_shared by complement
(2 shingle passes, no sp join).

Interleaved same-process min-of-N per config per scale (r15 discipline:
one-shot sweeps produce phantom wins).  Prints per-scale mins + warm ratios.
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
from flink_wordcount_spark.operators.dedup import shingle_hashes  # noqa: E402
from flink_wordcount_spark.plans.dedup_q import (  # noqa: E402
    _SPAN_W,
    _shared_span_profile,
)
from flink_wordcount_spark.session import get_spark  # noqa: E402


def old_profile(sp: DataFrame, key: str) -> DataFrame:
    shared = (
        sp.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select(key)
    )
    totals = sp.groupBy("id").agg(F.count(F.lit(1)).alias("n_spans"))
    hits = sp.join(shared, key).groupBy("id").agg(F.count(F.lit(1)).alias("n_shared"))
    return hits.join(totals, "id").select(
        F.col("id").alias("doc_id"),
        "n_spans",
        "n_shared",
        (F.col("n_shared") / F.col("n_spans")).alias("shared_frac"),
    )


def build(which: str, spark, sf_dir: str) -> DataFrame:
    sp = shingle_hashes(table(spark, sf_dir, "documents"), "text", "doc_id", n=_SPAN_W)
    return old_profile(sp, "h") if which == "old" else _shared_span_profile(sp, "h")


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_shared_spans_r16")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = build_sf1(spark)
    scales = {"sf01": "/root/testdata/sf0.1", "sf1": sf1}
    # warm
    materialize(build("new", spark, scales["sf01"]))
    times: dict[str, dict[str, list[float]]] = {
        w: {s: [] for s in scales} for w in ("old", "new")
    }
    for p in range(passes):
        for which in ("old", "new") if p % 2 == 0 else ("new", "old"):
            for tag, d in scales.items():
                spark.catalog.clearCache()
                t0 = time.time()
                spark.sparkContext.setJobDescription(f"ab:{which}:{tag}:{p}")
                materialize(build(which, spark, d))
                times[which][tag].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
    out = {}
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
