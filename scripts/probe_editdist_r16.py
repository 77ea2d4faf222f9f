#!/usr/bin/env python3
"""Dissect the dedup_edit_distance sf1 blowup (warm ratio 20.45, r16 sweep).

Counts, per scale: simhash candidate pairs (the lev gate's input), lev-gate
survivors, and the lev work proxy sum(max_len * (max_len/5)) over candidate
pairs — to attribute the 61.6 s sf1 wall between pair-count growth and
per-pair cost growth.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bench import build_sf1  # noqa: E402
from flink_wordcount_spark.io import table  # noqa: E402
from flink_wordcount_spark.plans.dedup_q import lsh_simhash64_md5  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402


def probe(spark, sf_dir: str) -> dict:
    t0 = time.time()
    pairs = lsh_simhash64_md5(spark, sf_dir).select("id_a", "id_b")
    d = table(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("id_a"), F.length("text").alias("la"))
    b = d.select(F.col("doc_id").alias("id_b"), F.length("text").alias("lb"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    ml = F.greatest("la", "lb")
    row = j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(ml * (ml / 5)).alias("lev_work_proxy"),
        F.sum(
            F.when(F.abs(F.col("la") - F.col("lb")) * 5 > ml, 1).otherwise(0)
        ).alias("n_len_reject"),
        F.avg(ml).alias("avg_max_len"),
        F.max(ml).alias("max_max_len"),
    ).collect()[0]
    out = row.asDict()
    out["probe_sec"] = round(time.time() - t0, 2)
    out["n_docs"] = d.count()
    return out


def main() -> int:
    spark = get_spark("probe_editdist")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = build_sf1(spark)
    res = {}
    for tag, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)]:
        spark.catalog.clearCache()
        res[tag] = probe(spark, sf_dir)
        print(tag, json.dumps(res[tag], default=str), flush=True)
    Path("plans/r16/probe_editdist.json").write_text(
        json.dumps(res, indent=1, default=str)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
