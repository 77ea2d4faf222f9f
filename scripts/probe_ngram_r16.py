#!/usr/bin/env python3
"""Quantify the dedup_ngram_jaccard inverted-index blowup at sf0.1 vs sf1.

For the shingle-hash stream: total co-occurring pair multiplicity
sum(df*(df-1)/2) — the rows the current self-join + pair aggregate carry —
vs the same sum restricted to PREFIX members (rarest ceil(0.2*n)+1 shingles
per doc under (df, h) order), i.e. the rows a prefix-filtered candidate
join would carry.  t_eff = 0.8 - 1e-6 (round-before-compare safety).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import build_sf1  # noqa: E402
from flink_wordcount_spark.io import table  # noqa: E402
from flink_wordcount_spark.operators.dedup import shingle_hashes  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402

T_EFF = 0.8 - 1e-6


def probe(spark, sf_dir: str) -> dict:
    t0 = time.time()
    d = table(spark, sf_dir, "documents")
    sh = shingle_hashes(d, "text", "doc_id", n=3)
    df = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    total_pairs = df.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("p"),
        F.max("df").alias("max_df"),
        F.count(F.lit(1)).alias("n_keys"),
    ).collect()[0]
    tagged = sh.join(df, "h")
    w = Window.partitionBy("id")
    rn = F.row_number().over(w.orderBy("df", "h"))
    n = F.count(F.lit(1)).over(w)
    pref = (
        tagged.withColumn("rn", rn)
        .withColumn("n", n)
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(T_EFF) * F.col("n")) + 1)
    )
    pdf = pref.groupBy("h").agg(F.count(F.lit(1)).alias("pdf"))
    pref_pairs = pdf.agg(
        F.sum(F.col("pdf") * (F.col("pdf") - 1) / 2).alias("p"),
        F.max("pdf").alias("max_pdf"),
    ).collect()[0]
    return {
        "join_pair_multiplicity": int(total_pairs["p"]),
        "max_df": total_pairs["max_df"],
        "n_distinct_shingles": total_pairs["n_keys"],
        "prefix_pair_multiplicity": int(pref_pairs["p"]),
        "max_prefix_df": pref_pairs["max_pdf"],
        "reduction_x": round(total_pairs["p"] / max(1, pref_pairs["p"]), 1),
        "probe_sec": round(time.time() - t0, 2),
    }


def main() -> int:
    spark = get_spark("probe_ngram")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = build_sf1(spark)
    res = {}
    for tag, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)]:
        res[tag] = probe(spark, sf_dir)
        print(tag, json.dumps(res[tag]), flush=True)
    Path("plans/r16/probe_ngram_prefix.json").write_text(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
