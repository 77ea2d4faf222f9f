#!/usr/bin/env python3
"""Benchmark driver: headline queries + streaming wordcount throughput.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "streaming": {...}}

The streaming section reports words/s through the full reference pipeline
(generator -> tokenizer -> stateful count), comparable to BASELINE.md's
1.25M words/s/worker design point.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from flink_wordcount_spark.plans import QUERIES  # noqa: E402
from flink_wordcount_spark.session import get_spark  # noqa: E402

#: Headline set: the scale-critical shapes (fact-table aggs, multi-join,
#: window, near-dedup, ANN, streaming, Arrow UDF path).
HEADLINE = [
    "wordcount_top100",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "join_range",
    "agg_cube",
    "window_running_sum",
    "ev_session_window",
    "dedup_ngram_jaccard",
    "dedup_minhash_verified",
    "embed_cosine_topk",
    "text_quality",
    "mm_featurize",
    "stream_wordcount_file",
]

# Streaming throughput workload: sentences x words/sentence (reference
# operating point: 100-word sentences, StatefulWordCount.java:64).
STREAM_SENTENCES = int(os.environ.get("SPARK_GRAFT_BENCH_SENTENCES", "50000"))
SENTENCE_SIZE = 100


def materialize(df) -> int:
    """Execute the full plan without driver-side transfer (noop batch sink);
    returns row count via the cheaper count() only for reporting."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_streaming(spark) -> dict:
    """Words/s through generator -> tokenizer -> stateful running count."""
    import tempfile

    from flink_wordcount_spark.streaming.sentences import batch_golden
    from flink_wordcount_spark.streaming.wordcount import run_to_completion
    from flink_wordcount_spark.operators.text import tokenize
    from pyspark.sql import functions as F

    path = os.path.join(
        tempfile.gettempdir(), f"fws_bench_{STREAM_SENTENCES}x{SENTENCE_SIZE}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        batch_golden(
            spark, STREAM_SENTENCES, sentence_size=SENTENCE_SIZE, sample_period=1000
        ).write.mode("overwrite").parquet(path)

    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    counts = (
        tokenize(stream, text_col="sentence", out_col="word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t0 = time.time()
    result = run_to_completion(counts, output_mode="complete")
    total_words = sum(r.cnt for r in result.collect())
    dt = time.time() - t0
    return {
        "sentences": STREAM_SENTENCES,
        "sentence_size": SENTENCE_SIZE,
        "words_total": total_words,
        "elapsed_sec": round(dt, 3),
        "words_per_sec": round(total_words / dt),
        "sentences_per_sec": round(STREAM_SENTENCES / dt),
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen path once so per-query numbers measure the plan
    QUERIES["wordcount_stats"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        materialize(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    streaming = bench_streaming(spark)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "streaming": streaming,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
