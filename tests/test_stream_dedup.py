"""Cross-micro-batch semantics of the streaming MinHash-LSH admission
registry (BucketClaimProcessor) — the property the single-file staged
replay cannot witness: ownership must persist ACROSS batches, so a
bucket claimed in batch 1 blocks a doc_id-ordered claimant arriving in
batch 2, while a fresh bucket in batch 2 admits."""

from __future__ import annotations

import os
import time


def test_bucket_claims_block_across_batches(spark, tmp_path):
    from flink_wordcount_spark.streaming.tws import tws_bucket_claims
    from flink_wordcount_spark.streaming.wordcount import run_to_completion

    src = str(tmp_path / "claims")
    os.makedirs(src)

    def stage(rows, fname):
        spark.createDataFrame(
            rows, "doc_id long, band_idx int, band_key string"
        ).coalesce(1).write.mode("append").parquet(src + "_tmp_" + fname)
        # move the single part file in under a deterministic name
        part = [
            f
            for f in os.listdir(src + "_tmp_" + fname)
            if f.endswith(".parquet")
        ][0]
        os.rename(os.path.join(src + "_tmp_" + fname, part), os.path.join(src, fname))

    # batch 1: doc 1 owns (0,A); doc 2 collides on (0,A), owns (1,B)
    stage([(1, 0, "A"), (2, 0, "A"), (2, 1, "B")], "b1.parquet")
    time.sleep(1.1)  # distinct mtime second -> file source orders b1 first
    # batch 2: doc 3 collides on (0,A) [cross-batch], admits on fresh (1,C);
    #          doc 4 collides on (1,B) [cross-batch]
    stage([(3, 0, "A"), (3, 1, "C"), (4, 1, "B")], "b2.parquet")

    bands = (
        spark.readStream.schema("doc_id long, band_idx int, band_key string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with tws_bucket_claims(bands) as blocked:
        final = run_to_completion(blocked, output_mode="append")

    got = sorted(map(tuple, final.collect()))
    # one blocked row per (doc, collided band):
    # doc 2 x1 (same-batch), doc 3 x1 (cross-batch; C admitted), doc 4 x1
    assert got == [(2,), (3,), (4,)]
