"""Invariants for the corpus-curation surface (plans/curation_q.py) beyond
the oracle parity check: determinism, metric bounds, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_wordcount_spark.plans import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_quality_gate_keeps_top_half(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["source"]: r["n_kept"] for r in QUERIES["curation_quality_gate"](spark, sf_dir).collect()}
    assert set(kept) == set(totals)
    for src, n in totals.items():
        # percent_rank >= 0.5 keeps the ceil-half (pr is 0 for the first row)
        assert n // 2 <= kept[src] <= n // 2 + 1, (src, n, kept[src])


def test_stratified_sample_deterministic_and_in_band(spark, sf_dir):
    q = QUERIES["sample_stratified"]
    rows1 = sorted(map(tuple, q(spark, sf_dir).collect()))
    rows2 = sorted(map(tuple, q(spark, sf_dir).collect()))
    assert rows1 == rows2  # hash decision: bit-identical across runs
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for source, rate, n_sampled, _cksum in rows1:
        expect = totals[source] * rate / 1000
        # multiplicative-hash residues are near-uniform; wide tolerance
        assert expect * 0.3 - 3 <= n_sampled <= expect * 2.5 + 3, (source, rate, n_sampled, expect)


def test_containment_dominates_jaccard(spark, sf_dir):
    """containment = s/min(a,b) >= s/(a+b-s) = jaccard for every pair, so the
    0.8-jaccard pair set must be a subset of the 0.8-containment pair set;
    here: every emitted containment >= its pair's jaccard bound."""
    rows = QUERIES["dedup_containment"](spark, sf_dir).collect()
    assert rows, "fixture contains near-dup pairs"
    for r in rows:
        assert 0.9 <= r["containment"] <= 1.0


def test_histogram_sums_to_corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = QUERIES["doc_length_histogram"](spark, sf_dir)
    assert hist.agg(F.sum("n")).collect()[0][0] == d.count()
    assert hist.filter(F.col("bucket") < 0).count() == 0


def test_vocab_overlap_complete_and_bounded(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_src = d.select("source").distinct().count()
    rows = QUERIES["source_vocab_overlap"](spark, sf_dir).collect()
    assert len(rows) == n_src * (n_src - 1) // 2  # every pair shares some word
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0


def test_stratified_sample_is_one_shuffle(spark, sf_dir):
    """The sampling decision is map-side; the only exchange is the final
    per-source aggregate (plus AQE reads) — no pre-shuffle of the corpus."""
    plan = _plan(QUERIES["sample_stratified"](spark, sf_dir))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_anomaly_zscore_schema_and_bounds(spark, sf_dir):
    df = QUERIES["ev_anomaly_zscore"](spark, sf_dir)
    assert [f.name for f in df.schema.fields] == ["event_id", "event_type", "z"]
    for r in df.collect():
        assert abs(r["z"]) >= 2


def test_kmeans_converges_and_partitions(spark, sf_dir):
    """Lloyd's invariants: every vector assigned exactly once (cluster sizes
    sum to corpus), and the 2-iteration inertia is no worse than the
    1-iteration inertia (monotone non-increasing objective)."""
    import flink_wordcount_spark.plans.similarity_q as sq
    from pyspark.sql import functions as F2

    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    two = QUERIES["kmeans_embed_clusters"](spark, sf_dir)
    rows = two.collect()
    assert sum(r["n_points"] for r in rows) == n_vec
    inertia2 = sum(r["inertia"] for r in rows)
    old = sq._KM_ITERS
    try:
        sq._KM_ITERS = 1
        inertia1 = sum(
            r["inertia"]
            for r in sq.kmeans_embed_clusters(spark, sf_dir).collect()
        )
    finally:
        sq._KM_ITERS = old
    assert inertia2 <= inertia1 + 1e-6


def test_rrf_fusion_scores_consistent(spark, sf_dir):
    """Every fused row's RRF equals the formula over its own ranks, ranks are
    valid (>=1, distinct per system), and the output is ordered by rrf desc.
    (No containment claim: a doc ranked mid-pack by BOTH systems can
    legitimately out-fuse either system's rank-1.)"""
    fused = QUERIES["retrieval_rrf_fusion"](spark, sf_dir).collect()
    assert len(fused) > 0
    for r in fused:
        assert r["r_bm25"] >= 1 and r["r_tf"] >= 1
        assert abs(r["rrf"] - round(1 / (60 + r["r_bm25"]) + 1 / (60 + r["r_tf"]), 6)) < 1e-9
    assert len({r["r_bm25"] for r in fused}) == len(fused)
    scores = [r["rrf"] for r in fused]
    assert scores == sorted(scores, reverse=True)


def test_hll_shard_merge_bound_holds(spark, sf_dir):
    rows = QUERIES["sketch_hll_shard_merge"](spark, sf_dir).collect()
    assert rows and all(r["sketch_ok"] for r in rows)


def test_zipf_slope_is_negative(spark, sf_dir):
    r = QUERIES["text_zipf_fit"](spark, sf_dir).collect()[0]
    assert r["n_words"] > 10
    assert r["zipf_slope"] < 0  # frequency decreases with rank, always
