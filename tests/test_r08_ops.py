"""Mathematical contracts of the round-8 pipeline operators.

The oracle gate pins exact values on the fixture; these pin the invariants
that must hold on ANY input — so a fixture rotation can't silently admit a
formula regression that happens to hash-match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_wordcount_spark.plans import QUERIES


def test_group_size_dist_accounts_for_every_doc(spark, sf_dir):
    rows = QUERIES["dedup_group_size_dist"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows, "empty distribution"
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["group_size"] >= 1
        assert r["n_docs"] == r["group_size"] * r["n_groups"]
        assert r["rep_id_sum"] >= 0


def test_kfold_partitions_the_corpus(spark, sf_dir):
    rows = QUERIES["sample_kfold_assign"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["fold"] <= 4
        assert 1 <= r["n_sources"]


def test_hapax_ratio_is_a_vocab_share(spark, sf_dir):
    for r in QUERIES["text_hapax_ratio"](spark, sf_dir).collect():
        assert 0 <= r["n_hapax"] <= r["n_vocab"]
        assert r["hapax_ratio"] == r["n_hapax"] / r["n_vocab"]


def test_time_weighted_avg_within_user_value_range(spark, sf_dir):
    twa = QUERIES["ev_time_weighted_avg"](spark, sf_dir)
    bounds = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    # A weighted average with non-negative weights cannot leave [min, max]
    # (epsilon for the final-quotient round).
    joined = twa.join(bounds, "user_id").collect()
    assert joined, "no users with >= 2 events"
    for r in joined:
        assert r["covered_us"] > 0
        assert r["lo"] - 1e-4 <= r["twa_value"] <= r["hi"] + 1e-4


def test_standardized_norms_concentrate_at_sqrt_d(spark, sf_dir):
    rows = QUERIES["embed_standardize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["std_norm"] >= 0
        assert r["is_outlier"] == (r["std_norm"] > 12.0)
    # Population z-scoring makes the MEAN of ||z||^2 exactly d (=64) up to
    # the mu/sd definition rounding: a formula regression (sample std, a
    # missed centering) shifts it far outside this band.
    mean_sq = sum(r["std_norm"] ** 2 for r in rows) / len(rows)
    assert 62.0 < mean_sq < 66.0, mean_sq


def test_curriculum_head_is_staged_and_shuffled(spark, sf_dir):
    rows = QUERIES["sample_quality_curriculum"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == min(100, n_docs)
    keys = [(r["stage"], r["shuffle_key"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys), "head not in curriculum order"
    for r in rows:
        assert 1 <= r["stage"] <= 10
        assert r["shuffle_key"] >= 0


def test_cms_error_contract_holds(spark, sf_dir):
    rows = QUERIES["sketch_cms_topk_bounds"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    counts = [r["exact_cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True), "head not frequency-ordered"
    for r in rows:
        assert r["no_undercount"], f"CMS undercounted {r['word']}"
        assert r["within_eps"], f"CMS overcount beyond eps*N for {r['word']}"


def test_stream_windowed_topk_ranks_are_dense_per_window(spark, sf_dir):
    rows = QUERIES["stream_windowed_topk"](spark, sf_dir).collect()
    assert rows
    by_win: dict[str, list] = {}
    for r in rows:
        by_win.setdefault(r["win_start"], []).append(r)
    for win, grp in by_win.items():
        grp.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in grp] == list(range(1, len(grp) + 1)), win
        ns = [r["n"] for r in grp]
        assert ns == sorted(ns, reverse=True), f"rank order violates counts: {win}"
        assert len(grp) <= 3
