"""Recall-parity contracts for the approximate layer (VERDICT r06 #3 +
ADVICE r06 #3).

The production LSH variants hash with xxhash64 (engine-specific, so the
driver checks them rows-only); their md5 twins run the identical pipeline on
an oracle-computable hash and are value-checked.  Nothing previously pinned
that the two hash families produce comparably-COMPLETE candidate sets — and
``curation_end_to_end``'s oracle additionally assumes the MinHash-LSH
candidates cover every exact near-dup pair on the fixture (the oracle models
the near-dup stage as exact all-pairs Jaccard).  These tests make both
assumptions explicit, so the first fixture vintage that violates them fails
a named test here instead of breaking stages 3-6 of the funnel's hash check.

The recall contract is on the VERIFIED output, not the raw candidates: the
pipelines need not emit identical candidate pairs (different hash families
bucket differently), only candidate sets complete enough that the exact
verification pass recovers the same final pair set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_wordcount_spark.plans import QUERIES


def _pair_set(df) -> set[tuple[int, int]]:
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def test_minhash_lsh_recall_covers_exact_pairs(spark, sf_dir):
    """Both MinHash banding pipelines (production xxhash64 and the md5
    verify twin) must emit candidate supersets of the exact all-pairs
    near-dup set, so their verified outputs are identical to each other AND
    to exact Jaccard.  This is the fixture-level assertion the funnel's
    oracle depends on (ADVICE r06 #3)."""
    exact = _pair_set(QUERIES["dedup_ngram_jaccard"](spark, sf_dir))
    assert exact, "fixture has no near-dup pairs — recall test is vacuous"

    verified = _pair_set(QUERIES["dedup_minhash_verified"](spark, sf_dir))
    assert verified == exact, (
        f"xxhash64 LSH recall miss: {sorted(exact - verified)} absent, "
        f"{sorted(verified - exact)} spurious — curation_end_to_end's oracle "
        "assumes 100% fixture recall; update the funnel oracle if this is a "
        "new fixture vintage"
    )

    md5_cands = _pair_set(QUERIES["lsh_minhash_candidates_md5"](spark, sf_dir))
    assert exact <= md5_cands, (
        f"md5-twin LSH recall miss: {sorted(exact - md5_cands)}"
    )

    xx_cands = _pair_set(QUERIES["lsh_minhash_candidates"](spark, sf_dir))
    assert exact <= xx_cands, (
        f"production-xxhash64 LSH recall miss: {sorted(exact - xx_cands)}"
    )


def _true_edit_pairs(spark, sf_dir) -> set[tuple[int, int]]:
    """EXACT ground truth for the edit-near-dup predicate (5*lev <= max_len):
    all-pairs Levenshtein behind a LOSSLESS length prefilter (the predicate
    implies 5*|len_a - len_b| <= max_len).  Test-only — quadratic by design,
    the baseline every LSH recall claim is measured against."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = d.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("ta"),
        F.length("text").alias("la"),
    ).repartition(32)
    b = d.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("tb"),
        F.length("text").alias("lb"),
    )
    return _pair_set(
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(5 * F.abs(F.col("la") - F.col("lb")) <= F.greatest("la", "lb"))
        .filter(5 * F.levenshtein("ta", "tb") <= F.greatest("la", "lb"))
    )


def _family_hamming(fp_rows: dict[int, int], pair: tuple[int, int]) -> int:
    x = fp_rows[pair[0]] ^ fp_rows[pair[1]]
    return bin(x & 0xFFFFFFFFFFFFFFFF).count("1")


def test_simhash_recall_parity_production_vs_md5(spark, sf_dir):
    """SimHash recall contracts for BOTH hash families, against exact ground
    truth (r07: this test is what surfaced the single-prefix bucketing's
    11/28 recall and motivated the 4x16-bit-band upgrade):

    1. Pigeonhole (provable GIVEN the hot-bucket cap doesn't fire —
       _SIMHASH_MAX_BUCKET drops bands with > 1024 members, so a vintage
       where every shared band of a close pair is hot voids the guarantee
       by design; if this assertion ever fails, check bucket sizes before
       suspecting the banding): every true pair at Hamming <= 3 differs in
       at most 3 of the 4 disjoint bands, so it MUST share one and be
       emitted by that family's pipeline.
    2. Each family's recall of the true edit-near-dup set must clear 0.75
       (single-prefix measured 0.39-0.61; 4-band measures ~0.96, missing
       only pairs outside its own Hamming <= 8 predicate).
    3. The two families' recalls stay comparable (within 0.15): the residual
       gap is per-family fingerprint noise at the Hamming-cut margin, not a
       pipeline defect."""
    from flink_wordcount_spark.operators.dedup import simhash
    from flink_wordcount_spark.plans.dedup_q import md5_simhash_fingerprints

    true = _true_edit_pairs(spark, sf_dir)
    assert true, "fixture yields no edit-verified pairs — test is vacuous"

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp_xx = {r["id"]: r["simhash"] for r in simhash(d, "text", "doc_id").collect()}
    fp_md5 = {
        r["id"]: (r["fp_hi"] << 32) | r["fp_lo"]
        for r in md5_simhash_fingerprints(d).collect()
    }

    emitted = {
        "xxhash64": _pair_set(QUERIES["lsh_simhash64"](spark, sf_dir)),
        "md5": _pair_set(QUERIES["lsh_simhash64_md5"](spark, sf_dir)),
    }
    recalls = {}
    for fam, fps in (("xxhash64", fp_xx), ("md5", fp_md5)):
        close = {p for p in true if _family_hamming(fps, p) <= 3}
        missed = close - emitted[fam]
        assert not missed, (
            f"{fam}: pigeonhole violation — Hamming<=3 pairs {sorted(missed)} "
            "not emitted by 4-band bucketing"
        )
        recalls[fam] = len(true & emitted[fam]) / len(true)
        assert recalls[fam] >= 0.75, f"{fam} recall {recalls[fam]:.2f} < 0.75"
    assert abs(recalls["xxhash64"] - recalls["md5"]) <= 0.15, (
        f"SimHash recall divergence between hash families: {recalls}"
    )
