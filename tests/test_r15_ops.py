"""Mathematical contracts of the round-15 operators.

The oracle gate pins exact values on the fixture; these pin the invariants
that must hold on ANY input — so a fixture rotation can't silently admit a
formula regression that happens to hash-match.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from flink_wordcount_spark.plans import QUERIES
from flink_wordcount_spark.plans.dedup_q import _NEW_SHARD_MOD, _NEW_SHARD_RES


def test_digest_registry_covers_exactly_the_new_batch(spark, sf_dir):
    rows = QUERIES["dedup_digest_registry"](spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new_ids = {
        r["doc_id"]
        for r in d.filter(
            (F.col("doc_id") % _NEW_SHARD_MOD) == _NEW_SHARD_RES
        ).collect()
    }
    assert {r["doc_id"] for r in rows} == new_ids
    assert len(rows) == len(new_ids), "one verdict per new-batch doc"


def test_digest_registry_verdict_semantics(spark, sf_dir):
    """Per-digest-group structure: within the new batch, a digest group is
    either entirely 'registry_dup' (the digest exists in a prior snapshot)
    or exactly one 'novel' head plus 'batch_dup' tails (first-by-doc_id
    wins).  The fixture's template override must exercise every dup branch."""
    rows = QUERIES["dedup_digest_registry"](spark, sf_dir).collect()
    by_digest: dict[str, list] = {}
    for r in rows:
        assert r["verdict"] in {"novel", "registry_dup", "batch_dup", "no_text"}
        if r["digest16"] is not None:
            by_digest.setdefault(r["digest16"], []).append(r)
        else:
            assert r["verdict"] == "no_text"
    for grp in by_digest.values():
        verdicts = Counter(g["verdict"] for g in grp)
        if "registry_dup" in verdicts:
            assert verdicts == {"registry_dup": len(grp)}
        else:
            assert verdicts["novel"] == 1
            assert verdicts["batch_dup"] == len(grp) - 1
            head = min(grp, key=lambda g: g["doc_id"])
            assert head["verdict"] == "novel"
    totals = Counter(r["verdict"] for r in rows)
    assert totals["registry_dup"] > 0, "fixture must exercise the registry hit"
    assert totals["batch_dup"] > 0, "fixture must exercise the in-batch dup"
    assert totals["novel"] > 0


def test_digest_registry_no_broadcast_of_registry(spark, sf_dir):
    """The registry side is corpus-sized at 100 TB: the probe must be a
    shuffle/bucket join on digest, never a BroadcastExchange (AQE may still
    choose one at toy scale from runtime stats, but the COMPILED plan must
    not demand it)."""
    plan = QUERIES["dedup_digest_registry"](
        spark, sf_dir
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in plan.lower(), plan


def test_pii_report_rollup_is_consistent(spark, sf_dir):
    rows = QUERIES["text_pii_redaction_report"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    leaf = [r for r in rows if r["gid"] == 0]
    per_source = [r for r in rows if r["gid"] == 1]
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    # every (source, class) leaf observes every doc of that source once
    assert {r["pii_class"] for r in leaf} == {"email", "ip", "phone"}
    assert sum(r["n_obs"] for r in leaf) == 3 * n_docs
    # rollup levels re-aggregate the leaves exactly
    for ps in per_source:
        mine = [r for r in leaf if r["source"] == ps["source"]]
        assert ps["n_obs"] == sum(r["n_obs"] for r in mine)
        assert ps["n_hits"] == sum(r["n_hits"] for r in mine)
        assert ps["n_docs_affected"] == sum(r["n_docs_affected"] for r in mine)
    g = grand[0]
    assert g["n_obs"] == sum(r["n_obs"] for r in leaf)
    assert g["n_hits"] == sum(r["n_hits"] for r in leaf)
    for r in rows:
        assert 0 <= r["redaction_rate_bp"] <= 10_000
        assert r["redaction_rate_bp"] == (r["n_docs_affected"] * 10_000) // r["n_obs"]
        assert 0 <= r["n_docs_affected"] <= r["n_obs"]


def test_pii_report_rates_vary_by_class(spark, sf_dir):
    """The gated fixture suffix must produce class rates that actually differ
    (an all-10000bp report would mean the gating regressed to the scrub
    fixture's every-doc suffix and the report is vacuous)."""
    rows = QUERIES["text_pii_redaction_report"](spark, sf_dir).collect()
    # ROLLUP(source, pii_class) has no class-only level; derive it from leaves
    leaf = [r for r in rows if r["gid"] == 0]
    agg: dict[str, list[int]] = {}
    for r in leaf:
        a = agg.setdefault(r["pii_class"], [0, 0])
        a[0] += r["n_docs_affected"]
        a[1] += r["n_obs"]
    assert set(agg) == {"email", "ip", "phone"}
    rates = {c: (aff * 10_000) // n for c, (aff, n) in agg.items()}
    assert len(set(rates.values())) >= 2, rates
    assert any(0 < v < 10_000 for v in rates.values()), rates
