"""Mathematical contracts of the round-7 QA/observability operators.

The oracle gate pins exact values on the fixture; these tests pin the
*invariants* that must hold on ANY input — the properties a dashboard
consumer relies on (PSI non-negativity, entropy bounds, variance
non-negativity, share normalization) — so a fixture rotation can't
silently admit a formula regression that happens to hash-match.
"""

from __future__ import annotations

import math

from flink_wordcount_spark.plans import QUERIES


def test_psi_nonnegative_and_split_sane(spark, sf_dir):
    rows = QUERIES["qa_drift_psi"](spark, sf_dir).collect()
    assert rows, "drift report empty"
    for r in rows:
        assert r.psi >= 0.0, f"PSI must be >= 0 (KL-symmetrization), got {r.psi}"
        assert r.n_a > 0 and r.n_b > 0, "both periods must be populated"


def test_stream_drift_psi_daily_grid(spark, sf_dir):
    rows = QUERIES["stream_drift_psi"](spark, sf_dir).collect()
    assert rows
    days = {r.day for r in rows}
    types = {r.event_type for r in rows}
    # every observed (day, type) cell carries one PSI row
    assert len(rows) == len({(r.day, r.event_type) for r in rows})
    assert all(r.psi >= 0.0 for r in rows)
    assert len(days) > 1 and len(types) > 1


def test_entropy_within_bounds(spark, sf_dir):
    rows = QUERIES["qa_column_entropy"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_values >= 1
        assert 0.0 <= r.entropy <= math.log(r.n_values) + 1e-6, r
        assert 0.0 <= r.normalized <= 1.0 + 1e-6, r


def test_key_skew_shares_normalized_and_ordered(spark, sf_dir):
    rows = QUERIES["qa_key_skew"](spark, sf_dir).collect()
    assert rows
    assert sum(r.share for r in rows) <= 1.0 + 1e-9
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True), "top-k must be count-descending"
    for r in rows:
        assert abs(r.ratio_to_avg - r.cnt * r.n_keys / r.total) < 1e-12


def test_dim_variance_nonnegative_full_grid(spark, sf_dir):
    rows = QUERIES["embed_dim_variance"](spark, sf_dir).collect()
    assert {r.dim for r in rows} == set(range(64)), "one row per coordinate"
    for r in rows:
        # explicit avg(v^2)-avg(v)^2 can go epsilon-negative before rounding;
        # after round(6) it must be clean
        assert r.variance >= 0.0, r
        assert r.min_v <= r.mean <= r.max_v, r


def test_shared_spans_fraction_bounds(spark, sf_dir):
    rows = QUERIES["dedup_shared_spans"](spark, sf_dir).collect()
    assert rows, "fixture must contain partial overlaps"
    for r in rows:
        assert 1 <= r.n_shared <= r.n_spans, r
        assert 0.0 < r.shared_frac <= 1.0, r


def test_observed_metrics_single_pass_contract(spark, sf_dir):
    """qa_observed_metrics: values equal an independent two-pass recompute,
    n_pass counts gate survivors only, and the observe branch really rides
    ONE scan (a CollectMetrics node is in the gate plan — the no-second-
    pass property that is the operator's entire point at 100 TB)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from flink_wordcount_spark.io import table
    from flink_wordcount_spark.plans.curation_q import _OBS_GATE_MIN_CHARS

    row = QUERIES["qa_observed_metrics"](spark, sf_dir).collect()[0]

    d = table(spark, sf_dir, "documents")
    ref = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(
                F.col("text").isNull() | (F.length("text") == 0), 1
            ).otherwise(0)
        ).alias("n_empty"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    ).collect()[0]
    n_pass_ref = d.where(
        (F.col("n_chars") >= _OBS_GATE_MIN_CHARS) & F.col("lang").isNotNull()
    ).count()

    assert row.asDict() == {**ref.asDict(), "n_pass": n_pass_ref}
    assert 0 < row.n_pass < row.n_docs  # the gate discriminates

    # Single-pass property: the gate action's plan carries the metrics node.
    obs = Observation("probe")
    gated = d.observe(obs, F.count(F.lit(1)).alias("n")).where(
        F.col("n_chars") >= _OBS_GATE_MIN_CHARS
    )
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan


def test_observed_metrics_survive_stale_plan_probe(spark, sf_dir):
    """Regression (r12 full-suite hang): an Observation attached by a
    plan-only probe and never run hijacked metrics routing for the next
    REAL run in the same session WHEN it reused the query's observation
    name — the real run's ``obs.get`` blocked forever in
    Observation.getRow.  The colliding variant cannot be asserted
    directly (it blocks, not raises), so this pins the FIXED sequence:
    a uniquely-named plan-only attach followed by the full query must
    return.  The unique-name contract itself is documented on
    ``_observed_gate_plan`` and honored by the plan-invariant sweep's
    probe."""
    from flink_wordcount_spark.plans.curation_q import _observed_gate_plan

    gated, _ = _observed_gate_plan(spark, sf_dir, name="probe_stale_r12")
    gated._jdf.queryExecution().executedPlan().toString()  # plan-only use
    row = QUERIES["qa_observed_metrics"](spark, sf_dir).collect()[0]
    assert row.n_docs > 0 and row.n_pass > 0


def test_observed_gate_plan_name_is_required():
    """ADVICE r12 curation_q.py:1324: ``name`` has NO default, so a future
    plan-only caller cannot silently inherit the real observation name and
    reproduce the documented session hang — the hazardous collision now
    requires typing the name out."""
    import inspect

    from flink_wordcount_spark.plans.curation_q import _observed_gate_plan

    sig = inspect.signature(_observed_gate_plan)
    assert sig.parameters["name"].default is inspect.Parameter.empty


def test_observed_metrics_empty_input_emits_nulls(spark, sf_dir, tmp_path):
    """ADVICE r11 curation_q.py:1381: on an EMPTY documents table the
    sum/min/max observed metrics come back None — the query must emit the
    oracle's zero-row aggregates (counts 0, sum/min/max NULL), not crash
    on int(None)."""
    import shutil

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    empty_dir = tmp_path / "empty_sf"
    empty_dir.mkdir()
    d.limit(0).write.parquet(str(empty_dir / "documents.parquet"))
    try:
        row = QUERIES["qa_observed_metrics"](spark, str(empty_dir)).collect()[0]
    finally:
        shutil.rmtree(empty_dir, ignore_errors=True)
    assert row.n_docs == 0 and row.n_empty == 0 and row.n_pass == 0
    assert row.total_chars is None
    assert row.min_chars is None and row.max_chars is None
