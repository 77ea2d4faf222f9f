"""Declared query surface: every operator from SURVEY.md §2 as a named query.

Importing this package registers all queries into ``catalog.QUERIES`` /
``catalog.ORACLES`` (the driver contract in ``__spark_entry__.py`` re-exports
them).
"""

# Registration order == the driver's verification order, and the driver's
# verify budget truncates at ~50 queries per round.  Ordering policy:
#   1. queries whose plan or oracle was MODIFIED this round (explicit list —
#      a prior green row says nothing about edited code),
#   2. queries with no driver-verified row in any CORRECTNESS_r*.json,
#   3. everything else by STALENESS: ascending last-verified round, so the
#      back catalog rotates through the budget instead of starving forever.
# Staleness is computed from the CORRECTNESS_r*.json artifacts at import time
# (repo root); if none are readable we fall back to registration order.
import json
import re
from pathlib import Path

from . import (  # noqa: F401  (import for registration side effects)
    curation_q,
    decontam_q,
    dedup_q,
    similarity_q,
    streaming_q,
    sql_q,
    udf_q,
    scalar_q,
    events_q,
    textstats_q,
    multimodal_q,
    wordcount_q,
    relational_q,
    aggregates_q,
    windows_q,
    setops_q,
)
from . import catalog as _catalog

# Queries whose Spark plan or oracle SQL changed in the CURRENT round.  These
# jump the queue regardless of prior green rows (ADVICE r03: the round-3
# session-window oracle break shipped unverified precisely because a stale
# green row pinned it behind the budget).  Reset this list each round.
_MODIFIED_THIS_ROUND: list[str] = [
    # Edited in r07 (the driver has never seen these versions):
    "curation_end_to_end",      # forced broadcasts -> maybe_broadcast (VERDICT r06 #1)
    "lsh_simhash64_md5",        # 4x16-bit-band bucketing (recall 11/28 -> 27/28)
    "lsh_simhash64",            # same banding upgrade, production hash
    "dedup_edit_distance",      # rides on the banded SimHash candidates + size-gated
                                # pair broadcast (22 verified pairs at sf0.01, was 7)
    "dedup_minhash_verified",   # ADVICE r06: r06's shared-operator rewrite was
                                # never driver-verified (omitted from r06's list)
    "stream_curation_gate",     # NULL-text parity hardening (ADVICE r06)
    "stream_stream_left_join",  # restage-path mtime re-validation (ADVICE r06)
    # NEW in r07 (never driver-verified):
    "shard_by_token_budget",    # two-phase global cumsum -> token-budget shards
    "quality_cutoff_per_lang",  # per-lang exact-quantile threshold calibration
    "decontam_semantic",        # SemDeDup-style eval-vs-train embedding cosine
    "sample_temperature_mixture",  # n^alpha per-source rebalance, hash sampling
    "semdedup_drop_list",       # cluster-then-prune semantic dedup (SemDeDup)
    "ev_cdc_latest_state",      # CDC latest-wins compaction (one shuffle)
    "qa_referential_events",    # fact-vs-dimension orphan scorecard
    "text_vocab_build",         # top-N token vocab with dense ids
    "stream_cdc_latest_state",  # streaming latest-wins compaction (max_by state)
    "pack_length_buckets",      # inference padding-waste profile per bucket
    "sample_reservoir_per_source",  # exact-k per-domain deterministic sample
    "qa_schema_profile",        # per-column null/distinct delivery audit
    "dedup_prefix_truncation",  # truncation-artifact prefix groups
    "ev_user_value_deciles",    # ntile whale-analysis rollup
    "dedup_shared_spans",       # substring-level partial-overlap profile
    "qa_drift_psi",             # per-type value-distribution PSI drift alarm
    "qa_key_skew",              # shuffle-key heavy-hitter / salting profiler
    "stream_drift_psi",         # live drift monitor: streamed histogram + PSI
    "qa_column_entropy",        # categorical-balance entropy audit
    "embed_dim_variance",       # per-dimension embedding health report
    "ev_scd2_history",          # SCD type-2 validity intervals from the feed
    "ev_markov_transitions",    # first-order event-type transition matrix
    "qa_preflight_report",      # one-row go/no-go corpus delivery panel
    "ev_pattern_strict_sequence",  # CEP strict-contiguity pattern match
    "text_ngram_novelty",       # corpus-saturation novelty curve
    "qa_partition_checksums",   # order-insensitive delivery-integrity XORs
    "join_time_band_bucketed",  # pure range join executed as banded equi-join
    "udf_pandas_scalar_iter",   # SCALAR_ITER pandas UDF (amortized init)
    "source_python_datasource", # sentence generator as a Python DataSource
    "stream_python_datasource", # its streaming reader (offset-replay source)
    "stream_timeout_flush",     # EventTimeTimeout timer-driven state flush
    "ev_rfm_segmentation",      # RFM quintile customer segmentation
    "ev_day_over_day",          # period-over-period trend deltas
    "ev_moving_window_1h",      # trailing time-RANGE frame per user
    "ev_value_percentiles",     # exact rank-selected p50/p90/p99 rollup
    "text_quality",             # oracle now interpolates the shared score
                                # formula (review r07 refactor; semdedup's
                                # size-gated broadcast is covered by its
                                # entry above)
    # The rest of r07's budget (~6 slots after the 44 modified entries
    # above) starts on the 23-query r03-stale cohort, which sorts first via
    # staleness (VERDICT r06 #4); the remainder of that cohort rolls to
    # r08 — this round traded rotation slots for verifying the 20 new
    # operators, which the driver has never seen at all.
]


def _last_verified_round() -> dict[str, int]:
    """Map query name -> latest round whose CORRECTNESS artifact visited it.

    A visit counts whether value-checked or rows-only: either means the
    driver spent budget on it that round.  Errors (non-null ``err`` other
    than the documented ``no_oracle``) do NOT count as verified.
    """
    last: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    try:
        artifacts = sorted(root.glob("CORRECTNESS_r*.json"))
    except OSError:
        return last
    for path in artifacts:
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            ok = row.get("hash_match") or (
                err == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _reorder() -> None:
    last = _last_verified_round()
    names = list(_catalog.QUERIES)
    modified = [n for n in _MODIFIED_THIS_ROUND if n in _catalog.QUERIES]
    rest = [n for n in names if n not in modified]
    # Stable sort: never-verified (round 0) first, then ascending staleness.
    rest.sort(key=lambda n: last.get(n, 0))
    order = modified + rest
    _catalog.QUERIES = {n: _catalog.QUERIES[n] for n in order}
    _catalog.ORACLES = {
        n: _catalog.ORACLES[n] for n in order if n in _catalog.ORACLES
    }


_reorder()
ORACLES = _catalog.ORACLES
QUERIES = _catalog.QUERIES
