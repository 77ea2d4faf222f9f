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
    # r13: reset per the r12 verdict (#1).  Budget goes to the full
    # 42-query r08-stale cohort pinned below plus the queries whose code
    # actually changes this round (appended as the edits land):
    "stream_dedup_admitted",     # r13: complement join now reads documents
                                 # via the memoized io.table() helper
                                 # (ADVICE r12 streaming_q.py:1543)
    "mm_decode_ppm",             # r13: decode_ppm rejects a glued magic
                                 # (whitespace-after-magic check, ADVICE
                                 # r12 multimodal.py:101)
    "qa_observed_metrics",       # r13: _observed_gate_plan name is now a
                                 # required parameter (ADVICE r12
                                 # curation_q.py:1324; plan unchanged)
    "shard_by_token_budget",     # r13: two-phase cumsum factored into the
                                 # shared _global_token_cumsum builder
                                 # (same plan; pipeline_ingest_end_to_end
                                 # reuses it)
]

# Queries to verify THIS round ahead of the staleness rotation even though
# their code is unchanged.  r13 (VERDICT r12 #1): the FULL 42-query cohort
# whose last driver-green row is r08 — the histogram floor.  Pinning all of
# them moves the floor to r09 in one round, exactly like r08 retired r03,
# r09 retired r04, r10 retired r05, r11 retired r06 and r12 retired r07.
# Budget: 42 pinned + 3 modified + never-verified new queries must stay
# <= the 50-slot budget (new operators capped at 5 this round); the r09
# back catalog rotates next round.  (Cohort recomputed from the artifacts
# at round start with the same logic as _last_verified_round(): 42 names,
# matching the r12 verdict's count.  The cohort contains no rows-only
# queries, so VERDICT r12 #4's twin-pairing rule is vacuously satisfied —
# its value twin lsh_simhash64_md5 IS in this cohort and gets a value slot.)
_PIN_FRONT_THIS_ROUND: list[str] = [
    "dedup_edit_distance",
    "dedup_exact_normalized",
    "dedup_group_size_dist",
    "dedup_shared_spans",
    "dedup_shared_spans_hashed",
    "embed_class_centroid_margin",
    "embed_standardize",
    "ev_rolling_active_users",
    "ev_time_weighted_avg",
    "lsh_simhash64_md5",
    "mm_featurize",
    "mm_frame_sample",
    "mm_metadata",
    "mm_resize",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_excess_shippers",
    "q21_suppliers_kept_waiting",
    "q22_dormant_customers",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "qa_benford_first_digit",
    "qa_completeness_by_day",
    "retrieval_rrf_fusion",
    "sample_kfold_assign",
    "setop_union_by_name",
    "sketch_cms_topk_bounds",
    "stream_stream_join",
    "stream_stream_left_join",
    "stream_timeout_flush",
    "stream_windowed_topk",
    "text_bpe_char_pairs",
    "text_entropy_chars",
    "text_hapax_ratio",
    "text_skipgram_cooccurrence",
    "text_zipf_fit",
    "window_cume_percent",
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
    pinned = [
        n
        for n in _PIN_FRONT_THIS_ROUND
        if n in _catalog.QUERIES and n not in modified
    ]
    head = modified + pinned
    rest = [n for n in names if n not in head]
    # Stable sort: never-verified (round 0) first, then ascending staleness.
    rest.sort(key=lambda n: last.get(n, 0))
    order = head + rest
    _catalog.QUERIES = {n: _catalog.QUERIES[n] for n in order}
    _catalog.ORACLES = {
        n: _catalog.ORACLES[n] for n in order if n in _catalog.ORACLES
    }


_reorder()
ORACLES = _catalog.ORACLES
QUERIES = _catalog.QUERIES
