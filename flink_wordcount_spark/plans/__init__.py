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
    # r14: reset per the r13 verdict (#1).  The WHOLE budget goes to the
    # 49-query r09-stale cohort pinned below; plan edits are frozen at
    # exactly one query this round and NO new operators land (deferred to
    # r15 per VERDICT r13 #6):
    "mm_decode_bmp",             # r14: decode_bmp rejects a pixel-array
                                 # offset that overlaps the header region
                                 # (ADVICE r13 multimodal.py:404; output
                                 # unchanged on well-formed files)
]

# Queries to verify THIS round ahead of the staleness rotation even though
# their code is unchanged.  r14 (VERDICT r13 #1): the FULL 49-query cohort
# whose last driver-green row is r09 — the histogram floor.  Pinning all of
# them moves the floor to r10 in one round, exactly like r08 retired r03,
# r09 retired r04, r10 retired r05, r11 retired r06, r12 retired r07 and
# r13 retired r08.  Budget: 49 pinned + 1 modified + 0 new = exactly the
# 50-slot budget, fully consumed — which is WHY plan edits are frozen at
# one query and no new operators land this round (ADVICE r13: state the
# arithmetic and the headroom explicitly; headroom = 0).  The cohort was
# recomputed from the CORRECTNESS_r*.json artifacts at round start with
# the same logic as _last_verified_round(): 49 names, matching the r13
# verdict's count.  One cohort member is rows-only
# (lsh_minhash_candidates, Spark-specific xxhash64 signatures); VERDICT
# r12 #4's twin-pairing rule would add its value twin
# lsh_minhash_candidates_md5, but the twin carries an r12 value-green row
# (two rounds fresh) and the budget has zero headroom — VERDICT r13 #1's
# explicit "49 + 1 = 50 is the whole budget" arithmetic takes precedence;
# the twin re-verifies when its r12 cohort rotates (~r17).
_PIN_FRONT_THIS_ROUND: list[str] = [
    "approx_distinct_quantile",
    "bm25_keyword_search",
    "curation_quality_gate",
    "decontam_eval_overlap",
    "dedup_cluster_representatives",
    "dedup_containment",
    "dedup_incremental_shard",
    "dedup_keep_list",
    "dedup_minhash_estimate",
    "dedup_ngram_jaccard",
    "dedup_rate_by_source",
    "doc_length_histogram",
    "dq_constraint_report",
    "embed_quantize_int8",
    "ev_anomaly_zscore",
    "ev_attribution_time_decay",
    "ev_funnel_conversion",
    "ev_retention_cohorts",
    "ev_session_paths",
    "ev_session_window",
    "join_asof_tolerance",
    "join_asof_two_table",
    "join_inner",
    "join_left_outer",
    "join_salted_skew",
    "kmeans_embed_clusters",
    "lsh_minhash_candidates",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "retrieval_eval_ndcg",
    "sample_shuffle_order",
    "sample_stratified",
    "sample_upsample_weighted",
    "sketch_hll_shard_merge",
    "source_vocab_overlap",
    "stream_events_tumbling",
    "stream_session_window",
    "stream_sliding_window",
    "text_chunk_split",
    "text_hashed_bow",
    "text_ngram_boilerplate",
    "text_pii_scrub",
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
