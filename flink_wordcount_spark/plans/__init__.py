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
    # r15: reset per the r14 verdict (#1).  Plan edits are frozen at ZERO
    # existing queries this round: the 50-slot budget is exactly consumed
    # by the 48-query r10-stale cohort pinned below plus the TWO new
    # operators (text_pii_redaction_report, dedup_digest_registry — the
    # SCALE.md r14 queue), which take the never-verified bucket right
    # after the pinned head.  48 pinned + 0 modified + 2 never-verified
    # = 50; headroom = 0.  Any urgent fix would displace one new operator
    # — none was needed.
]

# Queries to verify THIS round ahead of the staleness rotation even though
# their code is unchanged.  r15 (VERDICT r14 #1): the FULL 48-query cohort
# whose last driver-green row is r10 — the histogram floor.  Pinning all of
# them moves the floor to r11 in one round, exactly like r08 retired r03,
# r09 retired r04, r10 retired r05, r11 retired r06, r12 retired r07,
# r13 retired r08 and r14 retired r09.  Budget: 48 pinned + 0 modified +
# 2 new never-verified = exactly the 50-slot budget, fully consumed
# (headroom = 0 after the two SCALE.md-queued operators land).  The
# cohort was recomputed from the CORRECTNESS_r*.json artifacts at round
# start with the same logic as _last_verified_round(): 48 names, matching
# the r14 verdict's list name-for-name.  Done = 50/50 in
# CORRECTNESS_r15; histogram {r11:48, r12:46, r13:49, r14:50, r15:50}
# = 243 declared queries.
#
# STANDING NOTE for ~r17 (VERDICT r14 #6, survives context loss): when
# the r12 cohort (46 names) rotates, pin BOTH `lsh_minhash_candidates_md5`
# (value twin, r12-green) and its rows-only production twin
# `lsh_minhash_candidates` in the SAME head, so the value check and the
# rows-only check land in one artifact (VERDICT r12 #4 pairing rule; the
# r14 round split them because the budget had zero headroom).
_PIN_FRONT_THIS_ROUND: list[str] = [
    "agg_basic_stats",
    "agg_collect_sorted",
    "agg_corr_covar",
    "agg_count_distinct",
    "agg_cube",
    "agg_filtered",
    "agg_grouping_sets",
    "agg_having",
    "agg_quantile_disc",
    "agg_rollup",
    "agg_salted_two_phase",
    "distinct_on_subset",
    "distinct_pairs",
    "embed_hard_negatives",
    "ev_session_dynamic_gap",
    "feat_target_encode",
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_range",
    "join_right_outer",
    "join_semi",
    "join_theta",
    "merge_upsert",
    "qa_k_anonymity",
    "setop_except",
    "setop_except_all",
    "setop_intersect",
    "setop_union_all",
    "setop_union_distinct",
    "sort_multi_key",
    "sql_q12_priority_lines",
    "stream_dedup_keys",
    "stream_session_dynamic_gap",
    "stream_static_join",
    "stream_timeout_flush_tws",
    "stream_wordcount_file",
    "stream_wordcount_stateful",
    "text_char_lm_score",
    "topk_global",
    "ts_profile_similarity",
    "udf_grouped_map",
    "window_first_last",
    "window_lag_lead",
    "window_range_frame",
    "window_rank_dense_ntile",
    "window_running_sum",
    "window_topk_per_group",
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
