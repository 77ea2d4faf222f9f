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
    # r10: reset per the r09 verdict (#1).  The round again spends its
    # budget on cohort rotation: the full 44-query r05-stale cohort is
    # pinned below and new-operator additions are capped at ~5, so this
    # list carries only genuinely edited existing queries.
    "stream_timeout_flush_tws",  # r10: plan body rewritten onto the
                                 # tws_timeout_flush context manager
                                 # (ADVICE r09 provider scoping) — a
                                 # refactor is still an edit (the r08
                                 # dedup_shared_spans precedent)
]

# Queries to verify THIS round ahead of the staleness rotation even though
# their code is unchanged.  r10 (VERDICT r09 #1): the FULL 44-query cohort
# whose last driver-green row is r05 — the histogram floor.  Pinning all of
# them moves the floor to r06 in one round, exactly like r08 retired the
# r03 cohort and r09 retired r04.  Budget: 1 modified + 44 pinned + 5
# never-verified new queries (two TWS topologies + the r10 additions)
# = the 50-slot budget exactly; the r06 back catalog rotates next round.
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
    "ev_session_dynamic_gap",
    "join_anti",
    "join_cross",
    "join_full_outer",
    "join_range",
    "join_right_outer",
    "join_semi",
    "join_theta",
    "merge_upsert",
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
