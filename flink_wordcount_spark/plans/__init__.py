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
    # r11: reset per the r10 verdict (#1).  Budget again goes to cohort
    # rotation (the full 43-query r06-stale cohort pinned below) plus the
    # queries whose code actually changed this round:
    "stream_windowed_topk_tws",  # r11: read side re-aggregates before
                                 # ranking (ADVICE r10 tws.py:278 —
                                 # duplicate-window robustness under
                                 # multi-batch replays)
    "stream_session_paths_tws",  # r11: processor now closes sessions on
                                 # the WATERMARK, not eagerly per input
                                 # batch (ADVICE r10 tws.py:401)
    "ev_user_value_deciles",     # r11: persist -> localCheckpoint
    "ev_rfm_segmentation",       # (VERDICT r10 #5) — a materialization
    "qa_equi_depth_histogram",   # change is still a plan edit
]

# Queries to verify THIS round ahead of the staleness rotation even though
# their code is unchanged.  r11 (VERDICT r10 #1): the FULL 43-query cohort
# whose last driver-green row is r06 — the histogram floor.  Pinning all of
# them moves the floor to r07 in one round, exactly like r08 retired r03,
# r09 retired r04 and r10 retired r05.  Budget: 2 modified + 43 pinned +
# ~5 never-verified new queries = the 50-slot budget; the r07 back catalog
# rotates next round.  (Cohort recomputed from the artifacts at round
# start with the same logic as _last_verified_round(): 43 names, matching
# the r10 verdict's count.)
_PIN_FRONT_THIS_ROUND: list[str] = [
    "dedup_embed_cosine",
    "dedup_exact",
    "dedup_exact_hash",
    "embed_cosine_topk",
    "embed_norm_stats",
    "ev_asof_last_purchase",
    "ev_funnel",
    "ev_gap_fill",
    "ev_multires_rollup",
    "ev_pivot_types",
    "ev_sliding_window",
    "ev_tumbling_hour",
    "ev_user_rollup",
    "fn_array",
    "fn_bitwise",
    "fn_date",
    "fn_json",
    "fn_map",
    "fn_math",
    "fn_nulls",
    "fn_regex",
    "fn_string",
    "fn_variant",
    "lsh_cosine_candidates",
    "lsh_ivf_topk",
    "lsh_ivf_topk_checked",
    "sql_cte_top_supplier",
    "sql_exists_correlated",
    "sql_in_subquery",
    "sql_scalar_subquery",
    "sql_unpivot",
    "stream_sentences_golden",
    "text_bigrams_top",
    "text_langid",
    "text_token_counts",
    "udf_grouped_agg",
    "udf_pandas_scalar",
    "udf_rowwise",
    "udf_sql_registered",
    "udtf_token_positions",
    "wordcount_per_doc_topk",
    "wordcount_stats",
    "wordcount_top100",
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
