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
    # r16: queries whose Spark plan was EDITED this round (optimization
    # round 2 of 2).  Kept in sync commit-by-commit — the r15 round's
    # mistake (VERDICT r15 "What's wrong" #1) was leaving this empty while
    # ~25 plans were edited.
    "dedup_shared_spans_hashed",  # r16: single-pass unique-span rollup
    "dedup_shared_spans",  # r16: same rollup helper (string-keyed twin)
    "ev_rolling_active_users",  # r16: interval-delta rollup, no x7 fan
    "q5_local_supplier_volume",  # r16: base-table dim broadcasts, SMJ gone
    # r16: prefix-filtered exact Jaccard join (operators/dedup.
    # _prefix_jaccard_pairs) — every full-corpus jaccard_pairs caller:
    "dedup_ngram_jaccard",
    "dedup_cluster_representatives",
    "dedup_keep_list",
    "dedup_rate_by_source",
    # curation_end_to_end: NOT modified — connected_components round
    # batching was rejected by its own probe (fixpoint converges in 1-2
    # rounds at both scales; plans/r16/cc_batching_probe.json).  It stays
    # driver-verified via the r15-debt pin list below.
    # q3_shipping_priority: NOT modified — the dim-first rewrite was
    # rejected by its own interleaved A/B (plans/r16/ab_q3.json)
]

# Queries to verify THIS round ahead of the staleness rotation even though
# their code may be unchanged THIS round.  r16 (VERDICT r15 #1): the ~19
# queries whose plans the r15 optimizer REWROTE but which never landed in a
# driver verify sample — the round's verification debt.  Two r15 rewrites
# (text_char_lm_score, embed_hard_negatives) were driver-sampled hash-green
# in CORRECTNESS_r15 and are NOT re-pinned.  Budget arithmetic: 4 modified
# (r16 edits, superset-listed above; overlap with this list is deduped by
# _reorder) + 19 pinned − 2 overlap (dedup_shared_spans_hashed,
# curation_end_to_end appear in both) = 21 head slots; the remaining ~29
# slots fall to the staleness rotation, which is exactly the r11-stale
# cohort (48 names at the histogram floor {r11:48, r12:46, r13:49, r14:50,
# r15:50}) — ~29 of them rotate this round, the rest next round.
#
# STANDING NOTE for ~r17 (VERDICT r14 #6, survives context loss): when
# the r12 cohort (46 names) rotates, pin BOTH `lsh_minhash_candidates_md5`
# (value twin, r12-green) and its rows-only production twin
# `lsh_minhash_candidates` in the SAME head, so the value check and the
# rows-only check land in one artifact (VERDICT r12 #4 pairing rule).
_PIN_FRONT_THIS_ROUND: list[str] = [
    "dedup_edit_distance",
    "curation_end_to_end",
    "curation_filter_funnel",
    "curation_quality_gate",
    "text_repetition_ratio",
    "dedup_embed_cosine",
    "lsh_cosine_candidates",
    "bm25_keyword_search",
    "retrieval_rrf_fusion",
    "retrieval_eval_ndcg",
    "lsh_simhash64",
    "lsh_simhash64_md5",
    "dedup_minhash_estimate",
    "dedup_minhash_verified",
    "kmeans_embed_clusters",
    "text_tfidf_top_terms",
    "embed_cosine_topk",
    "dedup_shared_spans_hashed",
    "decontam_eval_overlap",
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
