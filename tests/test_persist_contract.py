"""Persist-site lifetime contract (VERDICT r09 #2).

Every ``.persist()`` / ``.cache()`` call site in the package must carry a
DOCUMENTED lifetime in the allowlist below — the same mechanism as the BNLJ
allowlist in test_plan_invariants.py.  Two lifetimes exist:

- ``until-clearCache``: the builder returns a plan, so there is no scope to
  unpersist in; the cache lives until ``spark.catalog.clearCache()`` / LRU
  eviction.  Acceptable ONLY because every harness that composes queries in
  one session (driver_sim, the pytest plan sweeps, bench.py) clears the
  cache between queries — the docstring at the site must say so.
- ``scoped-unpersist``: the same function (or an enclosing ``finally``)
  unpersists the frame; the sweep verifies an ``.unpersist(`` call exists in
  the same function body.

The sweep is strict BOTH ways: an un-allowlisted persist site fails (a new
cache-until-clearCache query cannot land silently), and a stale allowlist
entry whose site disappeared fails too (the list cannot rot into
documentation fiction).
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "flink_wordcount_spark"

# (posix path relative to the package, enclosing function) -> lifetime.
# Rationales live in the docstrings/comments at each site; every entry here
# was individually measured as a win at bench scale with a documented
# at-100TB story (persist a NARROW derived frame, never the fact table).
ALLOWED_PERSIST_SITES: dict[tuple[str, str], str] = {
    # NOTE (r15): curation_end_to_end's former drop_ids/contaminated
    # persists are gone — the funnel's stage flags are now computed in one
    # pass, each id list has a single consumer, and an interleaved A/B
    # showed explicit caches of the multi-consumer subtrees (keep1, the
    # LSH candidate list) LOSE to AQE's runtime stage reuse (the cache adds
    # a job barrier + block writes; the "duplicated" segments are cheap
    # map-side work feeding shared exchanges).
    # regex-heavy quality features consumed by two plan branches
    ("plans/curation_q.py", "quality_cutoff_per_lang"): "until-clearCache",
    ("plans/curation_q.py", "sample_quality_curriculum"): "until-clearCache",
    # (user, hour) profile rollup feeding reference + probe branches
    ("plans/events_q.py", "ts_profile_similarity"): "until-clearCache",
    # r11 (VERDICT r10 #5): the three rankops-prescribed sites
    # (ev_user_value_deciles, ev_rfm_segmentation, qa_equi_depth_histogram)
    # were retired to eager .localCheckpoint() — same one-shot
    # materialization win for the rank prep jobs, but the ContextCleaner
    # reclaims the blocks when the plan is GC'd instead of waiting for a
    # harness clearCache.  They now appear in the gc-scoped inventory below.
    # BM25 scored frame consumed by two global rankings
    ("plans/similarity_q.py", "retrieval_rrf_fusion"): "until-clearCache",
    # candidate frame consumed 7x (VERDICT r09 what's-wrong #3 — the site
    # that motivated this contract)
    ("plans/similarity_q.py", "retrieval_eval_ndcg"): "until-clearCache",
    # (doc, word) tf frame feeding df_ + the final score join
    ("plans/textstats_q.py", "text_tfidf_top_terms"): "until-clearCache",
    # word-count frame feeding the global rank + regression agg
    ("plans/textstats_q.py", "text_zipf_fit"): "until-clearCache",
    # alphabet^3-bounded trigram model read by m2/vocab/final join
    ("plans/textstats_q.py", "text_char_lm_score"): "until-clearCache",
}


# .localCheckpoint() sites: GC-scoped materialization (the ContextCleaner
# frees the blocks once the plan is unreachable), so they don't need a
# clearCache contract — but they still occupy executor storage while live,
# so the inventory is pinned the same strict-both-ways way (VERDICT r10 #5:
# retiring a persist site must not make the materialization invisible).
ALLOWED_LOCAL_CHECKPOINT_SITES: set[tuple[str, str]] = {
    ("plans/events_q.py", "ev_user_value_deciles"),
    ("plans/events_q.py", "ev_rfm_segmentation"),
    ("plans/events_q.py", "qa_equi_depth_histogram"),
    # pre-existing (surfaced by this very sweep on its first run): the
    # label-propagation loop truncates per-iteration lineage — without it
    # iteration i's plan contains i copies of the join tree
    ("operators/dedup.py", "connected_components"),
}


def _call_sites(attrs: tuple[str, ...]) -> dict[tuple[str, str], dict]:
    """(relpath, function) -> {count, has_unpersist} for every attribute
    call named in ``attrs`` in the package."""
    sites: dict[tuple[str, str], dict] = {}
    for path in sorted(PKG.rglob("*.py")):
        rel = path.relative_to(PKG).as_posix()
        tree = ast.parse(path.read_text())
        stack: list[ast.AST] = []

        class V(ast.NodeVisitor):
            def _visit_fn(self, node):
                stack.append(node)
                self.generic_visit(node)
                stack.pop()

            visit_FunctionDef = _visit_fn
            visit_AsyncFunctionDef = _visit_fn

            def visit_Call(self, node):
                f = node.func
                if isinstance(f, ast.Attribute) and f.attr in attrs:
                    fn = stack[-1].name if stack else "<module>"
                    key = (rel, fn)
                    entry = sites.setdefault(
                        key, {"count": 0, "has_unpersist": False}
                    )
                    entry["count"] += 1
                    entry["has_unpersist"] = any(
                        isinstance(n, ast.Call)
                        and isinstance(n.func, ast.Attribute)
                        and n.func.attr == "unpersist"
                        for n in ast.walk(stack[-1])
                    ) if stack else False
                self.generic_visit(node)

        V().visit(tree)
    return sites


def _persist_sites() -> dict[tuple[str, str], dict]:
    return _call_sites(("persist", "cache"))


def test_every_persist_site_is_allowlisted_with_a_lifetime():
    sites = _persist_sites()
    rogue = sorted(set(sites) - set(ALLOWED_PERSIST_SITES))
    assert not rogue, (
        "persist/cache call sites without a documented lifetime (add to "
        f"ALLOWED_PERSIST_SITES with a measured rationale): {rogue}"
    )


def test_no_stale_allowlist_entries():
    sites = _persist_sites()
    stale = sorted(set(ALLOWED_PERSIST_SITES) - set(sites))
    assert not stale, (
        f"allowlist entries whose persist site no longer exists: {stale}"
    )


def test_scoped_unpersist_entries_actually_unpersist():
    sites = _persist_sites()
    for key, lifetime in ALLOWED_PERSIST_SITES.items():
        assert lifetime in ("until-clearCache", "scoped-unpersist"), (
            f"{key}: unknown lifetime {lifetime!r}"
        )
        if lifetime == "scoped-unpersist" and key in sites:
            assert sites[key]["has_unpersist"], (
                f"{key}: declared scoped-unpersist but the function body "
                "has no .unpersist( call"
            )


def test_local_checkpoint_sites_are_inventoried_both_ways():
    sites = set(_call_sites(("localCheckpoint",)))
    rogue = sorted(sites - ALLOWED_LOCAL_CHECKPOINT_SITES)
    assert not rogue, (
        "localCheckpoint sites without an inventory entry (add to "
        f"ALLOWED_LOCAL_CHECKPOINT_SITES with a rationale): {rogue}"
    )
    stale = sorted(ALLOWED_LOCAL_CHECKPOINT_SITES - sites)
    assert not stale, (
        f"inventory entries whose localCheckpoint site no longer exists: {stale}"
    )


def test_until_clearcache_sites_are_cleared_by_the_harnesses():
    """The until-clearCache lifetime is only sound because the query
    harnesses clear the cache between queries — pin that the two
    composition harnesses actually do."""
    root = PKG.parent
    driver_sim = (root / "scripts" / "driver_sim.py").read_text()
    assert "clearCache" in driver_sim
    bench = (root / "bench.py").read_text()
    assert "clearCache" in bench
