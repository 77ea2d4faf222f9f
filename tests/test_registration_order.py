"""Guards on the driver-order machinery in ``plans/__init__``.

The driver verifies queries in REGISTRATION order and truncates at ~50 per
round, so the ordering logic is load-bearing: a typo in the modified/pinned
lists silently drops a query's jump-the-queue behavior, and a QUERIES/ORACLES
desync would hand the driver an oracle for the wrong query.  These tests are
pure-import (no SparkSession) so they run first and fail fast.
"""

from __future__ import annotations

from flink_wordcount_spark.plans import (
    _MODIFIED_THIS_ROUND,
    _PIN_FRONT_THIS_ROUND,
    _last_verified_round,
    ORACLES,
    QUERIES,
)


def test_modified_and_pinned_names_exist():
    """Typo guard: every name in the round's priority lists must be a real
    registered query — _reorder() silently drops unknown names, which is
    exactly how a misspelled entry would lose its driver slot."""
    unknown_mod = [n for n in _MODIFIED_THIS_ROUND if n not in QUERIES]
    unknown_pin = [n for n in _PIN_FRONT_THIS_ROUND if n not in QUERIES]
    assert not unknown_mod, f"_MODIFIED_THIS_ROUND typos: {unknown_mod}"
    assert not unknown_pin, f"_PIN_FRONT_THIS_ROUND typos: {unknown_pin}"


def test_head_is_modified_then_pinned():
    """The verify queue's head must be the modified list (in order), then the
    pinned list (minus any overlap), before anything else."""
    names = list(QUERIES)
    expected_head = list(_MODIFIED_THIS_ROUND) + [
        n for n in _PIN_FRONT_THIS_ROUND if n not in _MODIFIED_THIS_ROUND
    ]
    assert names[: len(expected_head)] == expected_head


def test_tail_sorts_by_staleness():
    """Past the head, queries sort by ascending last-driver-verified round —
    never-verified (round 0) first, then the stalest back catalog — so the
    rotation cannot starve any query forever."""
    last = _last_verified_round()
    head_len = len(
        list(_MODIFIED_THIS_ROUND)
        + [n for n in _PIN_FRONT_THIS_ROUND if n not in _MODIFIED_THIS_ROUND]
    )
    tail_rounds = [last.get(n, 0) for n in list(QUERIES)[head_len:]]
    assert tail_rounds == sorted(tail_rounds)


def test_head_fits_driver_budget():
    """Slot arithmetic (VERDICT r12 #1 and every round's memory note): the
    driver verifies ~50 queries per round, so modified + pinned +
    never-verified must fit — otherwise a pinned-cohort query silently
    loses its slot and the staleness floor doesn't move."""
    last = _last_verified_round()
    never = [n for n in QUERIES if n not in last]
    head = set(_MODIFIED_THIS_ROUND) | set(_PIN_FRONT_THIS_ROUND) | set(never)
    assert len(head) <= 50, (
        f"verify head is {len(head)} > 50 slots: "
        f"{len(_MODIFIED_THIS_ROUND)} modified + "
        f"{len(_PIN_FRONT_THIS_ROUND)} pinned + {len(never)} never-verified"
    )


def test_oracles_subset_and_order_matches_queries():
    """ORACLES must cover only registered queries and preserve QUERIES'
    relative order (the driver zips them positionally when reporting)."""
    names = list(QUERIES)
    assert set(ORACLES) <= set(names)
    positions = [names.index(n) for n in ORACLES]
    assert positions == sorted(positions)


def test_last_verified_rounds_are_sane():
    """Artifact parsing: every recorded round is a positive int, and the
    union of green rows covers the overwhelming majority of the surface
    (the 'no query has ever failed a driver check' invariant the judge
    tracks — new never-verified queries are the only allowed gap)."""
    last = _last_verified_round()
    assert last, "no CORRECTNESS artifacts parsed — staleness ordering is off"
    assert all(isinstance(r, int) and r >= 1 for r in last.values())
    verified = set(last) & set(QUERIES)
    never = set(QUERIES) - set(last)
    # every query is either driver-green at some round or a new addition
    assert len(verified) + len(never) == len(QUERIES)
