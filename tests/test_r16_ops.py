"""Mathematical contracts of the round-16 optimization rewrites.

Each r16 rewrite changed HOW a result is computed, never WHAT — the oracle
pins exact values on the fixture; these pin the equivalence argument on ANY
input, so a fixture rotation can't silently admit a formula regression.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import date, datetime

from pyspark.sql import functions as F

from flink_wordcount_spark.plans import QUERIES


def _brute_force_wau(user_days: list[tuple[int | None, date]]) -> dict[str, int]:
    """Reference trailing-7d active users: literal double loop."""
    days = sorted({d for _, d in user_days})
    out = {}
    for d in days:
        active = {
            u
            for u, ud in user_days
            if u is not None and (d - ud).days in range(0, 7)
        }
        out[d.strftime("%Y-%m-%d")] = len(active)
    return out


def test_rolling_active_users_equals_brute_force(spark, tmp_path):
    """The r16 interval-delta rollup == the definitional per-day distinct
    count, exercised on a synthetic feed that hits every delta edge case:
    gaps > 7d (disjoint pieces), consecutive days (piece merging, +1/-1
    cancellation on the same grid day), duplicate (user, day) events,
    multi-user overlap, a day covered ONLY from an earlier start (no
    delta row of its own without the observed-marker), and a NULL user
    (its day must appear in the grid but count zero users)."""
    rows = [
        # user 1: consecutive run + far gap (merged piece, then new piece)
        (1, "2031-01-01 08:00:00"),
        (1, "2031-01-02 09:00:00"),
        (1, "2031-01-20 10:00:00"),
        # user 2: same-day duplicates + a day 3 later (overlapping pieces)
        (2, "2031-01-02 01:00:00"),
        (2, "2031-01-02 23:00:00"),
        (2, "2031-01-05 12:00:00"),
        # user 3: single day far out; day 2031-01-26 is covered only by
        # user 1's Jan 20 start (tests the observed-0-delta marker path)
        (3, "2031-01-26 00:00:00"),
        # null user: contributes an observed day, zero active users
        (None, "2031-02-15 00:00:00"),
    ]
    df = spark.createDataFrame(
        [(i, u, datetime.fromisoformat(ts), 1.0, "click") for i, (u, ts) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, value double, event_type string",
    )
    d = tmp_path / "events.parquet"
    df.write.mode("overwrite").parquet(str(d.parent / "events.parquet"))

    got = {
        r["day"]: r["active_7d"]
        for r in QUERIES["ev_rolling_active_users"](
            spark, str(tmp_path)
        ).collect()
    }
    want = _brute_force_wau(
        [(u, datetime.fromisoformat(ts).date()) for u, ts in rows]
    )
    assert got == want
    assert got["2031-02-15"] == 0  # null-user day observed, nobody active


def test_shared_span_complement_equals_join_rollup(spark, sf_dir):
    """n_shared = n_spans - n_unique (the r16 complement form) must equal
    the definitional join-back rollup row-for-row on the fixture, and the
    output must keep exactly the docs with n_shared >= 1 (the old inner
    hits-join semantics)."""
    from flink_wordcount_spark.io import table
    from flink_wordcount_spark.operators.dedup import shingle_hashes
    from flink_wordcount_spark.plans.dedup_q import _SPAN_W

    sp = shingle_hashes(
        table(spark, sf_dir, "documents"), "text", "doc_id", n=_SPAN_W
    )
    # definitional: per-span frequency, join back, per-doc counts
    freq = sp.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    shared = freq.filter("n_docs >= 2").select("h")
    hits = sp.join(shared, "h").groupBy("id").agg(F.count(F.lit(1)).alias("n_shared"))
    totals = sp.groupBy("id").agg(F.count(F.lit(1)).alias("n_spans"))
    want = {
        (r["id"], r["n_spans"], r["n_shared"])
        for r in hits.join(totals, "id").collect()
    }
    got = {
        (r["doc_id"], r["n_spans"], r["n_shared"])
        for r in QUERIES["dedup_shared_spans_hashed"](spark, sf_dir).collect()
    }
    assert got == want
    assert all(n_shared >= 1 for _, _, n_shared in got)


def test_prefix_jaccard_equals_inverted_index_fixture(spark, sf_dir):
    """The r16 prefix-filtered exact Jaccard join (prefix=True) must equal
    the plain inverted-index join row-for-row on the fixture — pairs,
    n_shared, rounded similarity AND schema."""
    from flink_wordcount_spark.io import table
    from flink_wordcount_spark.operators.dedup import jaccard_pairs, shingle_hashes

    sh = shingle_hashes(table(spark, sf_dir, "documents"), "text", "doc_id", n=3)
    for t in (0.8, 0.5):
        old = jaccard_pairs(sh, t).orderBy("id_a", "id_b").collect()
        new = jaccard_pairs(sh, t, prefix=True).orderBy("id_a", "id_b").collect()
        assert old == new, f"threshold {t}: prefix path diverged"
    assert (
        jaccard_pairs(sh, 0.8, prefix=True).schema
        == jaccard_pairs(sh, 0.8).schema
    )


def test_prefix_jaccard_equals_inverted_index_adversarial(spark):
    """Prefix-bound correctness on engineered set families: exact-threshold
    ratios (jaccard == t precisely — the round-before-compare boundary),
    identical sets, subset pairs, singletons, a corpus-hot key present in
    every set (sorts LAST under df order, so it must never be needed for
    recall), and a seeded random soup — all compared against the
    definitional path across three thresholds."""
    import random

    from flink_wordcount_spark.operators.dedup import jaccard_pairs

    rng = random.Random(42)
    sets: dict[int, set[int]] = {
        1: {10, 11, 12, 13, 14},          # vs 2: s=4, union 6 -> 0.666667
        2: {10, 11, 12, 13, 15},
        3: {20, 21, 22, 23},              # vs 4: s=3, union 5 -> 0.6 exactly
        4: {20, 21, 22, 24},
        5: {30, 31, 32},                  # identical pair (jaccard 1.0)
        6: {30, 31, 32},
        7: {40},                          # singleton vs singleton
        8: {40},
        9: {50, 51, 52, 53, 54, 55, 56, 57, 58, 59},  # superset of 10
        10: {50, 51, 52, 53, 54, 55, 56, 57},         # s=8/10 -> 0.8 exactly
    }
    hot = 999  # corpus-hot key: in EVERY set, max df, sorts last
    for s in sets.values():
        s.add(hot)
    for i in range(11, 40):  # random soup over a small universe
        sets[i] = set(rng.sample(range(100), rng.randint(2, 12))) | {hot}
    rows = [(i, h) for i, s in sets.items() for h in s]
    sh = spark.createDataFrame(rows, "id long, h long")
    for t in (0.8, 0.6, 0.5):
        old = jaccard_pairs(sh, t).orderBy("id_a", "id_b").collect()
        new = jaccard_pairs(sh, t, prefix=True).orderBy("id_a", "id_b").collect()
        assert old == new, f"threshold {t}: {old} != {new}"
        assert len(old) > 0  # the family must actually exercise the join
