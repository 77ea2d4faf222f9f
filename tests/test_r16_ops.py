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
