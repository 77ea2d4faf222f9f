"""Event-time windowing over the ``events`` table (batch form).

These are the batch-checkable twins of the Structured Streaming queries in
``streaming/`` (SURVEY §5.2.3: streaming is verified by batch replay): the
same ``window()``/``session_window()`` expressions run identically in a
``readStream`` pipeline with a watermark.

Window starts are epoch-aligned in both engines (Spark aligns to the epoch;
DuckDB ``time_bucket`` origin 2000-01-01 is itself epoch-aligned for the
intervals used here), so bucket boundaries agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..hints import maybe_broadcast
from ..io import normalize_event_ts, table
from .catalog import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "ev_tumbling_hour",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ev_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type."""
    e = table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        e.groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("window.start"), _TS_FMT).alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "ev_sliding_window",
    oracle="""
    WITH hops AS (
        SELECT e.ts, e.value,
               time_bucket(INTERVAL '30 minutes', e.ts) - o.o * INTERVAL '30 minutes' AS win_start
        FROM events e CROSS JOIN (VALUES (0), (1)) o(o)
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM hops
    WHERE ts >= win_start AND ts < win_start + INTERVAL '1 hour'
    GROUP BY 1
    """,
)
def ev_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute hop (each event lands in 2 windows).

    The oracle expands the hops explicitly — same set Spark's window() emits.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("window.start"), _TS_FMT).alias("win_start"),
            "n",
            "total_value",
        )
    )


@query(
    "ev_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions GROUP BY user_id, sess_id
    """,
)
def ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user — ``session_window``
    merges rows whose gap is < 30 min; the oracle reproduces that with the
    gaps-and-islands pattern (lag + running sum of boundaries)."""
    e = table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        e.groupBy(sw, "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), _TS_FMT).alias("session_start"),
            F.date_format(F.col("session_window.end"), _TS_FMT).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "ev_pivot_types",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error
    FROM events GROUP BY 1
    """,
)
def ev_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (stable schema at any scale)."""
    e = table(spark, sf_dir, "events")
    piv = (
        e.select(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    return piv.select(
        "day",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
          for c in ("click", "view", "purchase", "signup", "error")],
    )


@query(
    "ev_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(count(*) FILTER (WHERE t_signup IS NOT NULL) AS BIGINT) AS did_signup,
           CAST(count(*) FILTER (WHERE t_signup IS NOT NULL AND t_view > t_signup) AS BIGINT) AS then_viewed,
           CAST(count(*) FILTER (WHERE t_signup IS NOT NULL AND t_view > t_signup
                                   AND t_purchase > t_view) AS BIGINT) AS then_purchased
    FROM per_user
    """,
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (signup -> first view after -> first purchase
    after): one conditional-min aggregation pass, no self-joins — the
    scalable funnel shape (events shuffled once on user_id)."""
    e = table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        first("signup").alias("t_signup"),
        first("view").alias("t_view"),
        first("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    viewed = signed & (F.col("t_view") > F.col("t_signup"))
    purchased = viewed & (F.col("t_purchase") > F.col("t_view"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(signed, 1)).alias("did_signup"),
        F.count(F.when(viewed, 1)).alias("then_viewed"),
        F.count(F.when(purchased, 1)).alias("then_purchased"),
    )


@query(
    "ev_asof_last_purchase",
    oracle="""
    SELECT event_id, user_id, event_type,
           strftime(max(CASE WHEN event_type = 'purchase' THEN ts END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    '%Y-%m-%d %H:%M:%S') AS last_purchase_ts
    FROM events
    """,
)
def ev_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, window form: attach the most recent prior 'purchase'
    timestamp to every event per user. Spark has no native as-of join; the
    running conditional-max over an ordered window is the shuffle-minimal
    equivalent (one exchange on user_id vs merge_asof's per-group Python) —
    SURVEY §2.2 'range/as-of' and the pyspark guide's as-of pattern."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_purchase = F.max(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format(last_purchase, _TS_FMT).alias("last_purchase_ts"),
    )


@query(
    "ev_multires_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           strftime(time_bucket(INTERVAL '1 hour', ts), '%H:%M') AS hour,
           count(*) AS n,
           round(sum(value), 2) AS total_value,
           CAST(grouping(strftime(time_bucket(INTERVAL '1 hour', ts), '%H:%M')) AS BIGINT) AS gid
    FROM events
    GROUP BY GROUPING SETS (
        (strftime(date_trunc('day', ts), '%Y-%m-%d'),
         strftime(time_bucket(INTERVAL '1 hour', ts), '%H:%M')),
        (strftime(date_trunc('day', ts), '%Y-%m-%d'))
    )
    """,
)
def ev_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly + daily aggregates in
    ONE scan via grouping sets (continuous-aggregate shape — at 100 TB this
    is the materialized rollup a time-series engine maintains incrementally)."""
    e = table(spark, sf_dir, "events")
    e.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "HH:mm").alias("hour"),
        "value",
    ).createOrReplaceTempView("ev_mr")
    return spark.sql(
        """
        SELECT day, hour, count(*) AS n, round(sum(value), 2) AS total_value,
               CAST(grouping(hour) AS BIGINT) AS gid
        FROM ev_mr
        GROUP BY GROUPING SETS ((day, hour), (day))
        """
    )


@query(
    "ev_user_rollup",
    oracle="""
    SELECT user_id, event_type, count(*) AS n,
           round(sum(value), 2) AS total_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
    FROM events
    GROUP BY user_id, event_type
    """,
)
def ev_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user per-type activity profile (hypertable-rollup shape)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.date_format(F.min("ts"), _TS_FMT).alias("first_seen"),
        F.date_format(F.max("ts"), _TS_FMT).alias("last_seen"),
    )


@query(
    "ev_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT time_bucket(INTERVAL '1 hour', min(ts)) AS lo,
               time_bucket(INTERVAL '1 hour', max(ts)) AS hi
        FROM events
    ),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events WHERE event_type IS NOT NULL),
    hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS hr, event_type,
               count(*) AS n, round(sum(value), 2) AS tv
        FROM events GROUP BY 1, 2
    ),
    joined AS (
        SELECT t.event_type, s.hr, h.n, h.tv
        FROM spine s CROSS JOIN types t
        LEFT JOIN hourly h ON h.hr = s.hr AND h.event_type = t.event_type
    )
    SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(coalesce(n, 0) AS BIGINT) AS n,
           coalesce(last_value(tv IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
             AS total_value_cf
    FROM joined
    """,
)
def ev_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly spine per event type with
    zero-filled counts and carry-forward (LOCF) of the last seen hourly
    total — the hypertable `time_bucket_gapfill` / `locf` operation,
    composed from sequence+explode, a cross join against the tiny type dim,
    and an ignore-nulls last() window. The spine derives from a 1-row
    min/max aggregate, so the only data-sized shuffle is the hourly rollup;
    the spine side stays broadcast-small at any corpus scale.

    A NULL event_type is NOT a series: collect_set drops NULLs and the
    oracle's type dim filters them to match (an untyped event can never
    equi-join back to its spine row anyway — NULL-vintage sweep, r08).
    """
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
    )
    # bounds AND the type dimension in ONE reduce over events (not three
    # scans): min/max timestamp plus collect_set of the low-cardinality type
    meta = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
        F.collect_set("event_type").alias("types"),
    )
    spine = meta.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
        "types",
    ).select("hr", F.explode("types").alias("event_type"))
    joined = spine.join(maybe_broadcast(hourly), ["hr", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        F.date_format("hr", _TS_FMT).alias("hour"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.coalesce(F.last("tv", ignorenulls=True).over(w), F.lit(0.0)).alias(
            "total_value_cf"
        ),
    )


def _asof_purchase_click(spark: SparkSession, sf_dir: str, tolerance=None) -> DataFrame:
    """Shared purchases-pick-up-last-click as-of topology (review r09: the
    tolerance twin hand-copied this whole body; the r08 _bm25_per_stats
    precedent applies — a fix to the fresh-scan workaround or the tie order
    must reach both queries)."""
    from ..operators.asof import asof_join

    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    # the right side MUST come from a fresh scan: cogrouping two projections
    # of the same DataFrame collapses the shared-lineage `ts` attribute out
    # of one side (Catalyst self-join dedup), and the pandas batch then has
    # no `ts` column to merge on (asof.py docstring)
    e2 = spark.read.parquet(f"{sf_dir}/events.parquet").transform(normalize_event_ts)
    clicks = e2.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = asof_join(
        purchases,
        clicks,
        by="user_id",
        on="ts",
        schema="user_id bigint, ts timestamp, value double, click_ts timestamp, click_value double",
        keep_right_on="click_ts",
        tolerance=tolerance,
    )
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.date_format("click_ts", _TS_FMT).alias("click_ts"),
        "click_value",
    )


@query(
    "join_asof_two_table",
    oracle="""
    SELECT p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_two_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GENERAL two-table as-of join (operators/asof.py): every purchase
    picks up the user's last click at-or-before it via cogrouped
    applyInPandas + merge_asof — checked against DuckDB's native ASOF JOIN.
    Complements the window-form ev_asof_last_purchase (same-table special
    case); this is the heterogeneous-tables shape (trades/quotes). One
    shuffle per side on user_id; per-group Arrow batches stay small
    (per-user histories).
    """
    return _asof_purchase_click(spark, sf_dir)


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR
                THEN strftime(c.ts, '%Y-%m-%d %H:%M:%S') END AS click_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR
                THEN c.value END AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE: each purchase picks up the
    user's last click at-or-before it ONLY if that click is within 1 hour —
    the trades/quotes "stale quote" cutoff (pandas merge_asof's tolerance,
    kdb wj's window edge). The nearest-but-too-old match becomes NULL, not
    the next-nearest: tolerance bounds the match, it does not widen the
    search — which is why DuckDB's oracle is ASOF JOIN + null-out, not a
    banded range join.

    Scale: identical shape to join_asof_two_table (one hash exchange per
    side on user_id, per-group Arrow merge — shared _asof_purchase_click
    topology); the tolerance is evaluated inside the pandas batch at zero
    extra shuffle."""
    import pandas as pd

    return _asof_purchase_click(spark, sf_dir, tolerance=pd.Timedelta(hours=1))


@query(
    "ev_attribution_time_decay",
    oracle="""
    WITH touches AS (
        SELECT p.event_id AS pid, p.value AS pval, t.event_type AS touch_type,
               1.0 / (1 + date_diff('microsecond', t.ts, p.ts) // 3600000000) AS w
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type IN ('view', 'click')) t
          ON p.user_id = t.user_id
         AND t.ts <= p.ts AND t.ts > p.ts - INTERVAL 24 HOUR
    ), norm AS (
        SELECT *, sum(w) OVER (PARTITION BY pid) AS wsum FROM touches
    )
    SELECT touch_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           round(sum(w / wsum * pval), 2) AS attributed_value
    FROM norm GROUP BY touch_type
    """,
)
def ev_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch revenue attribution with time decay: every purchase's
    value is split across the SAME user's view/click touches in the prior
    24 h, weighted 1/(1 + whole hours before) and normalized per purchase —
    the standard marketing-attribution rollup. The decay weight is a
    RATIONAL function (integer hours), not exp(): division is
    correctly-rounded IEEE on both engines, so the weights are bit-identical
    where a pow/exp form could drift by libm ULPs.

    Scale: purchases x touches joins as a plain user_id equi-join (hash
    exchange on user_id, the 24 h band filters inside the join), so pair
    count is bounded by per-user 24 h activity, never corpus^2; the
    per-purchase normalizer is a window over pid (second keyed exchange on
    purchase id), and the final rollup is a 2-row aggregate."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("pval"),
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_uid"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    touches = p.join(
        t,
        (F.col("p_uid") == F.col("t_uid"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") > F.col("p_ts") - F.expr("INTERVAL 24 HOURS")),
    ).select(
        "pid",
        "pval",
        "touch_type",
        # whole-hours-before in INTEGER microseconds (unix_micros + integer
        # floor-div on both engines): a timestamp cast to double carries
        # ~2.4e-7 s of ulp at 2024 epochs, enough to flip a gap of exactly
        # 3600s into the wrong bucket on one engine only (review r09)
        (
            F.lit(1.0)
            / (
                1
                + F.expr("(unix_micros(p_ts) - unix_micros(t_ts)) div 3600000000")
            )
        ).alias("w"),
    )
    wsum = F.sum("w").over(Window.partitionBy("pid"))
    return (
        touches.withColumn("wsum", wsum)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum(F.col("w") / F.col("wsum") * F.col("pval")), 2).alias(
                "attributed_value"
            ),
        )
    )


@query(
    "ev_funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
    )
    SELECT 'view' AS step, CAST(count(*) AS BIGINT) AS users FROM s1
    UNION ALL
    SELECT 'view_click' AS step, CAST(count(*) AS BIGINT) AS users FROM s2
    UNION ALL
    SELECT 'view_click_purchase' AS step, CAST(count(*) AS BIGINT) AS users FROM s3
    """,
)
def ev_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first view,
    then purchased AFTER that first qualifying click.

    Strict event-ORDER funnel (not mere type co-occurrence): each stage keeps
    min(ts) of qualifying events and the next stage requires a strictly later
    timestamp. Scale shape: per-user aggregates shuffle on user_id once per
    stage and each stage's output is only the surviving-user set (shrinking
    monotonically) joined back map-side under the broadcast gate.
    """
    e = table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(maybe_broadcast(s1), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(maybe_broadcast(s2), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def step(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("step"), F.count(F.lit(1)).alias("users")
        )

    return (
        step("view", s1)
        .unionAll(step("view_click", s2))
        .unionAll(step("view_click_purchase", s3))
    )


@query(
    "ev_retention_cohorts",
    oracle="""
    WITH weekly AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ), cohorts AS (
        SELECT user_id, min(wk) AS cohort FROM weekly GROUP BY 1
    )
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', c.cohort, w.wk) / 7 AS BIGINT) AS week_offset,
           CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
    FROM weekly w JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
)
def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted in
    each subsequent week they return (the classic retention triangle).

    One distinct-reduce to (user, week), a per-user min for the cohort, and
    one count-distinct — the cohort dimension joins back under the broadcast
    gate. Week buckets are ISO-Monday date_trunc on both engines, and the
    offset is exact integer arithmetic on day differences (multiples of 7).
    """
    e = table(spark, sf_dir, "events")
    weekly = e.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        weekly.join(maybe_broadcast(cohorts), "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.to_date("wk"), F.to_date("cohort")) / 7
            ).cast("bigint").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


@query(
    "ev_session_paths",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, event_id, event_type, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM marked
    ), paths AS (
        SELECT user_id, sess_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, sess_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def ev_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey strings per 30-min session (sequence-mining shape:
    sessionize -> order events -> concatenate types -> count paths).

    Sessionization is the same gaps-and-islands as ev_session_window; the
    in-session ordering is made total with the event_id tie-break, and the
    path string is built by sorting collected (ts, event_id, type) structs —
    collect_list alone has no deterministic order under parallel merge.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # micros precision, NOT ts.cast("long"): the long cast truncates to
    # seconds, and a gap within 1 s of the 30-min boundary then splits
    # differently from the oracle's full-precision interval compare
    # (caught by the sf0.1 sweep — sf0.001/0.01 had no boundary-straddling
    # gap)
    us = F.unix_micros(F.col("ts"))
    marked = e.withColumn(
        "is_new",
        F.when(us - F.lag(us).over(w) >= 1_800_000_000, 1).otherwise(0),
    )
    sess = marked.withColumn("sess_id", F.sum("is_new").over(w))
    paths = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            # count(event_type) counts NON-NULL types: a session of only
            # untyped events has path NULL like the oracle's string_agg
            # (array_join and string_agg both skip interleaved NULLs, but
            # array_join of an all-NULL array is '' while string_agg is
            # NULL — NULL-vintage sweep, r08)
            F.when(
                F.count("event_type") > 0,
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("ts", "event_id", "event_type"))
                        ),
                        lambda s: s["event_type"],
                    ),
                    ">",
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        # asc_nulls_last: DuckDB's ASC default; keeps the limit-20 boundary
        # deterministic when a NULL path ties on count
        .orderBy(F.desc("n_sessions"), F.asc_nulls_last("path"))
        .limit(20)
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared salted skew join: orders (fact, salted per-row on its PK)
    against customer replicated across 8 salt values, joined on
    (custkey, salt) — the manual hot-key spread for when a skewed key's dim
    side is too big to broadcast but cheap to replicate.  Result is
    provably identical to the plain join (dim unique on the key), which is
    exactly what the oracle checks."""
    from ..operators.skew import salted_join

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, "o_custkey", salt_buckets=8, salt_on="o_orderkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "ev_session_dynamic_gap",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN event_type = 'purchase' THEN INTERVAL '45 minutes'
                    ELSE INTERVAL '30 minutes' END AS gap
        FROM events
    ), m AS (
        SELECT user_id, ts, value, event_id, gap,
               max(ts + gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS prev_end
        FROM g
    ), marked AS (
        SELECT user_id, ts, value, gap,
               CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0
               END AS is_new,
               event_id
        FROM m
    ), sessions AS (
        SELECT user_id, ts, value, gap,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS sess_id
        FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts + gap), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions GROUP BY user_id, sess_id
    """,
)
def ev_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap: purchases hold the session open
    for 45 min, everything else 30 min (``session_window`` with a gap
    expression — the dynamic-gap form Flink exposes as
    ``SessionWindowTimeGapExtractor``).  Merge semantics: each event extends
    the session to ``ts + gap(event)``; a session closes when the next
    event's ts reaches the running ``max(ts + gap)``.  The oracle reproduces
    exactly that with gaps-and-islands over a running max — note
    ``>=``: Spark's window is half-open [start, end), so an event landing
    exactly on the session end starts a new session.  Scale shape: one hash
    exchange on user_id, per-partition sort — same cost as fixed-gap
    sessionization; the gap expression is evaluated map-side."""
    e = table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", "45 minutes").otherwise(
        "30 minutes"
    )
    sw = F.session_window("ts", gap)
    return (
        e.groupBy(sw, "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), _TS_FMT).alias(
                "session_start"
            ),
            F.date_format(F.col("session_window.end"), _TS_FMT).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "ts_profile_similarity",
    oracle="""
    WITH prof AS (
        SELECT user_id, CAST(extract(hour FROM ts) AS BIGINT) AS hod,
               avg(value) AS v
        FROM events GROUP BY 1, 2
    ), ref AS (
        SELECT min(user_id) AS ref_user FROM events
    ), dist AS (
        SELECT p.user_id,
               round(sum((p.v - r.v) * (p.v - r.v)), 4) AS ssd,
               count(*) AS n_hours
        FROM prof p
        JOIN ref ON p.user_id <> ref.ref_user
        JOIN prof r ON r.user_id = ref.ref_user AND r.hod = p.hod
        GROUP BY p.user_id
    )
    SELECT user_id, ssd, n_hours FROM dist
    ORDER BY ssd, user_id LIMIT 10
    """,
)
def ts_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (EDBT'19 streaming-similarity shape):
    each user's hour-of-day activity profile (24-dim avg(value) series) is
    matched against a reference user's profile by squared Euclidean
    distance over the common hours; top-10 nearest, totally ordered.

    Scale shape: profiles are ONE groupBy over the fact table (24 rows per
    user — the classic dimensionality reduction that makes series search
    tractable at 100 TB); the reference profile is a <=24-row broadcast, so
    the search is a map-side join + partial agg, and top-k plans as
    TakeOrdered.  Swap the single reference for an LSH bucket join
    (operators/similarity.py) for all-pairs search.

    The profile rollup is persisted: it feeds both the reference-profile
    branch and the probe side, which otherwise each re-aggregate the fact
    table (r08 review; lifetime follows the clearCache-between-queries
    convention).  A user whose shared-hour values are all NULL has ssd NULL
    and sorts LAST like the oracle (asc_nulls_last — DuckDB's ASC default):
    no measurable distance is not 'nearest'."""
    e = table(spark, sf_dir, "events")
    prof = (
        e.select("user_id", F.hour("ts").cast("long").alias("hod"), "value")
        .groupBy("user_id", "hod")
        .agg(F.avg("value").alias("v"))
        .persist()
    )
    # min over the (user, hod) rollup == min over events (every user with
    # an event has a profile row) — reads the cache, not a third fact scan
    ref_user = prof.agg(F.min("user_id").alias("ref_user"))
    ref_prof = (
        prof.join(
            maybe_broadcast(ref_user),
            prof.user_id == F.col("ref_user"),
        )
        .select("hod", F.col("v").alias("rv"), "ref_user")
    )
    return (
        prof.join(maybe_broadcast(ref_prof), "hod")
        .filter(F.col("user_id") != F.col("ref_user"))
        .groupBy("user_id")
        .agg(
            F.round(F.sum((F.col("v") - F.col("rv")) * (F.col("v") - F.col("rv"))), 4).alias("ssd"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .orderBy(F.asc_nulls_last("ssd"), "user_id")
        .limit(10)
    )


@query(
    "ev_cdc_latest_state",
    oracle="""
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           round(value, 2) AS last_value,
           CAST(event_id AS BIGINT) AS last_event_id
    FROM (
        SELECT user_id, event_type, ts, value, event_id,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def ev_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction / latest-wins merge: materialize the CURRENT state
    table from an append-only change log — one row per (user_id,
    event_type) key carrying the newest event by (ts, event_id).  The
    standard upsert-compaction every incremental pipeline runs before
    serving (and the batch shape of the streaming dedup-by-key state).

    Scale: ONE shuffle on the compaction key; the per-key sort is bounded
    by per-key changelog depth, and AQE skew-splits a hot key.  No
    collect, no global order — row_number over the key partition is the
    compaction, not a ranking of the whole log."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.date_format("ts", _TS_FMT).alias("last_ts"),
            F.round("value", 2).alias("last_value"),
            F.col("event_id").cast("bigint").alias("last_event_id"),
        )
    )


@query(
    "qa_referential_events",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT) AS n_orphan,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY event_type
    """,
)
def qa_referential_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity QA: per event type, how many events point at a
    user_id with no matching customer row (orphans) — the fact-vs-dimension
    consistency check a pipeline runs after every ingest, emitted as a
    per-type scorecard rather than a bare pass/fail so a regression names
    its segment.

    Scale: the dimension side is size-gate broadcast (customer scales with
    SF — same rule as the TPC-H joins), the fact side aggregates map-side
    first; one shuffle on event_type."""
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.lit(1).alias("cust_ok")
    )
    return (
        e.join(maybe_broadcast(c), "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("cust_ok").isNull(), 1)).alias("n_orphan"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "ev_moving_window_1h",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(value) OVER w, 2) AS value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def ev_moving_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour moving aggregate per user, evaluated AT EVERY EVENT
    (RANGE frame on event time, not row count) — the sliding-window rollup a
    TSDB evaluates continuously, and the frame kind row-based windows can't
    express when events are irregularly spaced.  RANGE mode makes
    same-timestamp events peers in both engines, so no tie-break is needed
    for value parity.  The frame key is MICROSECONDS on both sides
    (unix_micros / epoch_us): the fixtures carry sub-second timestamps, and
    a whole-second key truncates differently than DuckDB's fractional
    epoch() — measured as one diverging row at sf0.1 (review r07).

    Scale: one shuffle on user_id; the frame is evaluated with a sliding
    two-pointer over each user's time-sorted events (Spark's bounded-range
    WindowExec), so cost is O(events) per user, not O(events x frame)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("value_1h"),
    )


@query(
    "ev_value_percentiles",
    oracle="""
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           round(max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN value END), 2) AS p50,
           round(max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN value END), 2) AS p90,
           round(max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END), 2) AS p99
    FROM r GROUP BY event_type
    """,
)
def ev_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99 of value per event type) via
    rank selection — engine-neutral by construction: the k-th smallest
    element at k = ceil(q*n) with an (value, event_id) total order, so both
    engines pick the SAME physical row (interpolating percentile functions
    differ between engines and are deliberately avoided).  The latency-SLO
    rollup shape.

    Scale: one window sort per event_type partition + one aggregate.  At
    100 TB prefer approx_percentile (one-pass sketch) for dashboards and
    keep this exact form for SLO audits — the same exact/approx pairing as
    agg_quantile_disc.

    NULL values are excluded on both sides (a missing metric is not part of
    the distribution; unfiltered, Spark's NULLS-FIRST vs DuckDB's NULLS-LAST
    ASC default shifts every rank — NULL-vintage sweep, r08)."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(q: float):
        at = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        return F.round(F.max(F.when(F.col("rn") == at, F.col("value"))), 2)

    return r.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        pick(0.50).alias("p50"),
        pick(0.90).alias("p90"),
        pick(0.99).alias("p99"),
    )


@query(
    "ev_user_value_deciles",
    oracle="""
    WITH per_user AS (
        SELECT user_id, round(sum(value), 2) AS total
        FROM events GROUP BY user_id
    ), bucketed AS (
        SELECT user_id, total,
               CAST(ntile(10) OVER (ORDER BY total DESC, user_id) AS BIGINT)
                   AS decile
        FROM per_user
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_users,
           round(sum(total), 2) AS decile_value,
           round(min(total), 2) AS min_total,
           round(max(total), 2) AS max_total
    FROM bucketed GROUP BY decile
    """,
)
def ev_user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-value decile table (whale analysis): users ranked by lifetime
    value and NTILE'd into 10 equal buckets with per-decile totals and
    boundaries — the concentration report behind 'the top decile drives X%
    of value'.  ntile is engine-neutral given a TOTAL order (value ties
    broken by user_id) because both engines assign the canonical
    first-buckets-get-the-remainder sizes.

    Scale (VERDICT r07 What's-wrong #1 closed): the per-user rollup is the
    corpus-sized shuffle; the decile assignment is then the grid-partitioned
    two-phase global rank (``operators/rankops.py`` — the
    shard_by_token_budget cumsum shape), NOT an unpartitioned ntile window,
    so no single task ever sorts the user-cardinality frame.  The
    plan-invariant sweep pins this catalog-wide."""
    from ..operators.rankops import global_ntile

    e = table(spark, sf_dir, "events")
    # localCheckpoint (VERDICT r10 #5, retiring the persist-allowlist
    # entry): the rank's two prep jobs and the final job all read the
    # materialized rollup, and the ContextCleaner reclaims it when the
    # plan is GC'd — no reliance on harness clearCache.  Trade documented
    # in rankops' module docstring: local checkpoints don't survive
    # executor loss; a 1000-executor deployment would use persist +
    # scoped unpersist or a reliable checkpoint for multi-hour jobs.
    per_user = (
        e.groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("total"))
        .localCheckpoint()
    )
    return (
        global_ntile(per_user, "total", 10, "user_id", descending=True, out="decile")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("total"), 2).alias("decile_value"),
            F.round(F.min("total"), 2).alias("min_total"),
            F.round(F.max("total"), 2).alias("max_total"),
        )
    )


#: Drift detection: calendar split point, bin width, bin count.
_DRIFT_SPLIT = "2024-01-16"
_DRIFT_W = 25.0
_DRIFT_BINS = 10


@query(
    "qa_drift_psi",
    oracle=f"""
    WITH b AS (
        SELECT event_type,
               least(CAST(floor(value / {_DRIFT_W}) AS BIGINT), {_DRIFT_BINS - 1}) AS bin,
               (ts < TIMESTAMP '{_DRIFT_SPLIT}') AS early
        FROM events
    ), counts AS (
        SELECT event_type, bin,
               CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM b GROUP BY 1, 2
    ), grid AS (
        SELECT event_type, i AS bin
        FROM (SELECT DISTINCT event_type FROM events),
             unnest(range(0, {_DRIFT_BINS})) AS u(i)
    ), filled AS (
        SELECT g.event_type, g.bin,
               coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        FROM grid g
        LEFT JOIN counts c ON c.event_type = g.event_type AND c.bin = g.bin
    ), tot AS (
        SELECT event_type,
               CAST(sum(ca) AS BIGINT) AS n_a,
               CAST(sum(cb) AS BIGINT) AS n_b
        FROM filled GROUP BY 1
    )
    SELECT f.event_type, n_a, n_b,
           round(sum(
               ((ca + 1) / (n_a + {_DRIFT_BINS}.0) - (cb + 1) / (n_b + {_DRIFT_BINS}.0))
               * ln(((ca + 1) / (n_a + {_DRIFT_BINS}.0)) / ((cb + 1) / (n_b + {_DRIFT_BINS}.0)))
           ), 6) + 0.0 AS psi
    FROM filled f JOIN tot t USING (event_type)
    GROUP BY 1, 2, 3
    """,
)
def qa_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report: per event_type Population Stability Index
    of the ``value`` distribution between the first and second half of the
    month (split at _DRIFT_SPLIT).  The standard silent-upstream-change alarm
    a long-running ingest pipeline runs per delivery: PSI < 0.1 stable,
    0.1-0.2 watch, > 0.2 investigate.  Laplace-smoothed ((c+1)/(n+bins)) so
    empty bins are well-defined; the full type x bin grid is materialized so
    zero-count bins still contribute their smoothed term.

    Scale: binning is a map-side expression; the only shuffle over the fact
    table is the (type, bin) count — a few hundred cells regardless of row
    count.  The grid cross-join is over the distinct-type dimension (bounded
    cardinality), never the facts."""
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.least(
            F.floor(F.col("value") / F.lit(_DRIFT_W)), F.lit(_DRIFT_BINS - 1).cast("long")
        ).alias("bin"),
        (F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp")).alias("early"),
    )
    counts = b.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("early"), 1).otherwise(0)).alias("cb"),
    )
    grid = (
        b.select("event_type")
        .distinct()
        .crossJoin(spark.range(_DRIFT_BINS).select(F.col("id").alias("bin")))
    )
    filled = (
        grid.join(counts, ["event_type", "bin"], "left")
        .fillna(0, ["ca", "cb"])
    )
    tot = filled.groupBy("event_type").agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    smooth = F.lit(float(_DRIFT_BINS))
    j = filled.join(tot, "event_type")
    pa = (F.col("ca") + 1) / (F.col("n_a") + smooth)
    pb = (F.col("cb") + 1) / (F.col("n_b") + smooth)
    return (
        j.groupBy("event_type", "n_a", "n_b")
        .agg((F.round(F.sum((pa - pb) * F.log(pa / pb)), 6) + F.lit(0.0)).alias("psi"))
    )


@query(
    "qa_key_skew",
    oracle="""
    WITH counts AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM counts
    )
    SELECT user_id, cnt, total, n_keys,
           cnt / total AS share,
           (cnt * n_keys) / total AS ratio_to_avg
    FROM counts, tot
    ORDER BY cnt DESC, user_id
    LIMIT 20
    """,
)
def qa_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile for a prospective join/agg key: the top-20
    heaviest ``user_id`` keys with their share of all rows and their ratio
    to the mean key load.  This is the measurement that decides the salting
    question BEFORE a 100 TB shuffle is launched (``ratio_to_avg`` >> 1 on
    the head keys -> salt or AQE skew-join; ~1 -> plain hash exchange is
    fine) — the profiler behind :func:`join_salted_skew`.

    Scale: one map-side-combined count per key, then TakeOrdered(20) — the
    corpus never leaves the count aggregate; the single-row totals side is
    broadcast.  Ratios are raw integer-quotient IEEE divisions (catalog
    rule: never round those)."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("cnt"), "user_id").limit(20)
    return top.crossJoin(F.broadcast(tot)).select(  # tot: single row
        "user_id",
        "cnt",
        "total",
        "n_keys",
        (F.col("cnt") / F.col("total")).alias("share"),
        (F.col("cnt") * F.col("n_keys") / F.col("total")).alias("ratio_to_avg"),
    )


@query(
    "ev_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type AS state, ts, event_id,
               lag(event_type) OVER w AS prev_state
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
        SELECT user_id, state, ts, event_id
        FROM ordered
        WHERE prev_state IS NULL OR state <> prev_state
    )
    SELECT user_id, state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
           (lead(ts) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ev_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: compress each user's
    event stream into state-change runs and emit validity intervals
    [valid_from, valid_to) with an ``is_current`` flag on the open row —
    the standard warehouse dimension-history shape, derived from the same
    change feed ``ev_cdc_latest_state`` compacts to latest-wins.

    Scale: ONE hash exchange on user_id serves both windows (change
    detection via lag, interval close via lead share the partitioning and
    sort); per-user sort only, no global order, no self-join — the
    gaps-and-islands plan at any corpus size."""
    ev = table(spark, sf_dir, "events")
    changes = (
        ev.select(
            "user_id",
            F.col("event_type").alias("state"),
            "ts",
            "event_id",
            F.lag("event_type").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("prev_state"),
        )
        .filter(F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "state",
        F.date_format("ts", _TS_FMT).alias("valid_from"),
        F.date_format(nxt, _TS_FMT).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "ev_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ), pairs AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), tot AS (
        SELECT cur, CAST(sum(n) AS BIGINT) AS n_from FROM pairs GROUP BY 1
    )
    SELECT p.cur, p.nxt, p.n, t.n_from,
           p.n / t.n_from AS prob
    FROM pairs p JOIN tot t ON t.cur = p.cur
    """,
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: P(next event type | current)
    over each user's time-ordered stream — the user-journey summary behind
    next-action prediction and funnel design (``ev_session_paths`` tells you
    the popular whole paths; this tells you every edge's weight).

    Scale: one user_id exchange for the sequence window, then a k x k
    aggregate (k = event-type cardinality) with map-side partials — the
    transition matrix itself is grid-bounded like the rest of the QA
    family.  ``prob`` is a raw integer-quotient IEEE division."""
    ev = table(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("n_from"))
    return pairs.join(tot, "cur").select(
        "cur", "nxt", "n", "n_from", (F.col("n") / F.col("n_from")).alias("prob")
    )


@query(
    "ev_pattern_strict_sequence",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type, 1) OVER w AS n1,
               lead(event_type, 2) OVER w AS n2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_match_ts
    FROM seq
    WHERE event_type = 'view' AND n1 = 'click' AND n2 = 'purchase'
    GROUP BY user_id
    """,
)
def ev_pattern_strict_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style STRICT-contiguity pattern match: per user, occurrences of
    the exact consecutive sequence view -> click -> purchase with NO
    intervening event — the MATCH_RECOGNIZE shape, relationally expressed.
    Complements ``ev_funnel`` (which tolerates gaps): strict contiguity is
    the fraud/bot signature (a human path has noise between steps).

    Scale: the same one-exchange gaps-and-islands plan as the session
    family — lead(,1)/lead(,2) share the user_id partitioning and sort, the
    match filter is map-side after the window, and the per-user rollup
    rides the existing partitioning."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("event_type", 1).over(w).alias("n1"),
        F.lead("event_type", 2).over(w).alias("n2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("n1") == "click")
            & (F.col("n2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.date_format(F.min("ts"), _TS_FMT).alias("first_match_ts"),
        )
    )


@query(
    "ev_rfm_segmentation",
    oracle="""
    WITH maxts AS (
        SELECT max(ts) AS corpus_max FROM events
    ), rfm AS (
        SELECT user_id,
               CAST(epoch_us((SELECT corpus_max FROM maxts)) - epoch_us(max(ts))
                    AS BIGINT) AS recency_us,
               CAST(count(*) AS BIGINT) AS frequency,
               round(sum(value), 2) AS monetary
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT user_id, recency_us, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_us DESC, user_id) AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary NULLS FIRST, user_id) AS BIGINT)
               AS m_score
    FROM rfm
    """,
)
def ev_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per purchaser, recency (microseconds before
    the corpus max timestamp), frequency and monetary total, each scored
    into quintiles (higher = better: most-recent / most-frequent /
    highest-spend land in bucket 5) — the classic lifecycle-marketing
    segmentation, with total tie-break orders so ntile is engine-neutral.
    A purchaser whose every purchase value is NULL has monetary NULL and
    ranks LOWEST for m_score on both sides (the oracle pins NULLS FIRST to
    match Spark's ascending window default — rankops' documented caveat;
    NULL-vintage review, r08): no spend evidence is the weakest spend.

    Scale (VERDICT r07 What's-wrong #1 closed): one purchase-filtered
    aggregate per user (the single-row corpus-max side broadcast), then
    three quintile assignments via the grid-partitioned two-phase global
    rank (``operators/rankops.py``) — user cardinality scales with the
    corpus, so the former unpartitioned ntile windows were a single task
    sorting the whole rollup; each score now costs one bounded 32-range
    partitioned sort plus a broadcast offsets join, and no SinglePartition
    exchange touches a corpus-scaling frame.  The rollup is persisted
    before the chained ranks (rankops' prescribed pattern; r08 review:
    unpersisted, each rank's two prep jobs re-ran the events lineage —
    ~7 corpus scans for 3 scores); lifetime follows the
    clearCache-between-queries convention."""
    from ..operators.rankops import global_ntile

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    maxts = ev.agg(F.max("ts").alias("corpus_max"))  # anchor: ALL events
    rfm = (
        p.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(maxts))  # maxts: single row
        .select(
            "user_id",
            (
                F.unix_micros("corpus_max") - F.unix_micros("last_ts")
            ).cast("bigint").alias("recency_us"),
            "frequency",
            "monetary",
        )
        # localCheckpoint (VERDICT r10 #5): three chained ntiles = six rank
        # prep jobs re-reading this user-cardinality rollup; materializing
        # it once is the same win the old persist bought, with GC-scoped
        # cleanup instead of until-clearCache (see ev_user_value_deciles).
        .localCheckpoint()
    )
    scored = global_ntile(
        rfm, "recency_us", 5, "user_id", descending=True, out="r_score"
    )
    scored = global_ntile(scored, "frequency", 5, "user_id", out="f_score")
    scored = global_ntile(scored, "monetary", 5, "user_id", out="m_score")
    return scored.select(
        "user_id", "recency_us", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )


@query(
    "ev_day_over_day",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n, total,
           lag(total) OVER w AS prev_total,
           (total - lag(total) OVER w) / lag(total) OVER w AS pct_change
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def ev_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day trend report: per event type, daily count and value
    total with the previous day's total and the relative change — the
    period-over-period delta every operational dashboard leads with
    (first day's change is NULL, not zero: no fabricated baseline).

    Scale: the corpus reduces to the (type, day) grid in one
    map-side-combined aggregate; the lag window sorts only that tiny grid,
    partitioned by type.  pct_change divides two already-rounded totals —
    deterministic on both engines."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("total").over(w)
    return daily.select(
        "event_type",
        "day",
        "n",
        "total",
        prev.alias("prev_total"),
        ((F.col("total") - prev) / prev).alias("pct_change"),
    )

@query(
    "ev_rolling_active_users",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
        SELECT DISTINCT day FROM daily
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           count(DISTINCT a.user_id) AS active_7d
    FROM days d JOIN daily a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    """,
)
def ev_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the WAU curve): for every day
    present in the feed, the distinct users seen in [day-6, day].

    Scale (r16, guide §2.3 — replaces the r15 fan-out shape, which exploded
    the (user, day) distinct x7 and pushed 7x the rows through a second
    (day, user) distinct exchange; sf1 warm ratio 2.79): a user's trailing-7d
    coverage is the union of intervals [day_i, day_i+6] over their sorted
    distinct days, so each user contributes interval DELTAS instead of 7
    fanned rows — +1 at each merged-piece start max(day_i, day_{i-1}+7), -1
    at day_i+7 (all computed inside one array expression over a per-user
    collect_set).  active_7d(d) is then the running sum of deltas at d over
    the calendar-bounded day grid (observed days are unioned in with delta 0
    so a day covered only from earlier starts still gets a row; single tiny
    window partition, ~#calendar-days rows at ANY corpus size).  One
    corpus-sized exchange (groupBy user_id, map-side-combined collect_set)
    instead of a (user,day) distinct PLUS a 7x-fanned (day,user) distinct;
    the events table is scanned once, not twice.  Per-user state is
    calendar-bounded (<= #days in the feed window).  Null user_ids form one
    group whose days still reach the observed-day grid but contribute no
    delta — exactly count(DISTINCT user_id)'s null semantics."""
    e = table(spark, sf_dir, "events")
    per_user = (
        e.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("day")).alias("ds"))
    )
    # Per observed day: +1 at its merged coverage-piece start, -1 one past
    # the piece end, and a delta-0 OBSERVED marker at the day itself (so the
    # grid needs no separate observed-day branch/union/join).  Null user_ids
    # emit only the marker.  Adjacent-piece (+1,-1) collisions on the same
    # day cancel in the sum.
    rows = F.expr(
        "flatten(transform(ds, (d, i) -> CASE WHEN user_id IS NULL THEN"
        " array(named_struct('day', d, 'delta', 0, 'obs', true))"
        " ELSE array("
        "  named_struct('day', CASE WHEN i = 0 THEN d"
        "      ELSE greatest(d, date_add(element_at(ds, i), 7)) END,"
        "      'delta', 1, 'obs', false),"
        "  named_struct('day', date_add(d, 7), 'delta', -1, 'obs', false),"
        "  named_struct('day', d, 'delta', 0, 'obs', true)) END))"
    )
    grid = (
        per_user.select(F.explode(rows).alias("x"))
        .groupBy(F.col("x.day").alias("day"))
        .agg(
            F.sum("x.delta").alias("d_sum"),
            F.max("x.obs").alias("observed"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.select(
            "day", F.sum("d_sum").over(w).alias("active_7d"), "observed"
        )
        .filter("observed")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("active_7d").cast("long").alias("active_7d"),
        )
    )


#: Benford expectation is attached per first-digit bucket (9-row grid).
_BENFORD_DIGITS = list(range(1, 10))


@query(
    "qa_benford_first_digit",
    oracle="""
    WITH cents AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE value > 0
    ), digits AS (
        SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM cents WHERE c > 0
    ), counts AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ), tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS total FROM counts
    )
    SELECT c.digit, c.n,
           c.n / CAST(t.total AS DOUBLE) AS obs_frac,
           round(log10(1 + 1.0 / c.digit), 6) AS benford_frac,
           round(abs(c.n / CAST(t.total AS DOUBLE) - log10(1 + 1.0 / c.digit)), 6)
               AS abs_dev
    FROM counts c CROSS JOIN tot t
    """,
)
def qa_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the value column: observed first-significant-
    digit distribution vs log10(1 + 1/d) — the classic fabricated-data /
    broken-generator detector for financial-looking measures (a synthetic
    or truncated feed deviates hard on digits 1-2).

    Digit extraction is engine-neutral by design: value -> integer cents
    via round(value*100) (the fixture's values carry <=2 decimals, so the
    product sits within 1 ulp of an integer and both engines' HALF_UP round
    agrees), then the first character of the integer's decimal rendering —
    never floor(log10(v)), whose libm rounding at exact powers of ten is
    not portable.  obs_frac stays a raw IEEE division (catalog rule);
    benford_frac and abs_dev round(6) on identical double inputs.

    Scale: one map-side-combined aggregate onto a 9-key digit grid plus a
    single-row total anchor (the broadcast nested-loop the sweep allowlists
    — constant side)."""
    e = table(spark, sf_dir, "events")
    cents = e.filter(F.col("value") > 0).select(
        F.round(F.col("value") * 100).cast("bigint").alias("c")
    )
    digits = cents.filter(F.col("c") > 0).select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("bigint").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("bigint").alias("total"))
    obs = F.col("n") / F.col("total").cast("double")
    benford = F.round(F.log10(1 + 1.0 / F.col("digit")), 6)
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        obs.alias("obs_frac"),
        benford.alias("benford_frac"),
        F.round(F.abs(obs - F.log10(1 + 1.0 / F.col("digit"))), 6).alias("abs_dev"),
    )

@query(
    "qa_equi_depth_histogram",
    oracle="""
    WITH b AS (
        SELECT value,
               CAST(ntile(10) OVER (ORDER BY value, event_id) AS BIGINT) AS bucket
        FROM events WHERE value IS NOT NULL
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM b GROUP BY bucket
    """,
)
def qa_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (equi-height) histogram of the value column — the
    optimizer-statistics / data-profile artifact: 10 buckets of equal row
    count with their value boundaries, the selectivity table a cost model
    or a drift monitor consumes.

    Scale: this runs the grid-partitioned global rank over the RAW fact
    table (not a pre-reduced rollup) — the exact workload class the bare
    ntile window would serialize into one task at corpus scale.  Two
    bounded preparation jobs (value min/max; 32-range counts) + one
    partitioned 32-range sort, then a 10-key grid aggregate.  At 100 TB an
    approx_percentile sketch gives the same table cheaper but engine-
    specific; exact boundaries are the reproducible-calibration choice
    (quality_cutoff_per_lang's argument).

    NULL values are excluded on both sides: a histogram profiles the value
    DISTRIBUTION (qa_schema_profile reports the null rate separately), and
    unfiltered NULLs land in opposite end buckets under Spark's NULLS-FIRST
    vs DuckDB's NULLS-LAST ASC default (NULL-vintage sweep, r08)."""
    from ..operators.rankops import global_ntile

    # localCheckpoint of the 2-column projection spares the rank's two prep
    # jobs a re-scan (r08 review), with GC-scoped cleanup instead of the
    # retired until-clearCache persist (VERDICT r10 #5).  At 100 TB
    # materializing the fact table is the wrong trade either way — there
    # you let the two prep scans re-read the column-pruned parquet (value
    # only) instead; at bench scale the one-shot materialization wins.
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
        .localCheckpoint()
    )
    return (
        global_ntile(e, "value", 10, "event_id", out="bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@query(
    "qa_completeness_by_day",
    oracle="""
    WITH span AS (
        SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
        FROM events
    ), spine AS (
        SELECT CAST(u.d AS DATE) AS day
        FROM span, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS u(d)
    ), daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           COALESCE(d.n, 0) AS n,
           COALESCE(d.n, 0) = 0 AS is_gap
    FROM spine s LEFT JOIN daily d USING (day)
    """,
)
def qa_completeness_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery-completeness audit: every calendar day between the feed's
    first and last event, with its row count and a gap flag — the
    missing-partition detector a daily-ingest pipeline runs before
    training-data cutoff (a silent empty day is invisible to per-day
    GROUP BY, which simply omits the row).

    Scale: the spine is a single-row min/max aggregate exploded to the
    calendar span (bounded by days, not rows); the per-day counts (same
    day-grid size) broadcast against it — one fact-table aggregate
    total."""
    e = table(spark, sf_dir, "events")
    span = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_raw")
    )
    # The hint sits on the RIGHT (build) side: a LeftOuter BroadcastHashJoin
    # can only build right, so a broadcast(spine) on the left would be
    # silently dropped (r08 review).  Both frames are calendar-bounded;
    # broadcasting the per-day counts keeps the spine's outer rows.
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_raw", F.lit(0)).cast("bigint").alias("n"),
            (F.coalesce("n_raw", F.lit(0)) == 0).alias("is_gap"),
        )
    )


@query(
    "ev_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id, value, epoch_us(ts) AS us,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id) AS nxt
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(nxt - us) AS BIGINT) AS covered_us,
           round(sum(value * (nxt - us)) / sum(nxt - us), 4) AS twa_value
    FROM seq WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
)
def ev_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of ``value``: each reading is held
    until the user's next event (step interpolation), so the average weighs
    a level by how LONG it persisted, not how often it was sampled — the
    correct rollup for irregularly-sampled gauges (balance, queue depth,
    session quality), where the plain mean over-counts bursty periods.
    Each user's last event has no holding interval and is excluded
    (single-event users drop out; ``n_intervals``/``covered_us`` make the
    coverage auditable).

    Parity: intervals are exact bigint microsecond differences
    (unix_micros / epoch_us — the moving-window frame-key convention), the
    weighted sum folds doubles identically, and only the final quotient is
    rounded.

    Scale: ONE hash exchange on user_id feeding both the lead window and
    the aggregate; per-task frames are single-user-sized."""
    e = table(spark, sf_dir, "events")  # table() already normalizes event ts
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    seq = e.select(
        "user_id", "value", us.alias("us"), F.lead(us).over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    dt = F.col("nxt") - F.col("us")
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(dt).cast("bigint").alias("covered_us"),
        F.round(F.sum(F.col("value") * dt) / F.sum(dt), 4).alias("twa_value"),
    )


#: k-anonymity threshold: a quasi-identifier group smaller than this is a
#: re-identification risk (the conventional k=5 release floor).
_K_ANON = 5


@query(
    "qa_k_anonymity",
    oracle=f"""
    WITH q AS (
        SELECT event_type,
               CAST(ts AS DATE) AS d,
               CAST(floor(value / 100.0) AS BIGINT) AS vb,
               CAST(count(*) AS BIGINT) AS grp_n
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN grp_n < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small_groups,
           CAST(sum(CASE WHEN grp_n < {_K_ANON} THEN grp_n ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           CAST(min(grp_n) AS BIGINT) AS k_anonymity
    FROM q GROUP BY event_type
    """,
)
def qa_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy release audit: k-anonymity of the quasi-identifier tuple
    (event_type, event date, value bucket) — the check a training-data
    pipeline runs before shipping behavioral logs, because a group of
    fewer than k rows sharing a quasi-identifier combination re-identifies
    its members even after dropping direct IDs.  Per event_type: group
    count, groups below k (``_K_ANON`` = 5), rows inside those groups, and
    the table's k-anonymity (the smallest group).

    Parity: the date truncation and the floor(value/100) bucket are exact
    in both engines (explicit floor — DuckDB's double->int CAST rounds);
    NULL quasi-identifier components form their own groups identically
    under GROUP BY in both.

    Scale: two map-side-combined aggregates — quasi-id grid (bounded by
    types x days x value buckets, not event volume), then a per-type fold
    over that grid.  The fact table never leaves the first aggregate; no
    row-level data is ever shuffled beyond it."""
    e = table(spark, sf_dir, "events")
    grp = (
        e.select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.floor(F.col("value") / 100.0).cast("bigint").alias("vb"),
        )
        .groupBy("event_type", "d", "vb")
        .agg(F.count(F.lit(1)).alias("grp_n"))
    )
    small = F.col("grp_n") < _K_ANON
    return grp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(small.cast("bigint")).alias("n_small_groups"),
        F.sum(F.when(small, F.col("grp_n")).otherwise(0)).alias("rows_at_risk"),
        F.min("grp_n").alias("k_anonymity"),
    )
