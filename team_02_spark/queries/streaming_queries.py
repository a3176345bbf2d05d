"""Streaming-semantics declared queries (SURVEY.md §2.9), run in batch
mode on `events` so DuckDB can oracle them; the SAME stage functions
run under readStream (tests/test_streaming.py proves batch≡stream).

Timestamps exit as epoch seconds (bigint) — events.ts is ns-precision
parquet and Spark truncates to µs while DuckDB keeps ns; epoch-floor is
the precision-proof exit format (FIXTURES.md §C).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import DEC, t
from team_02_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


@query(
    "q_window_tumbling",
    oracle="""
    SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark, sf_dir):
    """T1: 1-hour tumbling windows per event_type (batch mode of the
    streaming stage fn; window().start == date_trunc('hour') for
    hour-aligned tumbling windows)."""
    ev = t(spark, sf_dir, "events")
    return tumbling_agg(ev, "1 hour").select(
        F.unix_timestamp("window_start").alias("window_start_s"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "q_window_sliding",
    oracle="""
    WITH offs(k) AS (VALUES (0), (1), (2), (3)),
    win AS (
        SELECT CAST(FLOOR(epoch(date_trunc('hour', ts - to_minutes(15 * k))))
                    + 900 * k AS BIGINT) AS window_start_s
        FROM events, offs
    )
    SELECT window_start_s, COUNT(*) AS n_events
    FROM win
    GROUP BY window_start_s
    """,
)
def q_window_sliding(spark, sf_dir):
    """T1: 1-hour windows sliding every 15 min — every event lands in 4
    windows. Oracle reconstructs the window set arithmetically: the
    windows containing ts start at hourfloor(ts - 15k·min) + 15k·min
    for k = 0..3."""
    ev = t(spark, sf_dir, "events")
    return sliding_agg(ev, "1 hour", "15 minutes").select(
        F.unix_timestamp("window_start").alias("window_start_s"),
        "n_events",
    )


@query(
    "q_window_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM marked
    )
    SELECT CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
           user_id,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_window_session(spark, sf_dir):
    """T3: 30-minute-gap session windows per user (batch mode of
    session_window; oracle = classic gaps-and-islands)."""
    ev = t(spark, sf_dir, "events")
    return session_agg(ev, "30 minutes").select(
        F.unix_timestamp("session_start").alias("session_start_s"),
        "user_id",
        "n_events",
    )


@query(
    "q_event_rates",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def q_event_rates(spark, sf_dir):
    """Event-stream profile: per-type volumes, distinct users, exact
    value totals — the monitoring agg every pipeline runs."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        (F.sum(F.col("value").cast(DEC)).cast("double") / F.count("*")).alias("avg_value"),
    )


@query(
    "q_user_stats",
    oracle="""
    WITH gaps AS (
        SELECT user_id, value,
               epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_value,
           ROUND(COALESCE(MAX(gap), 0.0), 2) AS max_gap_s
    FROM gaps
    GROUP BY user_id
    """,
)
def q_user_stats(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState in streaming;
    same fold via applyInPandas here in batch): per-user lifetime
    event count / value total / max inter-event gap. Rounding: value
    is a 2dp quantity so 4dp rounding is tie-free; gaps rounded to
    10ms to absorb the ns-vs-us timestamp precision difference."""
    from team_02_spark.streaming.stateful import running_user_stats

    ev = t(spark, sf_dir, "events")
    stats = running_user_stats(ev)
    return stats.select(
        "user_id",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        F.round("max_gap_s", 2).alias("max_gap_s"),
    )


@query(
    "q_funnel",
    oracle="""
    WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_signup,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_then_click,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                          AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM stages
    """,
)
def q_funnel(spark, sf_dir):
    """Funnel analysis: signup → click → purchase conversion, ordered
    by each user's FIRST occurrence of each stage — one conditional-
    min aggregation per user then one global roll-up (two small
    shuffles; never a self-join per stage)."""
    ev = t(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    # when(..., 1).otherwise(0), not cast('int'): the comparisons are
    # NULL (not false) for users missing a stage, and SUM over an
    # all-NULL operand is NULL where the oracle's CASE ... ELSE 0 is 0.
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return stages.agg(
        F.count("*").alias("n_users"),
        one_if(signed).cast("bigint").alias("n_signup"),
        one_if(clicked).cast("bigint").alias("n_signup_then_click"),
        one_if(purchased).cast("bigint").alias("n_full_funnel"),
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, CAST(date_trunc('week', e.ts) AS DATE) AS act_week
        FROM events e
    )
    SELECT f.cohort_week,
           CAST(date_diff('week', f.cohort_week, a.act_week) AS INT) AS weeks_since,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_week, weeks_since
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-seen week, counted in
    each subsequent activity week — the (cohort × age) retention
    triangle. Week truncation is Monday-start in both engines."""
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7)
            .cast("int").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "q_join_interval",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_s
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def q_join_interval(spark, sf_dir):
    """Batch form of the stream-stream interval join
    (streaming/joins.py): click → purchase attribution within 1 hour
    per user. The equi-key (user_id) drives the shuffle; the time
    bound is a post-join range filter — the same predicate that GC's
    state in the streaming form. Timestamps exit as a lag in whole
    seconds computed from MICROSECOND epochs on both engines (flooring
    each timestamp to seconds first diverges when sub-second parts
    wrap)."""
    ev = t(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000")
            .alias("lag_s"),
        )
    )
