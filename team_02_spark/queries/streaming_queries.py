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
