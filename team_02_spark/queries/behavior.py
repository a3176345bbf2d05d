"""Behavioral / sequence analytics over the events table: Markov
transitions, co-occurrence mining, statistical outlier flagging,
period-over-period growth, and forward-fill gap filling.

These are the event-log operators a training-data pipeline runs to
understand and filter user-interaction corpora (reference scope: the
Twitter event loop, /root/reference/src/main.py:133-160, only ever
counts raw events; these are the Spark-native analytics a user would
reach for next on the same table).

Scale posture: every query here is a single keyed shuffle (window on
user_id, or groupBy on a low-cardinality key) — no self-join is ever
unbounded. Co-occurrence self-joins only within (user, hour) blocks
whose distinct-type cardinality is bounded by the event-type alphabet,
so candidate pairs are O(rows x |alphabet|), never O(rows^2).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import dsum, dsum_sql, t


@query(
    "q_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    counted AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
    FROM counted
    """,
)
def q_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix of event types per user:
    lead() over one (user_id, ts) window — a single shuffle keyed on
    user_id — then a tiny |alphabet|^2 aggregate. The probability is a
    raw IEEE double division of two exact bigints (identical bits in
    any engine, no rounding needed)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counted = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wp = Window.partitionBy("from_type")
    return counted.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("p"),
    )


@query(
    "q_cooccurrence",
    oracle="""
    WITH present AS (
        SELECT DISTINCT user_id, date_trunc('hour', ts) AS h, event_type
        FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_blocks
    FROM present a JOIN present b
      ON a.user_id = b.user_id AND a.h = b.h
     AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    """,
)
def q_cooccurrence(spark, sf_dir):
    """Event-type co-occurrence: which pairs of actions happen in the
    same user-hour. The self-join runs AFTER distinct-ing to
    (user, hour, type), so each block contributes at most
    C(|alphabet|, 2) pairs — bounded candidates, the same blocking
    discipline as the dedup lanes (operators/dedup.py)."""
    ev = t(spark, sf_dir, "events")
    present = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("h"),
        "event_type",
    ).distinct()
    a = present.alias("a")
    b = present.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_blocks"))
    )


@query(
    "q_zscore_outliers",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               {dsum_sql('value')} AS s1,
               {dsum_sql('value * value')} AS s2,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
    ),
    scored AS (
        SELECT e.event_id, e.event_type, e.value,
               (e.value - s.s1 / s.n)
               / NULLIF(sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 0) AS z
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE s.n > 1
    )
    SELECT event_id, event_type, value, z
    FROM scored WHERE abs(z) > 2.0
    """,
)
def q_zscore_outliers(spark, sf_dir):
    """Per-group z-score outlier flagging. The standard deviation is
    computed from exact DECIMAL power sums (sum, sum-of-squares) so it
    is order-independent — stddev_samp() streaming formulas are NOT
    bit-stable across engines/partitionings, but this is (FIXTURES.md
    §C discipline). Stats side is |alphabet| rows → broadcast join
    back; the fact table is scanned twice but shuffled zero times."""
    ev = t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
        F.count("*").alias("n"),
    ).filter(F.col("n") > 1)
    e = ev.alias("e")
    s = F.broadcast(stats.alias("s"))
    mean = F.col("s.s1") / F.col("s.n")
    var = (F.col("s.s2") - F.col("s.s1") * F.col("s.s1") / F.col("s.n")) / (
        F.col("s.n") - 1
    )
    z = (F.col("e.value") - mean) / F.nullif(F.sqrt(var), F.lit(0.0))
    return (
        e.join(s, F.col("e.event_type") == F.col("s.event_type"))
        .select(
            F.col("e.event_id").alias("event_id"),
            F.col("e.event_type").alias("event_type"),
            F.col("e.value").alias("value"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > 2.0)
    )


@query(
    "q_weekly_growth",
    oracle=f"""
    WITH weekly AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
               {dsum_sql('value')} AS revenue
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT week_start, revenue,
           (revenue - LAG(revenue) OVER (ORDER BY week_start))
           / NULLIF(LAG(revenue) OVER (ORDER BY week_start), 0) AS wow_growth
    FROM weekly
    """,
)
def q_weekly_growth(spark, sf_dir):
    """Week-over-week growth: exact decimal weekly sums, then lag()
    over the (tiny) weekly series. Both engines truncate weeks to
    Monday (ISO). The growth ratio is raw double division of two
    decimal-exact sums — bit-identical, no rounding."""
    ev = t(spark, sf_dir, "events")
    weekly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("week", "ts").cast("date").alias("week_start"))
        .agg(dsum("value").alias("revenue"))
    )
    w = Window.orderBy("week_start")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        "week_start",
        "revenue",
        # NULLIF: a zero-revenue week must yield NULL growth, not an
        # ANSI DIVIDE_BY_ZERO (Spark 4 throws even for double/0)
        ((F.col("revenue") - prev) / F.nullif(prev, F.lit(0.0))).alias(
            "wow_growth"
        ),
    )


@query(
    "q_gap_fill",
    oracle=f"""
    WITH spine AS (
        SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                           DATE '2024-01-30',
                                           INTERVAL 1 DAY)) AS DATE) AS day
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               {dsum_sql('value')} AS spend
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    )
    SELECT u.user_id, s.day,
           COALESCE(d.spend, 0.0) AS spend,
           last_value(d.spend IGNORE NULLS)
               OVER (PARTITION BY u.user_id ORDER BY s.day) AS carried_spend
    FROM users u CROSS JOIN spine s
    LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = s.day
    """,
)
def q_gap_fill(spark, sf_dir):
    """Gap-filled daily per-user spend with forward fill: a generated
    calendar spine cross-joined to the user dimension, left-joined to
    actuals, then last(ignorenulls) carries the most recent observed
    value across silent days. The spine is dimension x time (bounded),
    never fact-sized; the only fact shuffle is the daily groupBy."""
    ev = t(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    users = ev.select("user_id").distinct()
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(dsum("value").alias("spend"))
    )
    grid = users.crossJoin(spine)
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("spend", F.lit(0.0)).alias("spend"),
            F.last("spend", ignorenulls=True).over(w).alias("carried_spend"),
        )
    )


@query(
    "q_abtest",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    assigned AS (
        SELECT user_id % 2 AS variant,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS converted
        FROM firsts WHERE rn = 1
    ),
    arms AS (
        SELECT variant, COUNT(*) AS n,
               CAST(SUM(converted) AS BIGINT) AS conv
        FROM assigned GROUP BY variant
    ),
    wide AS (
        SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
               MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
               MAX(CASE WHEN variant = 0 THEN conv END) AS conv_a,
               MAX(CASE WHEN variant = 1 THEN conv END) AS conv_b
        FROM arms
    )
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
           / NULLIF(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                  * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b)), 0), 6) AS z
    FROM wide
    """,
)
def q_abtest(spark, sf_dir):
    """Two-proportion z-test between experiment arms (variant =
    user_id parity; conversion = the user's FIRST event is a purchase,
    a scale-invariant ~1/|alphabet| rate — any-purchase-ever saturates
    to 100% as per-user event counts grow). Everything reduces to
    exact integer counts before any floating point, so the z value is
    bit-identical in any engine (sqrt is IEEE-exact, denominator
    NULLIF-guarded for degenerate pooled rates). One user-keyed
    window, then a 2-row reduction — at 100 TB the only shuffle is
    the (user_id) partitioning."""
    ev = t(spark, sf_dir, "events")
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id")
    assigned = (
        ev.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select(
            (F.col("user_id") % 2).alias("variant"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("converted"),
        )
    )
    arms = assigned.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").cast("bigint").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rate_a - rate_b) / F.nullif(
        F.sqrt(
            pooled * (1 - pooled)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
        F.lit(0.0),
    )
    return wide.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z"),
    )


@query(
    "q_entropy",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type
    ),
    probs AS (
        SELECT user_id,
               CAST(c AS DOUBLE)
               / SUM(c) OVER (PARTITION BY user_id) AS p
        FROM counts
    )
    SELECT user_id,
           CAST(-SUM(CAST(p * ln(p) AS DECIMAL(18,8))) AS DOUBLE)
               AS entropy_nats
    FROM probs
    GROUP BY user_id
    """,
)
def q_entropy(spark, sf_dir):
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity score used to filter bot-like traffic from
    training corpora. Each p*ln(p) term is snapped to DECIMAL(18,8)
    BEFORE summing: ln() is libm (cross-engine last-ulp noise) and
    float sums are order-dependent, but decimal term sums are exact
    and order-free, so the result is reproducible on any partitioning
    (FIXTURES.md §C discipline applied to an entropy reduction)."""
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    wp = Window.partitionBy("user_id")
    probs = counts.select(
        "user_id",
        (F.col("c").cast("double") / F.sum("c").over(wp)).alias("p"),
    )
    term = (F.col("p") * F.log(F.col("p"))).cast("decimal(18,8)")
    return probs.groupBy("user_id").agg(
        (-F.sum(term)).cast("double").alias("entropy_nats")
    )


@query(
    "q_lag_features",
    oracle=f"""
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS BIGINT)
               AS gap_us,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER
                (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS rolling_avg_3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_lag_features(spark, sf_dir):
    """Per-user temporal feature generation for model training: lag
    value, inter-event gap in exact microseconds, 3-row rolling mean
    (decimal-exact sum / count). ONE window spec — a single shuffle
    keyed on user_id serves all three features; microsecond epoch
    arithmetic avoids second-truncation divergence (same discipline
    as q_join_interval)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(-2, Window.currentRow)
    us = lambda c: (F.unix_timestamp(c) * F.lit(1_000_000)
                    + F.date_format(c, "SSSSSS").cast("long"))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        (us(F.col("ts")) - us(F.lag("ts").over(w))).cast("long").alias("gap_us"),
        (
            F.sum(F.col("value").cast("decimal(18,4)")).over(wr).cast("double")
            / F.count("*").over(wr)
        ).alias("rolling_avg_3"),
    )


@query(
    "q_scd2",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN event_type IS DISTINCT FROM
                    LAG(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                    THEN 1 ELSE 0 END AS changed
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, ts,
               SUM(changed) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS version
        FROM marked WHERE changed = 1
    )
    SELECT user_id, event_type,
           CAST(version AS INT) AS version,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS valid_from_s,
           CAST(FLOOR(epoch(LEAD(ts) OVER (PARTITION BY user_id
                                           ORDER BY version))) AS BIGINT)
               AS valid_to_s
    FROM runs
    """,
)
def q_scd2(spark, sf_dir):
    """Slowly-changing-dimension type 2 build from an event log:
    collapse consecutive same-state runs (run-length encoding via the
    gaps-and-islands change marker), then open/close validity
    intervals with lead(). The current state has NULL valid_to. Two
    window passes over the SAME (user_id, ts) ordering — Spark reuses
    the one shuffle (PLANS.md single-shuffle evidence pattern)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            ~F.col("event_type").eqNullSafe(
                F.lag("event_type").over(w)
            ),
            1,
        ).otherwise(0).alias("changed"),
    )
    runs = (
        marked.withColumn("version", F.sum("changed").over(w))
        .filter(F.col("changed") == 1)
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return runs.select(
        "user_id",
        "event_type",
        F.col("version").cast("int").alias("version"),
        F.unix_timestamp("ts").alias("valid_from_s"),
        F.unix_timestamp(F.lead("ts").over(wv)).alias("valid_to_s"),
    )


@query(
    "q_winsorize",
    oracle="""
    WITH ranked AS (
        SELECT event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    bounds AS (
        SELECT event_type,
               MIN(CASE WHEN rn = GREATEST(1, CAST(ceil(0.05 * n) AS BIGINT))
                        THEN value END) AS lo,
               MIN(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                        THEN value END) AS hi
        FROM ranked GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN e.value < b.lo THEN b.lo
                WHEN e.value > b.hi THEN b.hi
                ELSE e.value END AS value_w
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    """,
)
def q_winsorize(spark, sf_dir):
    """Winsorization (outlier clipping to the 5th/95th percentile) per
    group — the standard clean-before-train transform. The percentile
    is an EXACT order statistic (value at rank ceil(q*n), ties broken
    by id), not an interpolated quantile, so both engines select the
    identical row and the clip bounds match bitwise. One window
    shuffle computes ranks; the |alphabet|-row bounds broadcast back
    (same shape as q_zscore_outliers)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_id", "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"),
    )
    lo_rank = F.greatest(F.lit(1), F.ceil(0.05 * F.col("n")))
    hi_rank = F.ceil(0.95 * F.col("n"))
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == lo_rank, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("rn") == hi_rank, F.col("value"))).alias("hi"),
    )
    e = ev.alias("e")
    b = F.broadcast(bounds.alias("b"))
    clipped = (
        F.when(F.col("e.value") < F.col("b.lo"), F.col("b.lo"))
        .when(F.col("e.value") > F.col("b.hi"), F.col("b.hi"))
        .otherwise(F.col("e.value"))
    )
    return e.join(b, F.col("e.event_type") == F.col("b.event_type")).select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        clipped.alias("value_w"),
    )


@query(
    "q_quantile_normalize",
    oracle="""
    SELECT event_id, event_type, value,
           percent_rank() OVER (PARTITION BY event_type
                                ORDER BY value) AS pr
    FROM events
    """,
)
def q_quantile_normalize(spark, sf_dir):
    """Rank-based normalization to [0,1] (percent_rank per group) —
    the distribution-free feature transform. percent_rank is
    (rank-1)/(n-1) over exact integer ranks, so the output double is
    bit-identical across engines; one window shuffle on the group
    key."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id", "event_type", "value",
        F.percent_rank().over(w).alias("pr"),
    )


@query(
    "q_dau",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               COUNT(DISTINCT user_id) AS dau
        FROM events GROUP BY 1
    ),
    tot AS (SELECT COUNT(DISTINCT user_id) AS total FROM events)
    SELECT day, dau, CAST(dau AS DOUBLE) / total AS stickiness
    FROM daily CROSS JOIN tot
    """,
)
def q_dau(spark, sf_dir):
    """Daily active users and stickiness (DAU over the period's total
    actives): two distinct-count aggregates — the per-day one partial-
    aggregates map-side on (day, user), the scalar total broadcasts.
    The ratio is raw double division of exact counts."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    tot = F.broadcast(ev.agg(F.count_distinct("user_id").alias("total")))
    return daily.crossJoin(tot).select(
        "day", "dau",
        (F.col("dau").cast("double") / F.col("total")).alias("stickiness"),
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH ranked AS (
        SELECT event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT event_type,
               MIN(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
                        THEN value END) AS median
        FROM ranked GROUP BY event_type
    ),
    dev_ranked AS (
        SELECT e.event_id, e.event_type, e.value, m.median,
               ROW_NUMBER() OVER (PARTITION BY e.event_type
                                  ORDER BY abs(e.value - m.median),
                                           e.event_id) AS rn,
               COUNT(*) OVER (PARTITION BY e.event_type) AS n
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type,
               MIN(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
                        THEN abs(value - median) END) AS mad
        FROM dev_ranked GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value, m.median, d.mad
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    WHERE abs(e.value - m.median) > 3 * d.mad
    """,
)
def q_mad_outliers(spark, sf_dir):
    """Robust outlier detection by median absolute deviation — the
    heavy-tail-safe sibling of q_zscore_outliers. Both medians are
    EXACT lower-median order statistics (rank (n+1)/2, id tie-break),
    so no interpolation arithmetic can diverge. Two window passes on
    the same event_type key; the per-group medians broadcast back
    over the unshuffled fact table."""
    ev = t(spark, sf_dir, "events")
    wp = Window.partitionBy("event_type")

    def lower_median(df, val_col, out_name):
        w = Window.partitionBy("event_type").orderBy(val_col, "event_id")
        ranked = df.select(
            "event_type",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wp).alias("n"),
            F.col(val_col).alias("__v") if isinstance(val_col, str)
            else val_col.alias("__v"),
        )
        return ranked.groupBy("event_type").agg(
            F.min(
                F.when(
                    F.col("rn") == F.floor((F.col("n") + 1) / 2.0),
                    F.col("__v"),
                )
            ).alias(out_name)
        )

    med = lower_median(ev, "value", "median")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "value", "median",
    )
    mad = lower_median(
        dev, F.abs(F.col("value") - F.col("median")), "mad"
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("median")) > 3 * F.col("mad"))
        .select("event_id", "event_type", "value", "median", "mad")
    )


@query(
    "q_trend",
    oracle=f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               {dsum_sql('value')} AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    sums AS (
        SELECT COUNT(*) AS n,
               SUM(x) AS sx,
               SUM(x * x) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        FROM daily
    )
    SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS intercept
    FROM sums
    """,
)
def q_trend(spark, sf_dir):
    """Least-squares revenue trend (slope/intercept of daily purchase
    revenue over day index): the closed-form normal equations on
    decimal-exact power sums — x is an exact int, y a decimal-exact
    daily sum, and x*y re-snaps to DECIMAL(18,4) so every sum is
    order-independent; the final slope arithmetic is identical IEEE
    division on both engines. One fact shuffle (daily groupBy), then
    a 1-row reduction."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.date_diff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("x")
        )
        .agg(dsum("value").alias("y"))
    )
    sums = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(18,4)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(18,4)"))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return sums.select(slope.alias("slope"), intercept.alias("intercept"))


@query(
    "q_forecast_eval",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               {dsum_sql('value')} AS y
        FROM events GROUP BY event_type, day
    ),
    fc AS (
        SELECT event_type, day, y,
               LAG(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat
        FROM daily
    )
    SELECT event_type,
           COUNT(yhat) AS n_scored,
           CAST(SUM(CAST(abs(y - yhat) / NULLIF(y, 0) AS DECIMAL(18,8)))
                AS DOUBLE)
           / COUNT(yhat) AS mape
    FROM fc WHERE yhat IS NOT NULL
    GROUP BY event_type
    """,
)
def q_forecast_eval(spark, sf_dir):
    """Backtest of the seasonal-naive forecast (predict today = same
    weekday last week) with per-type MAPE. Each absolute-percentage
    error is snapped to DECIMAL(18,8) before averaging so the
    reduction is order-free; y itself is a decimal-exact daily sum.
    One fact shuffle + one dimension-sized window."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(dsum("value").alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    fc = daily.withColumn("yhat", F.lag("y", 7).over(w)).filter(
        F.col("yhat").isNotNull()
    )
    ape = (
        F.abs(F.col("y") - F.col("yhat")) / F.nullif(F.col("y"), F.lit(0.0))
    ).cast("decimal(18,8)")
    return fc.groupBy("event_type").agg(
        F.count("yhat").alias("n_scored"),
        (F.sum(ape).cast("double") / F.count("yhat")).alias("mape"),
    )


@query(
    "q_key_skew",
    oracle="""
    WITH counts AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM counts
    )
    SELECT user_id, n,
           CAST(n AS DOUBLE) / total AS share,
           CAST(n AS DOUBLE) * n_keys / total AS skew_ratio
    FROM counts CROSS JOIN tot
    ORDER BY n DESC, user_id
    LIMIT 10
    """,
)
def q_key_skew(spark, sf_dir):
    """Heavy-hitter diagnostics for shuffle-key skew: the top-10 keys
    by row count with their share of the table and their ratio to the
    mean key size — the measurement that decides when operators/scale
    salting kicks in. Map-side partial agg, scalar totals broadcast,
    TakeOrdered top-k."""
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = F.broadcast(
        counts.agg(F.sum("n").alias("total"), F.count("*").alias("n_keys"))
    )
    return (
        counts.crossJoin(tot)
        .select(
            "user_id", "n",
            (F.col("n").cast("double") / F.col("total")).alias("share"),
            (F.col("n").cast("double") * F.col("n_keys") / F.col("total"))
            .alias("skew_ratio"),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )


@query(
    "q_path_analysis",
    oracle="""
    WITH seq AS (
        SELECT event_type AS t0,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(event_type, 2) OVER w AS t2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t0 || '>' || t1 || '>' || t2 AS path, COUNT(*) AS n
    FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def q_path_analysis(spark, sf_dir):
    """Top-10 three-step behavior paths (clickstream path analysis):
    two lead() offsets over ONE per-user window — a single shuffle —
    then an |alphabet|^3-bounded aggregate and TakeOrdered."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "t0", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "q_multistep_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'signup' THEN ts END)
                   OVER (PARTITION BY user_id) AS s_ts
        FROM events
    ),
    s2 AS (
        SELECT user_id, ts, event_type, s_ts,
               MIN(CASE WHEN event_type = 'click' AND ts >= s_ts
                         AND ts <= s_ts + INTERVAL 7 DAY THEN ts END)
                   OVER (PARTITION BY user_id) AS c_ts
        FROM s1
    ),
    s3 AS (
        SELECT user_id, s_ts, c_ts,
               MIN(CASE WHEN event_type = 'purchase' AND ts >= c_ts
                         AND ts <= c_ts + INTERVAL 7 DAY THEN ts END)
                   OVER (PARTITION BY user_id) AS p_ts
        FROM s2
    ),
    per_user AS (
        SELECT user_id, MAX(s_ts) AS s_ts, MAX(c_ts) AS c_ts,
               MAX(p_ts) AS p_ts
        FROM s3 GROUP BY user_id
    )
    SELECT COUNT(s_ts) AS n_signup,
           COUNT(c_ts) AS n_click_7d,
           COUNT(p_ts) AS n_purchase_7d
    FROM per_user
    """,
)
def q_multistep_funnel(spark, sf_dir):
    """Time-constrained multistep funnel: signup → click within 7
    days → purchase within 7 days of the click. Three chained window
    aggregates ALL partitioned by user_id, so Spark plans ONE shuffle
    and three sorts-free window passes over it (min() needs no
    ordering) — no self-joins, no per-step re-scan. The per-user frame
    then reduces to three stage counts."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    day7 = F.expr("INTERVAL 7 DAY")
    s1 = ev.select(
        "user_id", "ts", "event_type",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
        .alias("s_ts"),
    )
    s2 = s1.withColumn(
        "c_ts",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("s_ts"))
                & (F.col("ts") <= F.col("s_ts") + day7),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "p_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("c_ts"))
                & (F.col("ts") <= F.col("c_ts") + day7),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("s_ts").alias("s_ts"),
        F.max("c_ts").alias("c_ts"),
        F.max("p_ts").alias("p_ts"),
    )
    return per_user.agg(
        F.count("s_ts").alias("n_signup"),
        F.count("c_ts").alias("n_click_7d"),
        F.count("p_ts").alias("n_purchase_7d"),
    )


_WEIGHTED_VALUE_SQL = (
    "value * CASE event_type "
    "WHEN 'purchase' THEN 3.0 WHEN 'click' THEN 1.0 "
    "WHEN 'view' THEN 0.5 WHEN 'signup' THEN 2.0 ELSE 0.0 END"
)


@query(
    "q_engagement_score",
    oracle=f"""
    SELECT user_id,
           {dsum_sql(_WEIGHTED_VALUE_SQL)} AS engagement
    FROM events
    GROUP BY user_id
    """,
)
def q_engagement_score(spark, sf_dir):
    """Weighted engagement scoring with a literal weight map — the
    broadcast-lookup pattern (a tiny dimension embedded as a map
    literal, resolved at plan time; no join at all). Weights multiply
    in double, then the per-user sum goes through DECIMAL(18,4) for
    order-independence. One fact shuffle."""
    ev = t(spark, sf_dir, "events")
    weights = F.create_map(
        F.lit("purchase"), F.lit(3.0),
        F.lit("click"), F.lit(1.0),
        F.lit("view"), F.lit(0.5),
        F.lit("signup"), F.lit(2.0),
    )
    w = F.coalesce(weights.getItem(F.col("event_type")), F.lit(0.0))
    return ev.groupBy("user_id").agg(
        dsum(F.col("value") * w).alias("engagement")
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_event
        FROM events
    ),
    pairs AS (
        SELECT event_type, next_event, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_event IS NOT NULL
        GROUP BY event_type, next_event
    )
    SELECT event_type, next_event, n,
           ROUND(CAST(n AS DOUBLE) /
                 SUM(n) OVER (PARTITION BY event_type), 6) AS p
    FROM pairs
    """,
)
def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    streams: for each (state, next-state) pair, the transition count
    and row-normalized probability — the behavioral fingerprint
    behind next-action prediction and bot detection. One window pass
    partitioned by user (lead over (ts, event_id) — deterministic
    under timestamp ties), then everything collapses to the
    event-alphabet-squared matrix; the normalizing window runs over
    that alphabet-sized table, never the corpus. At 100 TB: one
    shuffle by user_id, one by state pair — both map-side combined."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_event"),
    ).filter(F.col("next_event").isNotNull())
    pairs = seq.groupBy("event_type", "next_event").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wnorm = Window.partitionBy("event_type")
    return pairs.select(
        "event_type", "next_event", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wnorm), 6)
        .alias("p"),
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
               CAST(SUM(CAST(value * value AS DECIMAL(18,4))) AS DOUBLE)
                 AS svv
        FROM events
        GROUP BY user_id
        HAVING COUNT(*) >= 2
    ),
    stats AS (
        SELECT user_id, n, sv / n AS mean,
               (svv - sv * sv / n) / (n - 1) AS var
        FROM s
    )
    SELECT e.event_id, e.user_id, e.value,
           ROUND((e.value - t.mean) / SQRT(t.var), 4) AS z
    FROM events e JOIN stats t ON e.user_id = t.user_id
    WHERE t.var > 0
      AND ABS((e.value - t.mean) / SQRT(t.var)) > 3
    """,
)
def q_anomaly_zscore(spark, sf_dir):
    """Per-user z-score anomaly detection: events whose value sits
    more than 3 sample standard deviations from that user's mean —
    the cheap first-pass outlier gate before any model. One grouped
    pass collects exact-decimal sufficient statistics per user (value
    is 2dp, so value and value² are exact at DECIMAL(18,4) and the
    derived mean/variance are the IDENTICAL doubles in both engines —
    the strict >3 boundary is therefore deterministic, not a float
    coin-flip); the join back is user-keyed, map-side combinable on
    both legs. SQRT is engine-safe (unlike LN/POWER); z rounds to 4dp
    for display."""
    ev = t(spark, sf_dir, "events")
    dec = "decimal(18,4)"
    s = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(F.col("value").cast(dec)).cast("double").alias("sv"),
            F.sum((F.col("value") * F.col("value")).cast(dec))
            .cast("double").alias("svv"),
        )
        .filter(F.col("n") >= 2)
    )
    stats = s.select(
        "user_id",
        (F.col("sv") / F.col("n")).alias("mean"),
        ((F.col("svv") - F.col("sv") * F.col("sv") / F.col("n"))
         / (F.col("n") - 1)).alias("var"),
    )
    z = (F.col("value") - F.col("mean")) / F.sqrt(F.col("var"))
    return (
        ev.join(stats, "user_id")
        .filter((F.col("var") > 0) & (F.abs(z) > 3))
        .select("event_id", "user_id", "value", F.round(z, 4).alias("z"))
    )


@query(
    "q_sessionize",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    lagd AS (
        SELECT user_id, event_id, us,
               CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
        SELECT user_id, us,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND
                              CURRENT ROW) AS sid
        FROM lagd
    )
    SELECT user_id, CAST(sid AS BIGINT) AS session_no,
           CAST(MIN(us) AS BIGINT) AS start_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
    FROM sess
    GROUP BY user_id, sid
    """,
)
def q_sessionize(spark, sf_dir):
    """Batch sessionization by gap islands — the lag/cumsum idiom
    behind every clickstream warehouse (30-minute inactivity gap):
    one window pass marks session breaks, a running sum numbers the
    sessions, one aggregate emits per-session start/size/duration.
    The streaming twin is q_window_session (F.session_window — Spark
    merges state); this is the REPROCESSING form, one shuffle on
    user_id serving both windows and the final group. Deterministic
    under timestamp ties via (ts, event_id) ordering; times exit as
    integer epoch-microseconds (unix_micros ≡ DuckDB epoch_us — the
    FIXTURES.md timestamp discipline)."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lagd = e.withColumn(
        "brk",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = lagd.withColumn(
        "sid",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy(
        "user_id", F.col("sid").cast("bigint").alias("session_no")
    ).agg(
        F.min("us").cast("bigint").alias("start_us"),
        F.count("*").cast("bigint").alias("n_events"),
        (F.max("us") - F.min("us")).cast("bigint").alias("duration_us"),
    )


@query(
    "q_cohort_ltv",
    oracle="""
    WITH first AS (
        SELECT o_custkey,
               CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS m0
        FROM orders GROUP BY o_custkey
    ),
    cohort_size AS (
        SELECT m0, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM first GROUP BY m0
    ),
    rev AS (
        SELECT f.m0,
               date_diff('month', f.m0,
                         CAST(date_trunc('month', o.o_orderdate) AS DATE))
                 AS age_months,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
                 AS active_customers,
               CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT r.m0 AS cohort_month,
           CAST(r.age_months AS BIGINT) AS age_months,
           c.n_customers, r.active_customers, r.rev_cents,
           CAST(SUM(r.rev_cents) OVER (PARTITION BY r.m0 ORDER BY
                r.age_months ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW) // c.n_customers AS BIGINT)
             AS cum_ltv_cents
    FROM rev r JOIN cohort_size c ON r.m0 = c.m0
    """,
)
def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curve: customers grouped by first-order
    month; per (cohort, age-in-months), active customers, revenue, and
    the running LTV per cohort member — the retention economics view
    behind acquisition decisions. INTEGER-CENTS discipline throughout:
    2dp money becomes exact BIGINT cents, the cumulative sum is
    integer, and per-customer LTV is a floor division — no double ever
    enters, so no ROUND boundary can split the engines (the first
    draft's ROUND(cum/size, 4) mismatched at a .5 ulp boundary; see
    FIXTURES.md §C). The corpus collapses to per-cohort-age cells
    (calendar² cardinality) before any window; two shuffles at any
    scale."""
    orders = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("m0")
    )
    cohort_size = first.groupBy("m0").agg(
        F.count("*").cast("bigint").alias("n_customers")
    )
    om = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    rev = (
        orders.join(first, "o_custkey")
        .groupBy(
            "m0",
            (F.months_between(om, F.col("m0"))).cast("bigint")
            .alias("age_months"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("bigint")
            .alias("active_customers"),
            F.sum(cents).cast("bigint").alias("rev_cents"),
        )
    )
    w = Window.partitionBy("m0").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        rev.join(cohort_size, "m0")
        .select(
            F.col("m0").alias("cohort_month"),
            "age_months", "n_customers", "active_customers", "rev_cents",
            F.expr("SUM(rev_cents) OVER (PARTITION BY m0 ORDER BY "
                   "age_months ROWS BETWEEN UNBOUNDED PRECEDING AND "
                   "CURRENT ROW) DIV n_customers")
            .cast("bigint").alias("cum_ltv_cents"),
        )
    )


@query(
    "q_session_conversion",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events
    ),
    lagd AS (
        SELECT user_id, event_id, event_type, us,
               CASE WHEN LAG(us) OVER w IS NULL
                         OR us - LAG(us) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
        SELECT user_id, event_type,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND
                              CURRENT ROW) AS sid
        FROM lagd
    ),
    per_session AS (
        SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted
        FROM sess GROUP BY user_id, sid
    ),
    bucketed AS (
        SELECT CASE WHEN n_events = 1 THEN '1'
                    WHEN n_events <= 3 THEN '2-3'
                    WHEN n_events <= 7 THEN '4-7'
                    ELSE '8+' END AS len_bucket,
               converted
        FROM per_session
    )
    SELECT len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6)
             AS conversion_rate
    FROM bucketed
    GROUP BY len_bucket
    """,
)
def q_session_conversion(spark, sf_dir):
    """Conversion rate by session length — the funnel readout layered
    on gap-island sessionization (q_sessionize's idiom): sessions
    bucket by event count (1 / 2-3 / 4-7 / 8+; single-event sessions
    are the bounce rate), conversion = session contains a purchase.
    Everything after the one user_id window pass runs on session- then
    bucket-cardinality tables; integer counts exit as BIGINT, the rate
    as ROUND(exact-int ratio, 6)."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lagd = e.withColumn(
        "brk",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = lagd.withColumn(
        "sid",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    bucket = (
        F.when(F.col("n_events") == 1, "1")
        .when(F.col("n_events") <= 3, "2-3")
        .when(F.col("n_events") <= 7, "4-7")
        .otherwise("8+")
    )
    return per_session.groupBy(bucket.alias("len_bucket")).agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count("*"), 6
        ).alias("conversion_rate"),
    )


@query(
    "q_stickiness",
    oracle="""
    WITH tagged AS (
        SELECT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week,
               CAST(date_trunc('month', date_trunc('week', ts)) AS DATE)
                 AS month
        FROM events
    ),
    wau AS (
        SELECT week, month,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM tagged GROUP BY week, month
    ),
    mau AS (
        SELECT month, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
        FROM tagged GROUP BY month
    )
    SELECT w.week, w.wau, m.mau,
           CAST(w.wau * 10000 // m.mau AS BIGINT) AS stickiness_bp
    FROM wau w JOIN mau m ON w.month = m.month
    """,
)
def q_stickiness(spark, sf_dir):
    """WAU/MAU stickiness per ISO week (both engines' date_trunc week
    starts Monday) — the engagement ratio product teams track; weeks
    attribute to the month containing their Monday so each week has
    exactly one MAU denominator. Distinct counts are exact integers
    and the ratio exits in integer BASIS POINTS (truncating DIV) —
    the no-double discipline (FIXTURES.md §C). Two distinct-count
    shuffles over calendar-bounded keys; MAU joins back at month
    cardinality."""
    ev = t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    tagged = ev.select(
        "user_id",
        week.alias("week"),
        F.date_trunc("month", week).cast("date").alias("month"),
    )
    wau = tagged.groupBy("week", "month").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    mau = tagged.groupBy("month").agg(
        F.countDistinct("user_id").cast("bigint").alias("mau")
    )
    return wau.join(mau, "month").select(
        "week", "wau", "mau",
        F.expr("wau * 10000 DIV mau").cast("bigint")
        .alias("stickiness_bp"),
    )


@query(
    "q_event_paths",
    oracle="""
    WITH seq AS (
        SELECT event_type AS e1,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def q_event_paths(spark, sf_dir):
    """Top-10 three-step user paths (sequence mining's frequent-path
    staple): two leads over one (user, ts, event_id) window emit each
    consecutive event trigram; counts collapse to the alphabet³ path
    table, and the top-k is a TakeOrdered over that tiny table — at
    100 TB the whole query is one user-key shuffle plus a path-key
    aggregate, both map-side combined. Deterministic tie-break by
    path string."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "q_dwell_time",
    oracle="""
    WITH seq AS (
        SELECT event_type, epoch_us(ts) AS us,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_stays,
           CAST(SUM(nxt - us) AS BIGINT) AS total_dwell_us,
           CAST(SUM(nxt - us) // COUNT(*) AS BIGINT) AS avg_dwell_us
    FROM seq
    WHERE nxt IS NOT NULL
    GROUP BY event_type
    """,
)
def q_dwell_time(spark, sf_dir):
    """Time-in-state per event type: dwell = gap to the user's next
    event (epoch-µs integers end to end — totals and the truncating-
    DIV average never touch a double, the FIXTURES.md §C money/time
    discipline). One user-key window pass, then an alphabet-sized
    aggregate; the per-state dwell profile that feeds engagement and
    abandonment models."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seq = ev.select(
        "event_type",
        us.alias("us"),
        F.lead(us).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    return seq.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_stays"),
        F.sum(F.col("nxt") - F.col("us")).cast("bigint")
        .alias("total_dwell_us"),
        F.expr("SUM(nxt - us) DIV COUNT(*)").cast("bigint")
        .alias("avg_dwell_us"),
    )
