"""Time-series lane over the events stream-table: OHLC bar resampling,
rolling exact medians, and EWMA smoothing — the shapes a metrics/
feature-engineering pipeline runs constantly.

Engine discipline notes (FIXTURES.md §C):

- Bars exit as *formatted strings* at bar granularity, never raw
  timestamps (container-tz gotcha — .claude/skills/verify).
- Open/close use explicit ROW_NUMBER endpoints with an
  (ts, event_id) tiebreak on BOTH engines — min_by/arg_min tie
  behavior is engine-defined, row_number is not.
- Rolling median is computed from an explicitly sorted frame list
  with the same index arithmetic on both engines (Spark's
  percentile/median interpolation vs DuckDB's quantile_cont is NOT
  guaranteed bit-identical; element_at + (a+b)/2.0 is).
- EWMA is a left fold over the ordered frame (higher-order
  functions: Spark F.aggregate ≡ DuckDB list_reduce, same operand
  order, same doubles).

At scale: everything here is a single window pass per user/bar key —
rolling state never leaves the executor, and the per-key frame is
bounded (5/10 rows), so memory is O(frame), not O(partition).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import t


@query(
    "q_ohlc_bars",
    oracle="""
    WITH r AS (
      SELECT event_type, date_trunc('hour', ts) AS bkt, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, strftime(bkt, '%Y-%m-%d %H:00') AS bar_hour,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events
    FROM r
    GROUP BY event_type, bar_hour
    """,
)
def q_ohlc_bars(spark, sf_dir):
    """Resample the event stream into hourly OHLC bars per event type.
    One window pass tags the bar endpoints (first/last by (ts,
    event_id) — deterministic under ts ties), one aggregation folds
    the bar. The window and the aggregation share the same
    (event_type, hour) key, so Spark reuses a single shuffle."""
    ev = t(spark, sf_dir, "events").withColumn(
        "bkt", F.date_trunc("hour", F.col("ts"))
    )
    w_a = Window.partitionBy("event_type", "bkt").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "bkt").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn_a", F.row_number().over(w_a))
        .withColumn("rn_d", F.row_number().over(w_d))
        .groupBy(
            "event_type",
            F.date_format("bkt", "yyyy-MM-dd HH:00").alias("bar_hour"),
        )
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "q_rolling_median",
    oracle="""
    WITH fr AS (
      SELECT user_id, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS l
      FROM events
    )
    SELECT user_id, event_id,
           CASE WHEN len(l) % 2 = 1
                THEN list_sort(l)[CAST(FLOOR((len(l) + 1) / 2) AS INT)]
                ELSE (list_sort(l)[CAST(FLOOR(len(l) / 2) AS INT)]
                      + list_sort(l)[CAST(FLOOR(len(l) / 2) AS INT) + 1])
                     / CAST(2.0 AS DOUBLE)
           END AS rolling_med
    FROM fr
    """,
)
def q_rolling_median(spark, sf_dir):
    """Exact rolling median of the last 5 events per user. The frame
    is collected (bounded: 5 rows), sorted, and indexed with explicit
    midpoint arithmetic — identical formula on both engines, immune
    to engine-specific quantile interpolation. Per-user state stays
    inside one window pass."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    lst = F.array_sort(F.collect_list("value").over(w))
    n = F.size(lst)
    odd = F.element_at(lst, F.floor((n + 1) / 2).cast("int"))
    even = (
        F.element_at(lst, F.floor(n / 2).cast("int"))
        + F.element_at(lst, F.floor(n / 2).cast("int") + 1)
    ) / F.lit(2.0)
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.when(n % 2 == 1, odd).otherwise(even).alias("rolling_med"),
    )


@query(
    "q_ewma",
    oracle="""
    WITH fr AS (
      SELECT user_id, event_id, value,
             list(struct_pack(ts := ts, event_id := event_id, value := value))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS l
      FROM events
    )
    SELECT user_id, event_id, value,
           list_reduce(
             list_transform(list_sort(l), x -> x.value),
             (acc, x) -> x * CAST(0.3 AS DOUBLE) + acc * CAST(0.7 AS DOUBLE)
           ) AS ewma
    FROM fr
    """,
)
def q_ewma(spark, sf_dir):
    """EWMA (alpha = 0.3) over each user's last 10 events: a left fold
    over the ordered frame, seeded with the frame's first value —
    Spark's F.aggregate and DuckDB's list_reduce run the identical
    operand order, so the iterated double state matches exactly. The
    frame list is sorted via (ts, event_id, value) structs, NOT
    collection order (collect_list order inside a window frame is not
    a contract)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    lst = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value")).over(w)
        ),
        lambda s: s["value"],
    )
    ewma = F.aggregate(
        F.slice(lst, F.lit(2), F.greatest(F.size(lst) - 1, F.lit(0))),
        F.element_at(lst, 1),
        lambda acc, x: x * F.lit(0.3) + acc * F.lit(0.7),
    )
    ev = t(spark, sf_dir, "events")
    return ev.select("user_id", "event_id", "value", ewma.alias("ewma"))


@query(
    "q_trailing_hour",
    oracle="""
    SELECT user_id, event_id,
           COUNT(*) OVER w AS n_trailing_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS sum_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_trailing_hour(spark, sf_dir):
    """Trailing-one-hour per-user activity (count + sum) via a
    TIME-BASED range frame: the frame key is epoch MICROSECONDS as a
    long (`unix_micros` ≡ DuckDB `epoch_us` — integer, so the frame
    boundary comparison is exact; epoch *seconds* would truncate vs
    DuckDB's fractional epoch()). One hashpartitioning(user_id)
    exchange; per-row state is the sliding frame only — this is the
    batch twin of the streaming sliding window (T1)."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
        .alias("sum_trailing_1h"),
    )


@query(
    "q_cumulative_users",
    oracle="""
    WITH fs AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT first_day, COUNT(*) AS new_users FROM fs GROUP BY first_day
    )
    SELECT first_day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY first_day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM daily
    """,
)
def q_cumulative_users(spark, sf_dir):
    """User-acquisition curve via the first-touch pattern: a naive
    cumulative COUNT(DISTINCT user) per day is O(days × users); the
    scalable identity is cum_distinct(day) = running sum of FIRST-SEEN
    counts — one user-keyed aggregate, one tiny per-day aggregate, one
    window over |days| rows. Integer arithmetic throughout."""
    ev = t(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = fs.groupBy("first_day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "first_day", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


@query(
    "q_locf",
    oracle="""
    SELECT user_id, event_id,
           LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled
    FROM events
    """,
)
def q_locf(spark, sf_dir):
    """Last-observation-carried-forward imputation: error events'
    readings are treated as missing and forward-filled from the
    user's most recent healthy reading (NULL until one exists — the
    leading-edge semantics both engines share). IGNORE NULLS +
    running frame is the one-pass distributed form of the classic
    time-series ffill; same single user_id exchange as the other
    rolling lanes."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    healthy = F.when(F.col("event_type") != "error", F.col("value"))
    return ev.select(
        "user_id",
        "event_id",
        F.last(healthy, ignorenulls=True).over(w).alias("filled"),
    )


@query(
    "q_max_open_orders",
    oracle="""
    WITH iv AS (
        SELECT CAST(o.o_orderdate AS DATE) AS lo,
               CAST(MAX(l.l_shipdate) AS DATE) AS hi
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
        SELECT lo AS d, 1 AS x FROM iv
        UNION ALL
        SELECT hi + 1, -1 FROM iv
    ),
    agg AS (SELECT d, CAST(SUM(x) AS BIGINT) AS dd FROM deltas GROUP BY d),
    run AS (
        SELECT d,
               SUM(dd) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS conc
        FROM agg
    )
    SELECT CAST(conc AS BIGINT) AS peak_open_orders,
           CAST(d AS DATE) AS peak_date
    FROM run
    ORDER BY conc DESC, d
    LIMIT 1
    """,
)
def q_max_open_orders(spark, sf_dir):
    """Peak interval concurrency by SWEEP-LINE — the scale-correct
    form of "how many orders were open at once": each order is an
    interval [o_orderdate, last shipdate]; a naive answer self-joins
    intervals on overlap (quadratic in the open set), the sweep-line
    form emits +1/-1 boundary deltas, aggregates them per DATE
    (calendar-bounded, ~2.5k rows regardless of corpus size — the
    fact tables collapse BEFORE any ordering), and takes a running
    sum. The single-partition window is over that calendar-sized
    table only, never the data; at 100 TB the only corpus-scale work
    is the per-order max-shipdate aggregate."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    iv = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").cast("date").alias("hi"))
        .select(F.col("o_orderdate").cast("date").alias("lo"), "hi")
    )
    deltas = iv.select(F.col("lo").alias("d"), F.lit(1).alias("x")).unionAll(
        iv.select(F.date_add("hi", 1).alias("d"), F.lit(-1).alias("x"))
    )
    agg = deltas.groupBy("d").agg(F.sum("x").cast("bigint").alias("dd"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    run = agg.withColumn("conc", F.sum("dd").over(w))
    return run.select(
        F.col("conc").cast("bigint").alias("peak_open_orders"),
        F.col("d").cast("date").alias("peak_date"),
    ).orderBy(F.desc("peak_open_orders"), "peak_date").limit(1)


@query(
    "q_seasonal_index",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders
        GROUP BY 1
    ),
    dow AS (
        SELECT isodow(d) AS iso_dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS avg_rev
        FROM daily
        GROUP BY 1
    ),
    overall AS (
        SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS base FROM daily
    )
    SELECT iso_dow, n_days,
           ROUND(avg_rev, 4) AS avg_rev,
           ROUND(avg_rev / (SELECT base FROM overall), 6) AS seasonal_index
    FROM dow
    """,
)
def q_seasonal_index(spark, sf_dir):
    """Day-of-week seasonality index: average daily revenue per ISO
    weekday divided by the overall daily average — the multiplicative
    seasonal factor behind staffing/capacity curves and the
    denominator for deseasonalized anomaly checks. Two cheap levels:
    the corpus collapses to calendar-days (exact-decimal revenue per
    day), then to 7 weekday rows; the base joins in as a broadcast
    1-row aggregate. ISO weekday (Mon=1) on both engines — Spark's
    default dayofweek is Sun=1 while DuckDB's is Sun=0, the classic
    cross-engine off-by-one this lane deliberately sidesteps via
    weekday()+1 ≡ isodow()."""
    orders = t(spark, sf_dir, "orders")
    dec = "decimal(18,4)"
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.sum(F.col("o_totalprice").cast(dec)).alias("rev"))
    dow = daily.groupBy(
        (F.weekday("d") + 1).cast("bigint").alias("iso_dow")
    ).agg(
        F.count("*").cast("bigint").alias("n_days"),
        (F.sum("rev").cast("double") / F.count("*")).alias("avg_rev"),
    )
    overall = daily.agg(
        (F.sum("rev").cast("double") / F.count("*")).alias("base")
    )
    return dow.crossJoin(F.broadcast(overall)).select(
        "iso_dow", "n_days",
        F.round("avg_rev", 4).alias("avg_rev"),
        F.round(F.col("avg_rev") / F.col("base"), 6).alias("seasonal_index"),
    )


@query(
    "q_mom_growth",
    oracle="""
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders
        GROUP BY 1
    )
    SELECT month, rev_cents,
           LAG(rev_cents) OVER (ORDER BY month) AS prev_cents,
           CAST(CASE WHEN LAG(rev_cents) OVER (ORDER BY month) IS NULL
                     THEN NULL
                     ELSE ((rev_cents - LAG(rev_cents) OVER
                            (ORDER BY month)) * 10000)
                          // LAG(rev_cents) OVER (ORDER BY month)
                END AS BIGINT) AS growth_bp
    FROM m
    """,
)
def q_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth in integer BASIS POINTS — the
    reporting staple, done with the exact-integer discipline end to
    end: revenue as BIGINT cents, growth as (delta*10000) floor-DIV
    prev — no double, no ROUND boundary (FIXTURES.md §C, the
    q_cohort_ltv lesson; Spark `DIV` and DuckDB `//` BOTH truncate
    toward zero on integers — checked explicitly, and the fixture's
    41 negative-growth months exercise the negative branch). The
    corpus collapses to calendar months
    before the single tiny ordering window; the only corpus-scale
    work is one map-side-combined month aggregate."""
    orders = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum(cents).cast("bigint").alias("rev_cents"))
    w = Window.orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return m.select(
        "month", "rev_cents",
        prev.alias("prev_cents"),
        F.when(prev.isNull(), F.lit(None)).otherwise(
            F.expr("(rev_cents - LAG(rev_cents) OVER (ORDER BY month)) "
                   "* 10000 DIV LAG(rev_cents) OVER (ORDER BY month)")
        ).cast("bigint").alias("growth_bp"),
    )
