"""Round-7 lanes: SQL-surface breadth (QUALIFY-style windows, LATERAL
VIEW OUTER, null-safe joins, multi-distinct, recursive CTE), storage
breadth (ORC round-trip, partition-pruned scan), sampling breadth
(systematic), statistics breadth (exact moments, rolling correlation,
business-day arithmetic, quantile-bucket join), the salted two-stage
aggregation scale pattern, a cogrouped applyInPandas lane, and the
fixed-point KL-divergence drift gate.

Every lane follows the FIXTURES.md §C determinism discipline: decimal
or integer exits, discrete rank-select percentiles, md5 (never engine
hash) for deterministic orders, and identical column aliases on both
engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import dsum_sql, run_dir, t


# ---------------------------------------------------------------- SQL surface


@query(
    "q_qualify_topn",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.c_acctbal,
           CAST(ROW_NUMBER() OVER (PARTITION BY n.n_name
                                   ORDER BY c.c_acctbal DESC,
                                            c.c_custkey) AS INT) AS rnk
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    QUALIFY rnk <= 3
    """,
)
def q_qualify_topn(spark, sf_dir):
    """QUALIFY-style filtered window: top-3 customers per nation by
    account balance, expressed declaratively (window + post-filter —
    the DataFrame form of DuckDB/Snowflake QUALIFY, which the oracle
    uses verbatim). Catalyst folds the filter into the window stage;
    ties break on the key so ranks are total-ordered."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name", "c_custkey", "c_acctbal",
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q_lateral_outer",
    oracle="""
    WITH arr AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '),
                           x -> length(x) >= 8) AS l
        FROM documents
    )
    SELECT doc_id,
           unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS tok
    FROM arr
    """,
)
def q_lateral_outer(spark, sf_dir):
    """LATERAL VIEW OUTER semantics: explode a per-document array of
    rare (>= 8-char) tokens, KEEPING documents whose array is empty as
    a NULL row — `explode_outer`, the DataFrame form of
    `LATERAL VIEW OUTER explode`. The oracle emulates OUTER in DuckDB
    by substituting [NULL] for empty lists before unnest."""
    docs = t(spark, sf_dir, "documents")
    arr = F.filter(
        F.split(F.col("text"), " "), lambda x: F.length(x) >= 8
    )
    return docs.select(
        "doc_id", F.explode_outer(arr).alias("tok")
    )


@query(
    "q_null_safe_join",
    oracle="""
    WITH lhs AS (
        SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
        FROM customer
    ),
    rhs AS (
        SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
               COUNT(*) AS seg_n
        FROM customer GROUP BY NULLIF(c_mktsegment, 'BUILDING')
    )
    SELECT l.c_custkey, l.seg, r.seg_n
    FROM lhs l JOIN rhs r ON l.seg IS NOT DISTINCT FROM r.seg
    """,
)
def q_null_safe_join(spark, sf_dir):
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match NULL keys instead of dropping, the semantics ETL needs when
    a sentinel category is nulled out upstream. Still a hash-
    partitionable equi-join at scale — null-safe equality is a valid
    shuffle key (all NULLs co-locate)."""
    cust = t(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    lhs = cust.select("c_custkey", seg)
    rhs = cust.select(seg).groupBy("seg").agg(F.count("*").alias("seg_n"))
    return (
        lhs.alias("l")
        .join(rhs.alias("r"), F.col("l.seg").eqNullSafe(F.col("r.seg")))
        .select("c_custkey", "l.seg", "seg_n")
    )


@query(
    "q_multi_distinct",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS nd_part,
           COUNT(DISTINCT l_suppkey) AS nd_supp,
           COUNT(DISTINCT l_orderkey) AS nd_order,
           COUNT(*) AS n_rows,
           {dsum_sql('l_extendedprice')} AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_multi_distinct(spark, sf_dir):
    """Several COUNT(DISTINCT) over different columns in ONE aggregate
    — Catalyst plans this with a single Expand (one pass over the
    input fans each row out per distinct-column) instead of N self-
    joins; the plain count/sum ride along in the same job."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("nd_part"),
        F.count_distinct("l_suppkey").alias("nd_supp"),
        F.count_distinct("l_orderkey").alias("nd_order"),
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double").alias("revenue"),
    )


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE spine(mon) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM spine
        WHERE mon < DATE '2001-12-01'
    ),
    rev AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    )
    SELECT s.mon, COALESCE(r.n_orders, 0) AS n_orders,
           COALESCE(r.cents, 0) AS cents
    FROM spine s LEFT JOIN rev r ON s.mon = r.mon
    """,
)
def q_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate the 1995-2001
    month spine recursively, then left-join monthly order revenue so
    gap months surface as explicit zeros. The recursion is the tiny
    (84-row) side — the order aggregate stays a distributed group-by
    and the join broadcasts the spine."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v_r7")
    return spark.sql("""
        WITH RECURSIVE spine(mon) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT CAST(mon + INTERVAL '1' MONTH AS DATE) FROM spine
            WHERE mon < DATE '2001-12-01'
        ),
        rev AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM orders_v_r7 GROUP BY 1
        )
        SELECT s.mon, COALESCE(r.n_orders, 0) AS n_orders,
               COALESCE(r.cents, 0) AS cents
        FROM spine s LEFT JOIN rev r ON s.mon = r.mon
    """)


# ------------------------------------------------------------ storage breadth


@query(
    "q_orc_roundtrip",
    oracle="SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders",
)
def q_orc_roundtrip(spark, sf_dir):
    """S-format breadth: ORC sink -> schema'd ORC scan round-trip —
    the third columnar format next to parquet (native) and the text
    formats (CSV/JSONL/XML lanes). Oracle = the source projection:
    ORC stores doubles/longs natively, so the round trip is exact."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    out = run_dir(spark, "orc_roundtrip")
    orders.write.mode("overwrite").orc(out)
    return (
        spark.read.schema(
            "o_orderkey long, o_orderpriority string, o_totalprice double"
        ).orc(out)
    )


@query(
    "q_partition_pruning",
    oracle="""
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'purchase'
    """,
)
def q_partition_pruning(spark, sf_dir):
    """Hive-style partitioned layout + partition-pruned scan: write
    events partitioned by event_type, read back ONLY the 'purchase'
    directory — the scan's PartitionFilters prune 4/5 of the data
    before any I/O (the layout pattern that makes 100 TB tables
    queryable; tests/test_plans pins the PartitionFilters entry).
    The partition column is dropped on output (it is constant)."""
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    out = run_dir(spark, "part_prune")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    return (
        spark.read.schema(
            "event_id long, user_id long, value double, event_type string"
        )  # explicit schema: robust to an all-pruned (or empty) layout
        .parquet(out)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


# ------------------------------------------------------------ sampling breadth


@query(
    "q_sample_systematic",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                    AS INT) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey, rn FROM ranked WHERE rn % 5 = 1
    """,
)
def q_sample_systematic(spark, sf_dir):
    """Systematic (every-Nth) sampling per stratum: order each
    customer's orders on (date, key) and keep ranks 1, 6, 11, ... —
    the deterministic complement to the Bernoulli / stratified-exact-N
    / weighted A-Res lanes. Partition-local windows: no global sort,
    scales with the stratum count."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey", "o_orderkey",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") % 5 == 1)
    )


# ---------------------------------------------------------- statistics breadth


@query(
    "q_moments",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS s1,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                   AS s2,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) AS s3,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                   AS s4
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND(CAST(s1 AS DOUBLE) / n, 4) AS mean_q,
           ROUND(CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 4)
               AS var_q,
           ROUND((CAST(s3 AS DOUBLE) / n
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * SQRT(CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                             * (CAST(s1 AS DOUBLE) / n))), 4) AS skew_q
    FROM sums
    """,
)
def q_moments(spark, sf_dir):
    """Exact higher moments per group (mean / variance / skewness of
    l_quantity) from raw integer power sums — the column-profiler
    statistic beyond q_column_stats. Quantities are integral, so the
    power sums are exact BIGINTs (one map-side-combining aggregate);
    the moment formulas then run on exact inputs in IEEE doubles —
    identical text, identical results in both engines (sqrt is
    correctly rounded; no libm-divergent calls). Engine skewness()
    builtins disagree on bias correction, which is why the lane
    derives from sums."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    e2 = F.col("s2").cast("double") / n
    e3 = F.col("s3").cast("double") / n
    var = e2 - m1 * m1
    m3c = e3 - 3 * m1 * e2 + 2 * m1 * m1 * m1
    return sums.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(m1, 4).alias("mean_q"),
        F.round(var, 4).alias("var_q"),
        F.round(m3c / (var * F.sqrt(var)), 4).alias("skew_q"),
    )


@query(
    "q_business_days",
    oracle="""
    WITH bd AS (
        SELECT o.o_orderpriority,
               (5 * ((date_diff('day', DATE '1970-01-01',
                                CAST(l.l_shipdate AS DATE)) + 3) // 7)
                + LEAST((date_diff('day', DATE '1970-01-01',
                                   CAST(l.l_shipdate AS DATE)) + 3) % 7, 5))
               - (5 * ((date_diff('day', DATE '1970-01-01',
                                  CAST(o.o_orderdate AS DATE)) + 3) // 7)
                  + LEAST((date_diff('day', DATE '1970-01-01',
                                     CAST(o.o_orderdate AS DATE)) + 3) % 7, 5))
                   AS bdays
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(bdays * 100) AS BIGINT) // COUNT(*) AS avg_bd_e2,
           CAST(MAX(bdays) AS BIGINT) AS max_bd
    FROM bd GROUP BY o_orderpriority
    """,
)
def q_business_days(spark, sf_dir):
    """Business-day (Mon-Fri) lead time between order and ship date —
    pure integer calendar arithmetic, no engine weekday builtins
    (their day-numbering conventions differ): with s = epoch_day + 3
    (so s % 7 == 0 on a Monday), g(d) = 5*(s DIV 7) + LEAST(s%7, 5)
    counts weekdays before d, and the lead is g(ship) - g(order).
    Everything is non-negative integer DIV/% — engine-identical."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")

    # build via SQL expr text once — identical arithmetic both engines
    def g_sql(c):
        s = f"(datediff(to_date({c}), DATE '1970-01-01') + 3)"
        return f"(5 * ({s} DIV 7) + LEAST({s} % 7, 5))"

    joined = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.expr(f"{g_sql('l_shipdate')} - {g_sql('o_orderdate')}")
        .alias("bdays"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.expr("CAST(SUM(bdays * 100) AS BIGINT) DIV COUNT(*)")
        .alias("avg_bd_e2"),
        F.max("bdays").cast("bigint").alias("max_bd"),
    )


# ------------------------------------------------------------- scale patterns


@query(
    "q_twostage_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_twostage_agg(spark, sf_dir):
    """Salted two-stage aggregation — the skew-proof group-by: stage 1
    aggregates on (key, salt) so a hot key spreads over 8 reducers,
    stage 2 merges the 8 partials per key. The result is exactly the
    plain group-by (the oracle), the plan is two small exchanges
    instead of one skewed one. Counts and integer cents merge
    losslessly across stages (any associative agg does)."""
    li = t(spark, sf_dir, "lineitem")
    cents = (
        F.col("l_extendedprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    stage1 = (
        li.select(
            "l_returnflag",
            (F.col("l_orderkey") % 8).alias("__salt"),
            cents.alias("cents"),
        )
        .groupBy("l_returnflag", "__salt")
        .agg(F.count("*").alias("pn"), F.sum("cents").alias("pc"))
    )
    return stage1.groupBy("l_returnflag").agg(
        F.sum("pn").cast("bigint").alias("n_rows"),
        F.sum("pc").cast("bigint").alias("cents"),
    )


@query(
    "q_quantile_bucket_join",
    oracle="""
    WITH by_price AS (
        SELECT o_totalprice AS p, COUNT(*) AS cnt FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT p, SUM(cnt) OVER (ORDER BY p) AS cum,
               SUM(cnt) OVER () AS n
        FROM by_price
    ),
    bounds AS (
        SELECT MIN(CASE WHEN cum >= GREATEST((n + 1) // 4, 1) THEN p END)
                   AS q1,
               MIN(CASE WHEN cum >= GREATEST((n + 1) // 2, 1) THEN p END)
                   AS q2,
               MIN(CASE WHEN cum >= GREATEST(3 * (n + 1) // 4, 1) THEN p END)
                   AS q3
        FROM cum
    )
    SELECT CASE WHEN o_totalprice < b.q1 THEN 'q1'
                WHEN o_totalprice < b.q2 THEN 'q2'
                WHEN o_totalprice < b.q3 THEN 'q3'
                ELSE 'q4' END AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders CROSS JOIN bounds b
    GROUP BY 1
    """,
)
def q_quantile_bucket_join(spark, sf_dir):
    """Percentile-bucket join: exact DISCRETE quartile boundaries of
    order value (rank-select over the DISTINCT-price table, the AUC
    trick — the cumulative window runs over distinct values, not rows,
    so the sort input is value-cardinality-sized), broadcast as a
    1-row frame, then every order CASE-bucketed against them and
    aggregated per bucket. The discrete boundaries are observed
    values, so both engines agree exactly."""
    orders = t(spark, sf_dir, "orders")
    by_price = orders.groupBy(F.col("o_totalprice").alias("p")).agg(
        F.count("*").alias("cnt")
    )
    cum = by_price.select(
        "p",
        F.sum("cnt").over(Window.orderBy("p")).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy()
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    bounds = cum.agg(
        F.min(F.when(F.expr("cum >= GREATEST((n + 1) DIV 4, 1)"),
                     F.col("p"))).alias("q1"),
        F.min(F.when(F.expr("cum >= GREATEST((n + 1) DIV 2, 1)"),
                     F.col("p"))).alias("q2"),
        F.min(F.when(F.expr("cum >= GREATEST(3 * (n + 1) DIV 4, 1)"),
                     F.col("p"))).alias("q3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") < F.col("q1"), "q1")
        .when(F.col("o_totalprice") < F.col("q2"), "q2")
        .when(F.col("o_totalprice") < F.col("q3"), "q3")
        .otherwise("q4")
    )
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), cents.alias("c"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"),
             F.sum("c").cast("bigint").alias("cents"))
    )


@query(
    "q_rolling_corr",
    oracle="""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) // 100 AS x,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
        FROM lineitem GROUP BY 1
    ),
    win AS (
        SELECT day,
               CAST(COUNT(*) OVER w AS BIGINT) AS cnt,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(y) OVER w AS BIGINT) AS sy,
               CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
               CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
               CAST(SUM(y * y) OVER w AS BIGINT) AS syy
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           CASE WHEN (cnt * sxx - sx * sx) = 0 OR (cnt * syy - sy * sy) = 0
                THEN NULL
                ELSE ROUND(CAST(cnt * sxy - sx * sy AS DOUBLE)
                           / (SQRT(CAST(cnt * sxx - sx * sx AS DOUBLE))
                              * SQRT(CAST(cnt * syy - sy * sy AS DOUBLE))), 4)
           END AS corr7
    FROM win WHERE cnt = 7
    """,
)
def q_rolling_corr(spark, sf_dir):
    """7-day rolling Pearson correlation between daily revenue
    (integer dollars) and daily quantity — exact BIGINT window sums of
    x, y, xy, x², y² (the co-moment identity), with the only float ops
    two int->double conversions, two sqrt (correctly rounded), one
    divide — engine-identical. The window runs over the DAILY table
    (calendar-bounded, thousands of rows at any corpus size), not over
    raw lineitems; the daily fold is the only corpus-scale pass."""
    li = t(spark, sf_dir, "lineitem")
    cents = (
        F.col("l_extendedprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    daily = (
        li.groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 "
                "AS BIGINT)) AS BIGINT) DIV 100"
            ).alias("x"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint")
            .alias("y"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    win = daily.select(
        "day",
        F.count("*").over(w).cast("bigint").alias("cnt"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("syy"),
    )
    dx = F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("cnt") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("cnt") * F.col("sxy") - F.col("sx") * F.col("sy")
    corr = F.when((dx == 0) | (dy == 0), F.lit(None)).otherwise(
        F.round(
            num.cast("double")
            / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))), 4
        )
    )
    return win.filter(F.col("cnt") == 7).select("day", corr.alias("corr7"))


@query(
    "q_cogroup_pandas",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                                  AS BIGINT)) AS BIGINT), 0) AS order_cents,
           CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS acctbal_cents
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_acctbal
    """,
)
def q_cogroup_pandas(spark, sf_dir):
    """U-surface breadth: cogrouped applyInPandas — customer and
    orders cogrouped on custkey, one Arrow batch pair per key group,
    the escape hatch for per-entity logic no join/agg expresses
    (sequence alignment, per-entity model scoring). Here the pandas fn
    computes an SQL-checkable aggregate so the oracle can verify the
    cogroup plumbing end-to-end. Exact integer cents via rint (prices
    are 2dp-valued doubles, so rint lands the same integer as the
    engines' decimal cast)."""
    import pandas as pd

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    def fold(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(left):
            key = int(left["c_custkey"].iloc[0])
            bal = int(np.rint(float(left["c_acctbal"].iloc[0]) * 100))
        else:  # order referencing an absent customer: not in fixtures,
            return pd.DataFrame(  # but the seam stays total
                columns=["c_custkey", "n_orders", "order_cents",
                         "acctbal_cents"]
            )
        cents = np.rint(right["o_totalprice"].to_numpy(dtype="float64")
                        * 100).astype("int64")
        return pd.DataFrame({
            "c_custkey": [key],
            "n_orders": [int(len(right))],
            "order_cents": [int(cents.sum())],
            "acctbal_cents": [bal],
        })

    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            fold,
            schema=("c_custkey long, n_orders long, order_cents long, "
                    "acctbal_cents long"),
        )
    )


@query(
    "q_zorder_scan",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_partkey BETWEEN 10 AND 50 AND l_suppkey BETWEEN 2 AND 5
    """,
)
def q_zorder_scan(spark, sf_dir):
    """Z-order (Morton-curve) layout + multi-dimensional range scan:
    lineitem rewritten clustered on interleaved (l_partkey, l_suppkey)
    bits, then a 2-D range predicate reads it back — with the z-curve
    layout, parquet min/max footer stats are tight on BOTH dimensions,
    so either predicate alone prunes row groups (a plain ORDER BY
    layout only skips on its leading key). Oracle = the same predicate
    on the source: the layout job must be a pure reshuffle."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    out = run_dir(spark, "zorder_scan")
    from team_02_spark.operators.scale import zorder_layout

    zorder_layout(li, ["l_partkey", "l_suppkey"], out, n_files=8)
    return (
        spark.read.parquet(out)
        .filter(
            F.col("l_partkey").between(10, 50)
            & F.col("l_suppkey").between(2, 5)
        )
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    )


@query(
    "q_crossmodal_knn",
    # Full ANSI oracle (r8 verdict #4 — the last exactly-computable
    # rows-only key): the fake-codec feature is the 8-bin histogram of
    # the text's UTF-8 bytes (np.histogram over [0,256) => bin =
    # byte // 32 = first_hex_nibble // 2, so DuckDB recomputes it from
    # hex(encode(text)) without per-byte blob access), normalized in
    # double then narrowed to REAL exactly like the Arrow float32
    # feature column; cosine/round/rank replay the q_knn_topk pattern.
    # An empty payload decodes as one zero byte (the fake-codec
    # contract), hence the '00' substitution.
    oracle="""
    WITH hx0 AS (
      SELECT doc_id, hex(encode(COALESCE(text, ''))) AS hx FROM documents
    ),
    hx1 AS (
      SELECT doc_id, CASE WHEN length(hx) = 0 THEN '00' ELSE hx END AS hx
      FROM hx0
    ),
    bins AS (
      SELECT doc_id,
             (strpos('0123456789ABCDEF',
                     substr(hx, CAST(2*u-1 AS BIGINT), 1)) - 1) // 2 AS bin
      FROM (SELECT doc_id, hx, unnest(range(1, length(hx)//2 + 1)) AS u
            FROM hx1)
    ),
    counts AS (
      SELECT doc_id, COUNT(*) AS total,
             [CAST(SUM(CASE WHEN bin=0 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN bin=1 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN bin=2 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN bin=3 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN bin=4 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN bin=5 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN bin=6 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN bin=7 THEN 1 ELSE 0 END) AS BIGINT)] AS h
      FROM bins GROUP BY doc_id
    ),
    feat AS (
      SELECT doc_id,
             list_transform(h, c -> CAST(CAST(c AS DOUBLE) / total AS REAL))
               AS f
      FROM counts
    ),
    scored AS (
      SELECT q.doc_id AS q_id, c.doc_id AS vec_id,
             ROUND(
               list_sum(list_transform(range(1, 9),
                   i -> CAST(q.f[i] AS DOUBLE) * CAST(c.f[i] AS DOUBLE)))
               / (SQRT(list_sum(list_transform(range(1, 9),
                   i -> CAST(q.f[i] AS DOUBLE) * CAST(q.f[i] AS DOUBLE))))
                * SQRT(list_sum(list_transform(range(1, 9),
                   i -> CAST(c.f[i] AS DOUBLE) * CAST(c.f[i] AS DOUBLE)))))
             , 6) AS score
      FROM feat c, (SELECT * FROM feat WHERE doc_id % 499 = 0) q
    )
    SELECT q_id, vec_id, score, rnk AS "rank" FROM (
      SELECT q_id, vec_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY score DESC, vec_id) AS INT)
               AS rnk
      FROM scored
    ) r WHERE rnk <= 3
    """,
)
def q_crossmodal_knn(spark, sf_dir):
    """Cross-modal retrieval: text queries against a media corpus
    through the SHARED deterministic feature space (the fake-codec
    byte-histogram embedder on both sides — the seam where a real
    CLIP-style dual encoder plugs in). Every ~500th document is a
    text-side query; the full corpus is the media side; exact cosine
    top-3 via the broadcast brute-force kernel (recall oracle for the
    IVF path at scale). Self-retrieval property pinned by test: a
    query's own media item scores exactly 1.0 (the coarse fake-codec
    histograms collide across duplicate-shaped texts, so same-score
    ties with lower ids may crowd it out of the top-k — rank-1 is
    still always a 1.0 hit). Since r9 the whole lane is pinned by a
    full DuckDB oracle (decorator above) — the fake-codec features
    and the cosine top-3 are deterministic arithmetic, so even this
    mapInPandas lane is hash-checked, not rows-only."""
    from team_02_spark.operators.multimodal import (
        extract_features, synthesize_media,
    )

    docs = t(spark, sf_dir, "documents")
    media = extract_features(
        synthesize_media(docs, kind="image"), decode_stub="fake"
    ).select(F.col("doc_id").alias("vec_id"),
             F.col("feature").alias("embedding"))
    qdocs = docs.filter(F.col("doc_id") % 499 == 0)
    queries = extract_features(
        synthesize_media(qdocs, kind="text"), decode_stub="fake"
    ).select(F.col("doc_id").alias("q_id"), F.col("feature").alias("q_vec"))
    from team_02_spark.operators.similarity import knn_bruteforce

    return knn_bruteforce(queries, media, k=3, round_decimals=6)


# ----------------------------------------------------- window-tail additions


@query(
    "q_except_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def q_except_all(spark, sf_dir):
    """Multiset EXCEPT ALL (bag difference — each duplicate survives
    count_R - count_A times), the ALL-variant the distinct q_except
    lane doesn't cover. Catalyst plans it as a counted anti-semantics
    aggregate, one shuffle per side."""
    li = t(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.exceptAll(a)


@query(
    "q_intersect_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def q_intersect_all(spark, sf_dir):
    """Multiset INTERSECT ALL (bag intersection — min(count_R,
    count_A) copies per value), completing the set-op family's ALL
    variants."""
    li = t(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersectAll(a)


@query(
    "q_percent_of_total",
    oracle="""
    WITH nat AS (
        SELECT n.n_regionkey, n.n_name,
               CAST(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_regionkey, n.n_name
    )
    SELECT n_name, cents,
           CAST(cents * 10000 //
                GREATEST(CAST(SUM(cents) OVER (PARTITION BY n_regionkey)
                              AS BIGINT), 1) AS BIGINT) AS share_bp
    FROM nat
    """,
)
def q_percent_of_total(spark, sf_dir):
    """Ratio-to-report: each nation's share of its REGION's customer
    balance in integer basis points — aggregate once, then a
    region-partitioned window sum provides the denominator without a
    second pass. GREATEST(...,1) guards the all-zero region (balances
    can be negative; a zero regional fold must not divide by zero)."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    cents = (
        F.col("c_acctbal").cast("decimal(18,2)") * 100
    ).cast("bigint")
    nat = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(cents).cast("bigint").alias("cents"))
    )
    return nat.select(
        "n_name", "cents",
        F.expr(
            "CAST(cents * 10000 DIV GREATEST(CAST(SUM(cents) OVER "
            "(PARTITION BY n_regionkey) AS BIGINT), 1) AS BIGINT)"
        ).alias("share_bp"),
    )


@query(
    "q_yoy_growth",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    )
    SELECT mon, cents,
           CASE WHEN prev IS NULL OR prev = 0 THEN NULL
                ELSE CAST((cents - prev) * 10000 // prev AS BIGINT)
           END AS yoy_bp
    FROM (
        SELECT mon, cents,
               LAG(cents, 12) OVER (ORDER BY mon) AS prev
        FROM monthly
    ) x
    """,
)
def q_yoy_growth(spark, sf_dir):
    """Year-over-year growth in integer basis points: calendar-month
    revenue fold, then LAG 12 over the (calendar-sized) month table.
    Truncating integer division is identical in both engines for
    negative growth too (both DIV and // truncate toward zero); the
    CASE guards missing/zero base months."""
    orders = t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mon")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
        ).cast("bigint").alias("cents")
    )
    w = Window.orderBy("mon")
    return (
        monthly.withColumn("prev", F.lag("cents", 12).over(w))
        .select(
            "mon", "cents",
            F.expr(
                "CASE WHEN prev IS NULL OR prev = 0 THEN NULL "
                "ELSE CAST((cents - prev) * 10000 DIV prev AS BIGINT) END"
            ).alias("yoy_bp"),
        )
    )


@query(
    "q_iqr_outliers",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey,
                                           l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ),
    q AS (
        SELECT l_returnflag,
               MAX(CASE WHEN rn = GREATEST((n + 1) // 4, 1)
                        THEN l_extendedprice END) AS q1,
               MAX(CASE WHEN rn = GREATEST(3 * (n + 1) // 4, 1)
                        THEN l_extendedprice END) AS q3
        FROM ranked GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, q.q1, q.q3,
           COUNT(CASE WHEN l.l_extendedprice < q.q1 - 1.5 * (q.q3 - q.q1)
                        OR l.l_extendedprice > q.q3 + 1.5 * (q.q3 - q.q1)
                      THEN 1 END) AS n_outliers
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag, q.q1, q.q3
    """,
)
def q_iqr_outliers(spark, sf_dir):
    """Tukey-fence outlier audit per group: DISCRETE rank-select
    quartiles (observed values, never interpolated), 1.5×IQR fences in
    IEEE arithmetic on those exact observed doubles, outliers counted
    on a broadcast join-back — the box-plot diagnostic beside the
    z-score and MAD outlier lanes."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag", "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    q = ranked.groupBy("l_returnflag").agg(
        F.max(F.when(F.expr("rn = GREATEST((n + 1) DIV 4, 1)"),
                     F.col("l_extendedprice"))).alias("q1"),
        F.max(F.when(F.expr("rn = GREATEST(3 * (n + 1) DIV 4, 1)"),
                     F.col("l_extendedprice"))).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (
        (F.col("l_extendedprice") < F.col("q1") - 1.5 * iqr)
        | (F.col("l_extendedprice") > F.col("q3") + 1.5 * iqr)
    )
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag", "q1", "q3")
        .agg(F.count(F.when(is_out, 1)).alias("n_outliers"))
        .select("l_returnflag", "q1", "q3", "n_outliers")
    )


@query(
    "q_topk_ties",
    oracle="""
    SELECT o_orderpriority, o_totalprice,
           CAST(RANK() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC) AS INT) AS rnk
    FROM orders
    QUALIFY rnk <= 2
    """,
)
def q_topk_ties(spark, sf_dir):
    """Top-k WITH TIES per group: rank() (gaps allowed, ties share a
    rank) keeps EVERY row tied at the boundary — the deterministic
    with-ties semantics row_number-based top-k lanes cannot express
    (they pick an arbitrary tie unless the order is totalized)."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc()
    )
    return (
        orders.select(
            "o_orderpriority", "o_totalprice",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 2)
    )


@query(
    "q_corr_matrix",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag, COUNT(*) AS n,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100) AS sp,
               SUM(CAST(l_quantity AS BIGINT)) AS sq,
               SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS sd,
               SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) // 100)
                   * (CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT) // 100)) AS spp,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) AS sqq,
               SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
                   * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS sdd,
               SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) // 100)
                   * CAST(l_quantity AS BIGINT)) AS spq,
               SUM((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) // 100)
                   * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS spd,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS sqd
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND((CAST(n AS DOUBLE) * CAST(spq AS DOUBLE)
                  - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                         - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                           - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))), 4)
               AS r_price_qty,
           ROUND((CAST(n AS DOUBLE) * CAST(spd AS DOUBLE)
                  - CAST(sp AS DOUBLE) * CAST(sd AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                         - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                           - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 4)
               AS r_price_disc,
           ROUND((CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE)
                  - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                         - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                           - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 4)
               AS r_qty_disc
    FROM sums
    """,
)
def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix (price / quantity /
    discount) per group from ONE pass of exact integer sufficient
    statistics — price quantized to integer dollars, discount to
    integer percent, so every sum and cross-product is an exact BIGINT
    (bounded to < 2^63 at sf10); the correlation formula then runs on
    exact inputs in IEEE doubles, identical text both engines.
    Engine corr() builtins are float-accumulation-order dependent —
    this lane is not."""
    li = t(spark, sf_dir, "lineitem")
    p = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 100"
    )
    qy = F.col("l_quantity").cast("bigint")
    d = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("bigint")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(p).alias("sp"), F.sum(qy).alias("sq"), F.sum(d).alias("sd"),
        F.sum(p * p).alias("spp"), F.sum(qy * qy).alias("sqq"),
        F.sum(d * d).alias("sdd"),
        F.sum(p * qy).alias("spq"), F.sum(p * d).alias("spd"),
        F.sum(qy * d).alias("sqd"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        n = F.col("n").cast("double")
        num = n * F.col(sxy).cast("double") \
            - F.col(sx).cast("double") * F.col(sy).cast("double")
        dx = n * F.col(sxx).cast("double") \
            - F.col(sx).cast("double") * F.col(sx).cast("double")
        dy = n * F.col(syy).cast("double") \
            - F.col(sy).cast("double") * F.col(sy).cast("double")
        return F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 4)

    return sums.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        corr("spq", "sp", "sq", "spp", "sqq").alias("r_price_qty"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("r_price_disc"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("r_qty_disc"),
    )


@query(
    "q_nth_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           CAST(FIRST_VALUE(o_orderdate) OVER w AS DATE) AS first_dt,
           CAST(LAST_VALUE(o_orderdate) OVER w AS DATE) AS last_dt,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
)
def q_nth_value(spark, sf_dir):
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE over explicit full frames
    — the value-picking window family (ranking and offset families are
    covered by their own lanes). The frame MUST be unbounded-both:
    the default RANGE..CURRENT frame makes LAST_VALUE the current row,
    the classic window gotcha this lane pins. One row per customer via
    DISTINCT (every row in a partition carries identical picks)."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderdate").over(w).cast("date").alias("first_dt"),
        F.last("o_orderdate").over(w).cast("date").alias("last_dt"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    ).distinct()
