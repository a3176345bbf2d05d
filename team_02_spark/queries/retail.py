"""Retail / revenue analytics over the TPC-H-shaped tables: RFM
segmentation, market-basket co-occurrence, Pareto concentration.

The reference's analytics stop at sentiment counts; these are the
standard warehouse follow-ons a user would run on the same star
schema. Scale posture: every lane aggregates facts down to a
dimension-sized relation FIRST, then windows/joins on that — the only
fact-table shuffle is the initial keyed groupBy. Market-basket
candidates are generated within an order block, so pairs are bounded
by per-order line counts (same discipline as queries/behavior.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import dsum, dsum_sql, t


@query(
    "q_rfm",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey AS custkey,
               date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                         DATE '1998-12-31') AS recency_days,
               COUNT(*) AS frequency,
               {dsum_sql('o_totalprice')} AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT custkey, recency_days, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS INT)
               AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency, custkey) AS INT)
               AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary, custkey) AS INT)
               AS m_score
    FROM base
    """,
)
def q_rfm(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation:
    one fact shuffle reduces orders to a per-customer row, then three
    global ntile(5) windows score each axis (total order via custkey
    tie-break, so quintile edges are engine-identical). The global
    windows run on the customer dimension, not the fact table — at
    100 TB that's still millions of rows, where a range-partitioned
    rank (q_window_ntile_dist pattern) replaces the single-partition
    sort."""
    orders = t(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.date_diff(
            F.lit("1998-12-31").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    wr = Window.orderBy(F.desc("recency_days"), "custkey")
    wf = Window.orderBy("frequency", "custkey")
    wm = Window.orderBy("monetary", "custkey")
    return base.select(
        "custkey", "recency_days", "frequency", "monetary",
        F.ntile(5).over(wr).cast("int").alias("r_score"),
        F.ntile(5).over(wf).cast("int").alias("f_score"),
        F.ntile(5).over(wm).cast("int").alias("m_score"),
    )


@query(
    "q_market_basket",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    HAVING COUNT(*) >= 2
    """,
)
def q_market_basket(spark, sf_dir):
    """Market-basket co-occurrence (association-rule support counts):
    parts bought together in the same order, support >= 2. The
    self-join blocks on l_orderkey AFTER distinct-ing items, so each
    order contributes C(lines, 2) candidate pairs — bounded by basket
    size, never corpus-quadratic."""
    items = (
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@query(
    "q_pareto",
    oracle="""
    WITH rev AS (
        SELECT o_custkey AS custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS revenue
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT custkey, revenue,
               SUM(revenue) OVER (ORDER BY revenue DESC, custkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS running,
               SUM(revenue) OVER () AS total
        FROM rev
    )
    SELECT custkey,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(running AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
           CAST(running AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8
               AS in_top80
    FROM ranked
    """,
)
def q_pareto(spark, sf_dir):
    """Pareto revenue concentration: customers ranked by revenue, the
    running share of total, and the top-80% flag. The running sum
    stays in DECIMAL all the way (window sums over doubles are
    association-order-dependent and NOT engine-stable; decimal sums
    are exact), converting to double only for the final ratio of two
    exact values. Fact table shuffles once into the per-customer
    aggregate; the ordered window runs on the dimension."""
    orders = t(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("revenue")
    )
    w = (
        Window.orderBy(F.desc("revenue"), "custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy()
    ranked = rev.select(
        "custkey",
        "revenue",
        F.sum("revenue").over(w).alias("running"),
        F.sum("revenue").over(wt).alias("total"),
    )
    share = F.col("running").cast("double") / F.col("total").cast("double")
    return ranked.select(
        "custkey",
        F.col("revenue").cast("double").alias("revenue"),
        share.alias("cum_share"),
        (share <= 0.8).alias("in_top80"),
    )


@query(
    "q_lead_time",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE))) AS BIGINT)
               AS total_days,
           CAST(SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE))) AS DOUBLE)
               / COUNT(*) AS avg_days,
           MAX(date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE))) AS max_days
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_lead_time(spark, sf_dir):
    """Order-to-ship lead time by priority class — the fulfillment
    SLA report. Integer day arithmetic end-to-end (exact sums, one
    double division at exit); orders scales with SF so the join
    strategy is AQE's call (no forced broadcast), then one
    priority-keyed aggregate shuffle."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    days = F.date_diff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(days).cast("long").alias("total_days"),
            (F.sum(days).cast("double") / F.count("*")).alias("avg_days"),
            F.max(days).alias("max_days"),
        )
    )


@query(
    "q_gini",
    oracle="""
    WITH rev AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
               SUM(CAST(o.o_totalprice / 1e6 AS DECIMAL(18,6))) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY segment, custkey
    ),
    ranked AS (
        SELECT segment, revenue,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY revenue, custkey) AS i
        FROM rev
    )
    SELECT segment,
           COUNT(*) AS n_customers,
           (2.0 * CAST(SUM(i * revenue) AS DOUBLE)
            - (COUNT(*) + 1) * CAST(SUM(revenue) AS DOUBLE))
           / (COUNT(*) * CAST(SUM(revenue) AS DOUBLE)) AS gini
    FROM ranked
    GROUP BY segment
    """,
)
def q_gini(spark, sf_dir):
    """Gini coefficient of customer revenue per market segment — the
    integral form of q_pareto's 80/20 concentration (rank-weighted
    formula: G = (2·Σ i·x(i) − (n+1)·Σx) / (n·Σx), ranks ascending).

    Cross-engine exactness: revenue is pre-scaled to millions and
    summed in DECIMAL(18,6), so the rank-weighted sum stays under the
    2^53 scaled-integer bound (FIXTURES.md) through sf1 — the decimal
    → double exit is exact and the final ratio is the same IEEE
    arithmetic on both engines. Ties in revenue are rank-order
    invariant (equal x across adjacent ranks contribute the same
    Σ i·x under any permutation), so the custkey tiebreak is for
    determinism hygiene only. Fact table shuffles once into the
    per-(segment, customer) aggregate; the ranking window and final
    agg run on the dimension-sized relation."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rev = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            F.sum((F.col("o_totalprice") / 1e6).cast("decimal(18,6)")).alias(
                "revenue"
            )
        )
    )
    w = Window.partitionBy("segment").orderBy("revenue", "custkey")
    ranked = rev.select(
        "segment", "revenue", F.row_number().over(w).cast("bigint").alias("i")
    )
    n = F.count("*")
    s = F.sum("revenue").cast("double")
    si = F.sum(F.col("i") * F.col("revenue")).cast("double")
    return ranked.groupBy("segment").agg(
        n.alias("n_customers"),
        ((F.lit(2.0) * si - (n + 1) * s) / (n * s)).alias("gini"),
    )
