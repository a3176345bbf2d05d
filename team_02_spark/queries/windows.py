"""Window-function queries (SURVEY.md §2.6): ranking, running
aggregates, top-k.

Determinism: every ORDER BY inside a window carries a unique-key
tiebreaker so row_number/frames agree between engines; running sums use
a ROWS frame with fully-determined order so the left-to-right double
accumulation is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import t


@query(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, rnk FROM (
        SELECT c_custkey, c_nationkey, c_acctbal,
               RANK() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer
    ) r WHERE rnk <= 3
    """,
)
def q_window_rank(spark, sf_dir):
    """W1: top-3 customers by balance per nation. One shuffle on the
    partition key; the rnk<=3 filter cuts output before any later op."""
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        cust.select(
            "c_custkey", "c_nationkey", "c_acctbal",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
    FROM orders
    """,
)
def q_window_running(spark, sf_dir):
    """W2: per-customer running spend + previous order (lag). Decimal
    accumulation inside the frame → order-independent of engine
    internals; frame order fully determined by (date, key)."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(frame)
        .cast("double").alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark, sf_dir):
    """W3: global top-k — Spark plans TakeOrderedAndProject (per-
    partition heap + driver merge of k), never a full sort."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_window_ntile_dist",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
           CAST(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE) AS pct_rank,
           CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS cume
    FROM customer
    """,
)
def q_window_ntile_dist(spark, sf_dir):
    """W1/W2 breadth: ntile / percent_rank / cume_dist (single global
    window — fine for dimension-sized inputs; partition it for facts)."""
    cust = t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey", "c_acctbal",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 5000.0 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS nearby_total,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 5000.0 PRECEDING AND CURRENT ROW)
               AS nearby_n
    FROM orders
    """,
)
def q_window_range_frame(spark, sf_dir):
    """W2: VALUE-range frame (rangeBetween) — the frame is defined by
    the ordering value (±5000 of the current price), not row offsets;
    deterministic regardless of ties because membership depends only
    on values."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, Window.currentRow)
    )
    return orders.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)
        .cast("double").alias("nearby_total"),
        F.count("*").over(w).alias("nearby_n"),
    )
