"""TPC-H-flavored analytical queries over the full star schema —
exercises the dimension chain (region→nation→customer/supplier) the
other join queries don't touch, with the canonical plans: dimension
broadcast chains, single fact-scan stages, decimal-exact money sums.

(Q1's pricing summary is q_groupby_agg; Q3's segment revenue is
q_join_multi — these add Q5/Q6/Q10-style shapes.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import dsum, dsum_sql, t


@query(
    "q_tpch_q5ish",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5ish(spark, sf_dir):
    """Q5 shape: revenue per nation within one region — a 5-table
    dimension chain. region filter prunes FIRST (5→1 rows); only the
    fixed-cardinality nation/region sides are hint-broadcast. orders
    and the customer-derived dims frame scale with SF, so their join
    strategy is AQE's call (broadcast at small SF, shuffle at scale
    — a forced hint here would OOM at 100x instead of degrading)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q_tpch_q6ish",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.09
      AND l_quantity < 24
    """,
)
def q_tpch_q6ish(spark, sf_dir):
    """Q6 shape: pure filter + global agg — every predicate pushes to
    the scan; the 'shuffle' is a single-row exchange."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_supplier_volume",
    oracle=f"""
    SELECT s.s_name, n.n_name,
           {dsum_sql('l.l_extendedprice')} AS volume,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY s.s_name, n.n_name
    """,
)
def q_supplier_volume(spark, sf_dir):
    """Supplier-side dimension chain (supplier→nation) — the other arm
    of the snowflake, same broadcast pattern."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    dims = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", "s_name", "n_name"
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("s_name", "n_name")
        .agg(dsum("l_extendedprice").alias("volume"), F.count("*").alias("n_items"))
    )


@query(
    "q_part_stats",
    oracle=f"""
    SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey) AS n_suppliers,
           {dsum_sql('l.l_quantity')} AS total_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 10
    GROUP BY p.p_brand, p.p_type
    """,
)
def q_part_stats(spark, sf_dir):
    """Q16 shape: per-part-class supplier counts — distinct-agg after a
    broadcast dimension join, filter pushed into the dim scan."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            dsum("l_quantity").alias("total_qty"),
        )
    )


@query(
    "q_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS lost_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_returned_revenue(spark, sf_dir):
    """Q10 shape: revenue lost to returns per customer."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("lost_revenue"))
    )


@query(
    "q_tpch_q3ish",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, order_date, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3ish(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): segment-filtered customers
    and date-filtered orders both reach the scan as pushed predicates
    (orders/customer scale with SF — join strategy is AQE's call), and
    the top-10 is TakeOrderedAndProject — one agg shuffle, no global
    sort. Revenue sums via DECIMAL(18,4) (FIXTURES.md §C)."""
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )
