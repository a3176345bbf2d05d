"""TPC-H tail shapes (round 2): the classic decision-support patterns
the round-1 set didn't cover — EXISTS semi-joins with correlated
date arithmetic (Q4), nation-pair volume (Q7), market-share ratio
(Q8), outer-join histograms (Q13), conditional-aggregate percentages
(Q14), window-max "view" queries (Q15), correlated-average filters
(Q17), HAVING-threshold joins back to dims (Q18), disjunctive
multi-column predicates (Q19), and scalar-subquery + anti-join (Q22).

The schema has no partsupp table (TESTDATA.md), so shapes needing
ps_supplycost (Q2/Q9/Q11/Q20) are out of scope; the rest are adapted
to the columns that exist (reference parity: the reference engine's
relational surface is eager pandas — src/main.py:29-75 — so these
shapes all exceed it; they exist to prove the Spark plans).

Plan discipline (same as tpch.py): fixed-cardinality dims
(nation/region/part/supplier chains, tiny aggregates) broadcast by
hint; SF-scaling sides (orders/customer) are left to AQE so the plan
degrades to sort-merge instead of OOM at 100x scale; facts scanned
once, predicates pushed, money sums through DECIMAL(18,4)
(FIXTURES.md §C) so hashes match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import davg_sql, dsum, dsum_sql, t


@query(
    "q_tpch_q4ish",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4ish(spark, sf_dir):
    """Q4 shape (order-priority checking): EXISTS over lineitem with a
    correlated date comparison — planned as a LEFT SEMI join on the
    order key with the shipped-late predicate in the join condition,
    so lineitem is never materialized into the output and the count
    per order is never computed (semi-join short-circuits)."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = (li["l_orderkey"] == orders["o_orderkey"]) & (
        li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q_tpch_q7ish",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS ship_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE ns.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND nc.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND ns.n_name <> nc.n_name
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q_tpch_q7ish(spark, sf_dir):
    """Q7 shape (volume shipping): both arms of the snowflake at once —
    supplier→nation and customer→nation — restricted to a nation pair.
    The fixed-cardinality nation side and the supplier chain are
    hint-broadcast; orders and the customer chain scale with SF, so
    their join strategy is AQE's call. The fact passes once; the
    cross-filter (ns <> nc) is evaluated post-join on two tiny
    dimension columns."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    nations = ("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    cust_dim = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp_dim = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_dim, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
    )


@query(
    "q_tpch_q8ish",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS order_year,
           {dsum_sql("CASE WHEN ns.n_name = 'NATION_3' "
                     "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             AS nation_volume,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS total_volume,
           {dsum_sql("CASE WHEN ns.n_name = 'NATION_3' "
                     "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             / {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    GROUP BY order_year
    """,
)
def q_tpch_q8ish(spark, sf_dir):
    """Q8 shape (market share): one nation's share of yearly volume —
    a conditional aggregate ratio. Both the numerator and denominator
    come out of the SAME single fact pass (two conditional sums), not
    two scans; the share is a post-aggregation projection."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp_dim = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("n_name") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp_dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            dsum(nation_vol).alias("nation_volume"),
            dsum(vol).alias("total_volume"),
            (dsum(nation_vol) / dsum(vol)).alias("mkt_share"),
        )
    )


@query(
    "q_tpch_q13ish",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def q_tpch_q13ish(spark, sf_dir):
    """Q13 shape (customer order-count distribution): LEFT OUTER join
    so zero-order customers survive with n_orders = 0 (COUNT of the
    null-extended key is 0), then a second aggregation over the
    counts. Two shuffles by necessity (custkey, then n_orders) — the
    second is over a tiny domain."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@query(
    "q_tpch_q14ish",
    oracle=f"""
    SELECT
      {dsum_sql("CASE WHEN p.p_type = 'PROMO' "
                "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
        AS promo_revenue,
      {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue,
      100.0 * {dsum_sql("CASE WHEN p.p_type = 'PROMO' "
                        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
        / {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def q_tpch_q14ish(spark, sf_dir):
    """Q14 shape (promotion effect): percentage-of-total via two
    conditional sums in one pass; the part dimension broadcasts, the
    date range is a pushed filter on the fact scan."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(vol).alias("total_revenue"),
            (F.lit(100.0) * dsum(promo) / dsum(vol)).alias("promo_pct"),
        )
    )


@query(
    "q_tpch_q15ish",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_tpch_q15ish(spark, sf_dir):
    """Q15 shape (top supplier): the classic "revenue view + max"
    query. The scalar max is a window MAX over the (supplier-
    cardinality, i.e. tiny) aggregated set — no second fact scan, no
    driver round-trip. Exact equality on the max is safe because
    revenue sums go through DECIMAL (FIXTURES.md §C)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    # window over the aggregated (≤ #suppliers rows) set — single tiny
    # partition is intentional and bounded
    mx = F.max("total_rev").over(Window.partitionBy())
    top = rev.withColumn("__mx", mx).filter(F.col("total_rev") == F.col("__mx"))
    supp = t(spark, sf_dir, "supplier")
    return (
        top.join(F.broadcast(supp), top["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q_tpch_q17ish",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey, {davg_sql('l_quantity')} AS avg_qty
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT {dsum_sql('l.l_extendedprice')} AS small_order_revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pa    ON l.l_partkey = pa.l_partkey
    WHERE p.p_type = 'SMALL'
      AND l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def q_tpch_q17ish(spark, sf_dir):
    """Q17 shape (small-quantity-order revenue): the correlated
    per-part average is decorrelated into a groupBy + self-join — the
    per-part aggregate is supplier-cardinality-small and broadcasts
    back onto the fact. The average uses the exact decimal-sum/count
    form on BOTH engines so the 0.5*avg comparison is bit-identical."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
         / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(pa), F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice").alias("small_order_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_tpch_q18ish",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING {dsum_sql('l_quantity')} > 170
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY b.total_qty DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18ish(spark, sf_dir):
    """Q18 shape (large-volume customers): HAVING over a fact
    aggregation, then join the few surviving orders back to the
    dimensions. The heavy part (per-order qty sum) happens FIRST and
    shrinks the data before any join; the top-100 is
    TakeOrderedAndProject."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 170)
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch_q19ish",
    oracle=f"""
    SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_type = 'PROMO' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19ish(spark, sf_dir):
    """Q19 shape (discounted revenue, disjunctive predicates): an OR
    of three brand/size/quantity conjunctions spanning both tables.
    The part-only conjuncts can't individually push down through the
    OR, but Catalyst derives the common superset filter; the join
    stays a broadcast hash join with the residual disjunction as a
    post-join condition — exactly how a 100 TB engine should run it
    (never a cartesian)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q_tpch_q22ish",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {davg_sql('c_acctbal')} AS v FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, COUNT(*) AS n_customers,
           {dsum_sql('c.c_acctbal')} AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def q_tpch_q22ish(spark, sf_dir):
    """Q22 shape (global sales opportunity): scalar subquery (average
    positive balance) + anti-join (customers with no recent orders).
    The scalar is a 1-row broadcast cross join — never a collect; the
    anti-join side carries only the filtered order keys."""
    cust = t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
         / F.count("c_acctbal")).alias("__avg_bal")
    )
    recent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "q_tpch_q21ish",
    oracle=f"""
    WITH os AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             MAX(l_shipdate) AS max_ship
      FROM lineitem
      GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
    FROM lineitem l
    JOIN os ON l.l_orderkey = os.l_orderkey
           AND l.l_shipdate = os.max_ship
           AND os.n_supp > 1
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q_tpch_q21ish(spark, sf_dir):
    """Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS(another supplier) AND NOT-EXISTS(anyone shipped later)
    double correlation, decorrelated into ONE per-order aggregate
    (distinct-supplier count + max shipdate) joined back on the order
    key — the same key the aggregation shuffled on, so the join adds
    no new exchange of the fact. Supplier dim broadcasts; top-20 is
    TakeOrderedAndProject."""
    li = t(spark, sf_dir, "lineitem")
    os_ = li.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.max("l_shipdate").alias("max_ship"),
    )
    supp = t(spark, sf_dir, "supplier")
    return (
        li.join(
            os_,
            (F.col("l_orderkey") == F.col("os_orderkey"))
            & (F.col("l_shipdate") == F.col("max_ship"))
            & (F.col("n_supp") > 1),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q_tpch_q12ish",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12ish(spark, sf_dir):
    """Q12 shape (shipping priority audit; the fixture has no
    l_shipmode, so l_linestatus stands in as the grouping): per-class
    counts of high- vs low-priority order lines — two conditional
    sums in one pass after the orders join (strategy AQE-chosen:
    orders scales with SF), date filter pushed to the
    fact scan. With Q12 this closes the adaptable TPC-H set at 18/22
    (Q2/Q9/Q11/Q20 need the absent partsupp table)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            one_if(high).cast("bigint").alias("high_line_count"),
            one_if(~high).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "q_time_rollup",
    oracle=f"""
    WITH d AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
             CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
             CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
             o_totalprice
      FROM orders
    )
    SELECT order_year, order_quarter, order_month,
           CAST(GROUPING(order_year) AS INT) AS g_y,
           CAST(GROUPING(order_quarter) AS INT) AS g_q,
           CAST(GROUPING(order_month) AS INT) AS g_m,
           {dsum_sql('o_totalprice')} AS revenue,
           COUNT(*) AS n_orders
    FROM d
    GROUP BY ROLLUP (order_year, order_quarter, order_month)
    """,
)
def q_time_rollup(spark, sf_dir):
    """Calendar-hierarchy subtotals: revenue at month, quarter, year,
    and grand-total levels in ONE pass (ROLLUP over derived calendar
    columns — Catalyst expands to grouping sets with partial aggs
    below the single Exchange). GROUPING() flags disambiguate
    subtotal NULLs; the month under a quarter under a year makes this
    the reporting cube every time-partitioned lake serves."""
    orders = t(spark, sf_dir, "orders")
    derived = orders.select(
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_month"),
        "o_totalprice",
    )
    return (
        derived.rollup("order_year", "order_quarter", "order_month")
        .agg(
            F.grouping("order_year").cast("int").alias("g_y"),
            F.grouping("order_quarter").cast("int").alias("g_q"),
            F.grouping("order_month").cast("int").alias("g_m"),
            dsum("o_totalprice").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            "order_year", "order_quarter", "order_month",
            "g_y", "g_q", "g_m", "revenue", "n_orders",
        )
    )
