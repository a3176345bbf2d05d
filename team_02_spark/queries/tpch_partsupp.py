"""TPC-H Q2/Q9/Q11/Q20 shapes over a deterministically SYNTHESIZED
partsupp (r10 verdict "what's missing" #5: the driver's TESTDATA ships
no partsupp, which blocked these four classic shapes; deriving the
table from the same arithmetic in BOTH engines unlocks them as real
oracled keys).

Derivation contract (reference parity: the TPC-H spec's partsupp
generation model — 4 suppliers per part, spread across the supplier
key space): for each p_partkey p and i in 0..3,

    ps_suppkey          = (p + i*(S DIV 4) + p DIV S) % S
    ps_availqty         = (p*7  + ps_suppkey*11) % 9999 + 1
    ps_supplycost_cents = (p*13 + ps_suppkey*29) % 20000 + 100
    ps_supplycost       = ps_supplycost_cents / 100.0

where S = COUNT(supplier). The constant stride S DIV 4 (instead of
the spec's p-dependent stride) guarantees the four suppkeys are
distinct mod S for ANY S >= 4 — i*(S DIV 4) <= 3S/4 < S — so the
(ps_partkey, ps_suppkey) primary key holds at every fixture SF
without a dedup pass (the spec's stride can hit 0 mod S at the tiny
S=10 of sf0.001). All arithmetic is non-negative BIGINT +/- one exact
int-by-int IEEE division, so Spark and DuckDB produce bit-identical
columns; money math inside the queries goes through the
integer-cents twin or the FIXTURES.md §C DECIMAL(18,4) discipline.

Scale posture: partsupp is a DIMENSION — O(4 x |part|) rows built by
a narrow map over the part scan plus one 1-row broadcast (the
supplier count), zero driver collects, zero shuffles. At 100 TB it
is rebuilt per-query for pennies; a real deployment would write it
once as a bucketed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import dsum_sql, t

# The DuckDB twin of derived_partsupp(), for embedding in oracles.
_PS_CTE = """
    supcnt AS (SELECT COUNT(*) AS s FROM supplier),
    ps_base AS (
        SELECT p.p_partkey AS ps_partkey, sc.s, gs.i
        FROM part p, supcnt sc, (SELECT UNNEST([0, 1, 2, 3]) AS i) gs
    ),
    ps_keys AS (
        SELECT ps_partkey,
               (ps_partkey + i * (s // 4) + ps_partkey // s) % s
                   AS ps_suppkey
        FROM ps_base
    ),
    partsupp AS (
        SELECT ps_partkey, ps_suppkey,
               CAST((ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1
                    AS INT) AS ps_availqty,
               (ps_partkey * 13 + ps_suppkey * 29) % 20000 + 100
                   AS ps_supplycost_cents,
               CAST((ps_partkey * 13 + ps_suppkey * 29) % 20000 + 100
                    AS DOUBLE) / 100.0 AS ps_supplycost
        FROM ps_keys
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _PS_CTE — see module docstring for the
    derivation contract and the distinctness proof of the constant
    stride. One narrow pass over part (pruned to p_partkey), the
    supplier count arriving as a 1-row broadcast (no driver action),
    a 4-way explode, pure integer column arithmetic."""
    part = t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("ps_partkey")
    )
    s_cnt = t(spark, sf_dir, "supplier").agg(
        F.count("*").cast("long").alias("__S")
    )
    keys = (
        part.crossJoin(F.broadcast(s_cnt))
        .select(
            "ps_partkey", "__S",
            F.explode(
                F.array(*[F.lit(i).cast("long") for i in range(4)])
            ).alias("__i"),
        )
        .select(
            "ps_partkey",
            ((F.col("ps_partkey") + F.col("__i") * F.expr("__S DIV 4")
              + F.expr("ps_partkey DIV __S")) % F.col("__S")
             ).alias("ps_suppkey"),
        )
    )
    cents = (F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 29) % 20000 + 100
    return keys.select(
        "ps_partkey", "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 11) % 9999 + 1)
        .cast("int").alias("ps_availqty"),
        cents.alias("ps_supplycost_cents"),
        (cents.cast("double") / 100.0).alias("ps_supplycost"),
    )


@query(
    "q_tpch_q2ish",
    oracle=f"""
    WITH {_PS_CTE},
    eu AS (
        SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
               s.s_name, s.s_acctbal, n.n_name
        FROM partsupp ps
        JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    m AS (
        SELECT ps_partkey, MIN(ps_supplycost) AS mc
        FROM eu GROUP BY ps_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name,
           p.p_partkey, e.ps_supplycost AS min_cost
    FROM eu e
    JOIN m ON e.ps_partkey = m.ps_partkey AND e.ps_supplycost = m.mc
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_type = 'SMALL'
    """,
)
def q_tpch_q2ish(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): region-restricted
    partsupp, per-part MIN over supply cost, keep the suppliers that
    achieve it (ties kept, per spec), re-join part for the type
    filter. The dimension chain (supplier->nation->region) broadcasts
    under AQE; the per-part MIN is a window over ps_partkey — O(4)
    rows per key, no skew by construction. Cost equality is exact:
    both engines build ps_supplycost from the same integer-cents
    division, so the doubles are bit-identical."""
    ps = derived_partsupp(spark, sf_dir)
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    eu = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eu.withColumn("__mc", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("__mc"))
        .join(part, F.col("ps_partkey") == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("ps_supplycost").alias("min_cost"),
        )
    )


@query(
    "q_tpch_q9ish",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)'
                     ' - ps.ps_supplycost * l.l_quantity')} AS sum_profit
    FROM lineitem l
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9ish(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): one lineitem fact scan
    joined to partsupp on the COMPOSITE (partkey, suppkey) key, part
    name filter, profit = revenue - supply cost, grouped by supplier
    nation x order year. partsupp matches only the pairs its 4-per-
    part derivation covers (the fixture's lineitem pairs are uniform,
    so ~4/S of rows survive — same selectivity in both engines by
    construction). Money exits via the DECIMAL(18,4) discipline; the
    per-row product is the identical IEEE double on both sides.
    partsupp/part/supplier are dimensions — AQE broadcasts them;
    orders scales with SF and shuffle-joins, unhinted (round-3
    de-hinting)."""
    ps = derived_partsupp(spark, sf_dir)
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nat = t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        li.join(ps, (li.l_partkey == ps.ps_partkey)
                & (li.l_suppkey == ps.ps_suppkey))
        .join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit.cast("decimal(18,4)")).cast("double")
             .alias("sum_profit"))
    )


@query(
    "q_tpch_q11ish",
    oracle=f"""
    WITH {_PS_CTE},
    in_nat AS (
        SELECT ps.ps_partkey,
               CAST(ps.ps_supplycost_cents AS BIGINT) * ps.ps_availqty
                   AS v_cents
        FROM partsupp ps
        JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    byp AS (
        SELECT ps_partkey, SUM(v_cents) AS pv_cents
        FROM in_nat GROUP BY ps_partkey
    ),
    tot AS (
        SELECT SUM(pv_cents) AS tv_cents, COUNT(*) AS np FROM byp
    )
    SELECT b.ps_partkey,
           CAST(b.pv_cents AS DOUBLE) / 100.0 AS part_value
    FROM byp b, tot
    WHERE b.pv_cents > 2 * (tot.tv_cents // tot.np)
    """,
)
def q_tpch_q11ish(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-part inventory value
    within one supplier region (EUROPE — a single nation can be
    unpopulated at the tiniest fixture SF), kept when it exceeds 2x
    the MEAN part value (the spec's fixed 0.0001/SF fraction is
    SF-relative for the same reason: an absolute fraction starves to
    ~zero rows as the part count grows — measured 1 row at sf0.1).
    The threshold compare runs ENTIRELY in BIGINT cents
    (pv > 2*(tv DIV np), both engines' integer division truncating
    the same way on non-negative values) — no double or decimal
    rounding can flip a boundary row, and nothing can overflow
    (tv DIV np is a mean, pv a per-part sum). The totals arrive as a
    1-row broadcast crossJoin (the sanctioned scalar pattern — no
    driver collect)."""
    ps = derived_partsupp(spark, sf_dir)
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    in_nat = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents").cast("long")
             * F.col("ps_availqty")).alias("v_cents"),
        )
    )
    byp = in_nat.groupBy("ps_partkey").agg(
        F.sum("v_cents").alias("pv_cents")
    )
    tot = byp.agg(
        F.sum("pv_cents").alias("tv_cents"),
        F.count("*").alias("np"),
    )
    return (
        byp.crossJoin(F.broadcast(tot))
        .filter(F.col("pv_cents") > 2 * F.expr("tv_cents DIV np"))
        .select(
            "ps_partkey",
            (F.col("pv_cents").cast("double") / 100.0).alias("part_value"),
        )
    )


@query(
    "q_tpch_q20ish",
    oracle=f"""
    WITH {_PS_CTE},
    shipped AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    ),
    excess AS (
        SELECT DISTINCT ps.ps_suppkey
        FROM partsupp ps
        JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
        JOIN part p ON p.p_partkey = ps.ps_partkey
        WHERE p.p_name LIKE 'red%'
          AND ps.ps_availqty > 0.5 * sh.qty
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN excess e ON s.s_suppkey = e.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    """,
)
def q_tpch_q20ish(spark, sf_dir):
    """TPC-H Q20 shape (excess inventory): per-(part, supplier)
    quantity shipped in 1996 (one date-pruned fact agg, map-side
    combined), partsupp rows whose availqty exceeds half of it, for
    'red'-named parts, distinct suppliers projected back through the
    region filter (ASIA — region keeps the dim-chain shape populated
    at every fixture SF where one nation's suppliers may vanish). Exactness: l_quantity is integer-valued, so the
    double SUM is order-independent (exact up to 2^53) and 0.5*qty is
    an exact IEEE halving — the > compare cannot diverge between
    engines."""
    ps = derived_partsupp(spark, sf_dir)
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    excess = (
        ps.join(shipped, (ps.ps_partkey == shipped.l_partkey)
                & (ps.ps_suppkey == shipped.l_suppkey))
        .join(part, ps.ps_partkey == part.p_partkey)
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supp.join(excess, supp.s_suppkey == F.col("ps_suppkey"))
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name")
    )
