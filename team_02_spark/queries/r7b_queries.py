"""Round-7 batch B: graph BFS shortest paths (the recursive-query
shape Spark lacks natively, unrolled as bounded frontier joins),
sweep-line interval union (multi-interval coverage — distinct from
gap-sessionization), MATCH_RECOGNIZE-style whole-journey regex over
per-user event sequences, a bucketed co-located join lane (the
pay-the-shuffle-once storage pattern as a driver-visible correctness
row), largest-remainder apportionment (exact-N proportional slot
allocation), and EXCLUDE-CURRENT-ROW window emulation.

Reference parity note: the reference pipeline (src/main.py) has no
graph/sequence analytics at all — these lanes extend the engine
toward the 100 TB curation surface (SURVEY.md §2.15) under the same
FIXTURES.md §C determinism discipline: integer/decimal exits, total-
order window keys, identical aliases on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import t
from team_02_spark.util import shared_pass


# ------------------------------------------------------------------- graph BFS


@query(
    "q_shortest_path",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'c' || o.o_custkey AS c_node, 's' || l.l_suppkey AS s_node
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT c_node AS src, s_node AS dst FROM pairs
      UNION ALL SELECT s_node, c_node FROM pairs
    ),
    bfs(node, dist) AS (
      SELECT 'c1' AS node, 0 AS dist
      UNION
      SELECT e.dst, b.dist + 1 FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < 4
    )
    SELECT node, CAST(MIN(dist) AS INT) AS dist FROM bfs GROUP BY node
    """,
)
def q_shortest_path(spark, sf_dir):
    """Single-source BFS hop distances over the customer↔supplier
    bipartite graph (graph.py's edge list), bounded at 4 hops — the
    recursive-CTE query shape Spark has no native operator for,
    expressed the scale-correct way: each round is ONE equi-join of
    the current frontier against the edge list plus an anti-join
    that shrinks the frontier to first-time nodes (so work per round
    is proportional to the NEW frontier, not the visited set — the
    textbook distributed BFS). The DuckDB oracle is the identical
    computation as a recursive CTE with UNION (distinct) recursion;
    hop counts are integers, so the iterated state agrees bit-for-bit
    by construction. At 100 TB: the edge list is the only large
    shuffled artifact (shared across rounds via shared_pass), frontier
    frames are node-bounded, and round count is fixed/bounded by
    graph diameter — the same unrolling contract as q_pagerank."""
    from team_02_spark.operators.analytics import bfs_distances
    from team_02_spark.queries.graph import _edges

    edges = _edges(spark, sf_dir).transform(shared_pass)
    return bfs_distances(edges, "c1", max_hops=4)


# ------------------------------------------------------- interval union length


@query(
    "q_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT l_suppkey AS supp, CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE)
               + CAST(1 + CAST(l_quantity AS BIGINT) % 20 AS INTEGER) AS e
      FROM lineitem
    ),
    marked AS (
      SELECT supp, s, e,
             MAX(e) OVER (PARTITION BY supp ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
      FROM iv
    ),
    isl AS (
      SELECT supp, s, e,
             CAST(SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY supp ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
      FROM marked
    ),
    per_isl AS (
      SELECT supp, island, date_diff('day', MIN(s), MAX(e)) AS len_days
      FROM isl GROUP BY supp, island
    )
    SELECT supp, CAST(COUNT(*) AS INT) AS n_islands,
           CAST(SUM(len_days) AS BIGINT) AS covered_days
    FROM per_isl GROUP BY supp
    """,
)
def q_interval_coverage(spark, sf_dir):
    """Sweep-line interval UNION per key: each lineitem contributes a
    shipping-transit interval [shipdate, shipdate + 1..20 days]
    (length derived deterministically from quantity), and the result
    is the number of merged busy islands and total covered days per
    supplier — overlap-aware coverage, NOT gap-sessionization
    (overlapping intervals from different orders must merge even when
    their starts are dense). Classic sweep line: running MAX(end)
    over the start-ordered window marks island breaks, a cumulative
    sum numbers islands, and coverage is max(end)-min(start) per
    island. Tie rows (equal start) can never open an island (their
    predecessor's end >= the shared start), so the (s, e) window
    order is total for the answer. At 100 TB: one shuffle on the
    partition key, two window passes over it, then an island-bounded
    aggregate — no joins, no driver state."""
    from team_02_spark.operators.analytics import interval_union

    li = t(spark, sf_dir, "lineitem")
    s = F.to_date("l_shipdate")
    days = (F.col("l_quantity").cast("bigint") % 20 + 1).cast("int")
    iv = li.select(
        F.col("l_suppkey").alias("supp"),
        s.alias("s"),
        F.date_add(s, days).alias("e"),
    )
    return interval_union(iv, "supp", "s", "e").select(
        "supp", "n_islands", F.col("covered").alias("covered_days")
    )


# ----------------------------------------------------- sequence pattern match


@query(
    "q_match_recognize",
    oracle="""
    WITH j AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS journey
      FROM events GROUP BY user_id
    )
    SELECT user_id, journey, CAST(LENGTH(journey) AS INT) AS n_events,
           regexp_matches(journey, 'v[^e]*p') AS matched,
           regexp_extract(journey, 'v[^e]*p') AS first_span
    FROM j
    """,
)
def q_match_recognize(spark, sf_dir):
    """MATCH_RECOGNIZE-style sequence pattern over per-user journeys
    (the Flink/Trino CEP shape Spark's DataFrame API lacks): encode
    each user's time-ordered event stream as a compact symbol string
    (one char per event, tie-broken by event_id), then run the
    pattern `view (not-error)* purchase` as a regex — `matched` flags
    conversion-without-error journeys and `first_span` extracts the
    leftmost witness. Leftmost-greedy semantics agree between Java
    regex (Spark) and RE2 (DuckDB) for this class of pattern
    (verified against python re on the fixture). The per-key
    sequence-fits-in-memory assumption is MATCH_RECOGNIZE's own
    partition contract; at 100 TB the single shuffle is by user_id
    and the regex runs JVM-side per aggregated row — no UDF, no
    driver state."""
    ev = t(spark, sf_dir, "events")
    item = F.struct(
        F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("ch")
    )
    j = (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(item)), lambda x: x["ch"]
                ),
            ).alias("journey")
        )
    )
    pat = "v[^e]*p"
    return j.select(
        "user_id",
        "journey",
        F.length("journey").cast("int").alias("n_events"),
        F.col("journey").rlike(pat).alias("matched"),
        F.regexp_extract("journey", pat, 0).alias("first_span"),
    )


# --------------------------------------------------------- bucketed SMB join


@query(
    "q_bucketed_join",
    oracle="""
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_bucketed_join(spark, sf_dir):
    """The pay-the-shuffle-ONCE storage pattern as a correctness
    lane: both join sides are persisted as co-bucketed catalog tables
    (16 hash buckets on the join key, paid at write time), then the
    fact⋈dim equi-join runs with ZERO Exchange operators — Catalyst
    recognizes the matching bucket layout (test_scale pins the
    no-shuffle plan property; this lane pins the ANSWER through the
    bucketed write+read path, which exercises the bucket-pruned
    reader). Table names are keyed by applicationId so concurrent
    sessions never collide; overwrite mode keeps re-runs idempotent.
    Stale per-app dirs from PRIOR sessions are reaped by
    ``operators.scale.reap_bucketed_tables`` from session teardown —
    NOT here: a declared query never mutates shared warehouse state
    as a side effect (r7 verdict #8).
    At 100 TB this is THE nightly-join optimization: the expensive
    fact-table exchange happens once per ingest, not once per query."""
    from team_02_spark.operators.scale import co_located_join, write_bucketed

    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    lt, rt = f"b7_orders_{app}", f"b7_cust_{app}"
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    write_bucketed(orders, lt, "custkey", num_buckets=16)
    write_bucketed(cust, rt, "custkey", num_buckets=16)
    joined = co_located_join(spark, lt, rt, "custkey")
    nation = t(spark, sf_dir, "nation")
    return (
        joined.join(
            F.broadcast(nation), joined["c_nationkey"] == nation["n_nationkey"]
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# ------------------------------------------------- largest-remainder allocate


@query(
    "q_allocation",
    oracle="""
    WITH cnt AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w, COUNT(*) AS n
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM cnt),
    shares AS (
      SELECT source, n, (w * 1000) // tw AS base, (w * 1000) % tw AS rem
      FROM cnt, tot
    ),
    ranked AS (
      SELECT source, n, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      FROM shares
    ),
    spent AS (SELECT CAST(SUM(base) AS BIGINT) AS used FROM ranked)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST(base + CASE WHEN rk <= 1000 - used THEN 1 ELSE 0 END AS BIGINT)
             AS slots
    FROM ranked, spent
    """,
)
def q_allocation(spark, sf_dir):
    """Largest-remainder (Hamilton) apportionment: split EXACTLY 1000
    sample slots across document sources proportional to character
    volume — floor shares from integer division, then the leftover
    slots go to the largest fractional remainders (ties broken by
    source name). The exact-N guarantee is what proportional
    samplers (q_token_budget_sample's quota stage, shard planners)
    need and per-group rounding can't give. Pure integer arithmetic
    end to end — no floats to disagree on. At 100 TB: one corpus
    aggregate to the source-cardinality table, then all windowing
    runs on that tiny table (documented single-partition window over
    |sources| rows); the global totals ride broadcast 1-row
    cross joins, the same shape as BM25's corpus stats."""
    docs = t(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("w"), F.count("*").alias("n")
    )
    tot = cnt.agg(F.sum("w").cast("bigint").alias("tw"))
    shares = cnt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr("(w * 1000) div tw").alias("base"),
        ((F.col("w") * 1000) % F.col("tw")).alias("rem"),
    )
    rk = F.row_number().over(Window.orderBy(F.col("rem").desc(), "source"))
    ranked = shares.select("source", "n", "base", rk.alias("rk"))
    spent = ranked.agg(F.sum("base").cast("bigint").alias("used"))
    return ranked.crossJoin(F.broadcast(spent)).select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        (
            F.col("base")
            + F.when(F.col("rk") <= 1000 - F.col("used"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("slots"),
    )


# --------------------------------------------------- EXCLUDE CURRENT ROW frame


@query(
    "q_window_exclude",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                  OVER (PARTITION BY o_custkey)
                - CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS others_total
    FROM orders
    """,
)
def q_window_exclude(spark, sf_dir):
    """EXCLUDE CURRENT ROW window emulation (the SQL:2016 frame
    exclusion clause neither Spark nor most engines ship): each
    order's view of its customer's OTHER spending, computed as the
    full-partition exact-decimal sum minus the row's own value — the
    standard leave-one-out rewrite, one window pass instead of a
    self-join. Leave-one-out aggregates are the shape behind
    cross-validation features and fraud baselines ("how unusual is
    this order vs the account's other activity"). Decimal sum keeps
    the subtraction exact (double summation order would leak into
    the difference)."""
    orders = t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    w = Window.partitionBy("o_custkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(dec).over(w) - dec).cast("double").alias("others_total"),
    )
