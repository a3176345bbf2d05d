"""API-surface demonstrations: the engine's queries are DataFrame-
built throughout, but the same plans are reachable through the two
other public front doors — `spark.sql()` over registered views, and
Python UDTFs in a LATERAL join (SURVEY §2.8 U10's table-function
slot, here as a real `@udtf`, not an explode emulation).

Both are oracle-checked like every other declared query: the front
door changes, the hash discipline doesn't.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import t


@query(
    "q_sql_frontend",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey,
             CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
             o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey, EXTRACT(year FROM o_orderdate)
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    SELECT o_custkey, order_year,
           o_orderkey AS top_orderkey, o_totalprice AS top_price
    FROM ranked WHERE rn = 1
    """,
)
def q_sql_frontend(spark, sf_dir):
    """The SQL front door: each customer's biggest order per year,
    written as a CTE + window in `spark.sql` over a registered view.
    Catalyst plans it identically to the DataFrame form (same
    hashpartitioning exchange, same rank filter) — the declarative
    surface is interchangeable, which is the whole point of building
    on the SQL engine rather than around it."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        WITH ranked AS (
          SELECT o_custkey,
                 year(o_orderdate) AS order_year,
                 o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey, year(o_orderdate)
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rn
          FROM v_orders
        )
        SELECT o_custkey, order_year,
               o_orderkey AS top_orderkey, o_totalprice AS top_price
        FROM ranked WHERE rn = 1
        """
    )


@query(
    "q_udtf_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    idx AS (
      SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM toks
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS bigram
    FROM idx
    """,
)
def q_udtf_bigrams(spark, sf_dir):
    """A real Python UDTF (Spark 3.5+ table function) in a LATERAL
    join: one input document row fans out to its word bigrams with
    positions. This is the U10 table-function slot exercised through
    the actual `@udtf` machinery — Arrow-batched, executor-side —
    rather than an explode() emulation; the DuckDB twin proves the
    fan-out is exact. Use a UDTF (not explode) when the fan-out logic
    is genuinely imperative — stateful parsers, tokenizers with
    carry-over — which a Column expression can't express."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):
            toks = [w for w in re.split(r"\s+", text or "") if w]
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("bigrams_udtf", Bigrams)
    t(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM v_docs_udtf d, LATERAL bigrams_udtf(d.text) b
        """
    )


# ------------------------------------------------- round-4 additions

@query(
    "q_variant_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER))
                AS INT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER))
                AS INT) AS max_k,
           ROUND(CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER))
                      AS DOUBLE)
                 / COUNT(CAST(json_extract(props, '$.k') AS INTEGER)),
                 6) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def q_variant_props(spark, sf_dir):
    """Semi-structured ingestion through Spark 4's VARIANT type: the
    events.props JSON payload is parsed ONCE into a binary variant
    (`parse_json`) and fields are extracted with typed
    `variant_get` paths — the shredded, re-parse-free way to query
    ragged JSON at scale (vs per-access `get_json_object` string
    re-parsing, which tokenizes the JSON N times for N fields).
    Mirrors the reference's JSON-ish props handling (reference
    src/main.py event payloads) on the modern codepath. At 100 TB the
    parse is map-side and columnar-pruned; only event_type and props
    are read (ReadSchema), and the aggregate shuffles five numeric
    partials per type."""
    ev = t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
            .cast("bigint").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            F.round(
                F.sum("k").cast("double") / F.count("k"), 6
            ).alias("avg_k"),
        )
    )


@query(
    "q_date_spine_fill",
    oracle="""
    WITH RECURSIVE spine(day) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT day + INTERVAL 1 DAY FROM spine
        WHERE day < DATE '1995-03-31'
    ),
    daily AS (
        SELECT o_orderdate AS day, COUNT(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders
        WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
        GROUP BY o_orderdate
    )
    SELECT CAST(s.day AS DATE) AS day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(d.rev, 0) AS DOUBLE) AS revenue
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def q_date_spine_fill(spark, sf_dir):
    """Gap-filled daily order series via a RECURSIVE CTE date spine
    (Spark 4.0's `WITH RECURSIVE`): every calendar day in Q1-1995
    appears exactly once, zero-filled where no orders landed — the
    time-series densification every dashboard needs, in pure SQL on
    both engines. The recursion generates the ~90-row spine on the
    driver side of the plan (bounded by the date range, NOT by data
    size), and the fact aggregation is a normal pruned scan + one
    shuffle; the spine side is broadcast into the left join. At
    100 TB the spine stays 90 rows — recursion depth is a constant of
    the query, so this is scale-safe where a per-row recursion would
    not be."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_spine")
    return spark.sql(
        """
        WITH RECURSIVE spine(day) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT date_add(day, 1) FROM spine
            WHERE day < DATE '1995-03-31'
        ),
        daily AS (
            SELECT o_orderdate AS day, COUNT(*) AS n,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
            FROM v_orders_spine
            WHERE o_orderdate BETWEEN DATE '1995-01-01'
                                  AND DATE '1995-03-31'
            GROUP BY o_orderdate
        )
        SELECT CAST(s.day AS DATE) AS day,
               CAST(COALESCE(d.n, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(d.rev, 0) AS DOUBLE) AS revenue
        FROM spine s LEFT JOIN daily d ON s.day = d.day
        """
    )
