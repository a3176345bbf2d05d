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
