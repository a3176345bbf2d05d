"""Scalar-function breadth queries (SURVEY.md §2.7): string, date,
math, array, map, json. Each query exercises a function family as
Catalyst Column expressions (whole-stage codegen; no UDFs anywhere).

Array/map results are projected to scalars (joined strings, sizes,
extracted elements) so the cross-engine hash compare never depends on
array-type representation differences.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import t


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           UPPER(p_brand) AS brand_upper,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           CONCAT_WS('|', p_brand, p_type) AS brand_type,
           TRIM(p_name) AS name_trim,
           REPLACE(p_name, ' ', '_') AS name_snake,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
           CAST(STRPOS(p_name, 'a') AS INT) AS first_a
    FROM part
    """,
)
def q_string_funcs(spark, sf_dir):
    """F6: string family — lower/upper/length/substring/concat_ws/trim/
    replace/like/instr."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
        F.instr(F.col("p_name"), "a").cast("int").alias("first_a"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month_start,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
               AS days_to_cutoff,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders
    """,
)
def q_date_funcs(spark, sf_dir):
    """F7: date/time family on the ms-precision o_orderdate. Timestamps
    leave the query as DATE / string / int — never raw sub-second
    timestamps — per the precision rule in FIXTURES.md §C."""
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month_start"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int").alias("days_to_cutoff"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE)
               AS net_price,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           SQRT(l_extendedprice) AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 4) AS price_ln,
           (l_tax + 1) * (l_tax + 1) AS tax_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod
    FROM lineitem
    WHERE l_linenumber = 1
    """,
)
def q_math_funcs(spark, sf_dir):
    """F8: math family. Cross-engine FP discipline: money values exit
    through a DECIMAL(18,4) cast, never ROUND(double, n) — Spark rounds
    the shortest decimal repr while DuckDB rounds the binary value, so
    ROUND diverges on .xx5-looking doubles. sqrt is IEEE-correctly-
    rounded (safe); LN is libm (last-ulp differences) so it exits
    rounded to 4dp; POWER may be exp/log-based, so squares are written
    as multiplication."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)").cast("double").alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        ((F.col("l_tax") + 1) * (F.col("l_tax") + 1)).alias("tax_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
    )


@query(
    "q_array_funcs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    )
    SELECT doc_id,
           CAST(LEN(tokens) AS INT) AS n_tokens,
           CAST(LEN(list_distinct(tokens)) AS INT) AS n_distinct,
           CASE WHEN list_contains(tokens, 'spark') THEN 1 ELSE 0 END AS has_spark,
           ARRAY_TO_STRING(list_slice(tokens, 1, 5), ' ') AS first5,
           ARRAY_TO_STRING(list_sort(list_distinct(tokens)), ',') AS vocab,
           tokens[1] AS first_token,
           ARRAY_TO_STRING(list_reverse(tokens), ' ') AS reversed_text
    FROM toks
    """,
)
def q_array_funcs(spark, sf_dir):
    """F9: array family — size/distinct/contains/slice/sort/join/
    element_at/reverse (reference pad/truncate pattern,
    src/main.py:79-81, generalizes to slice+concat). Arrays exit as
    joined strings / scalars only."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("first5"),
        F.array_join(F.sort_array(F.array_distinct(toks)), ",").alias("vocab"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.reverse(toks), " ").alias("reversed_text"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT e.event_id,
           e.event_type AS k_type,
           e.value AS v_value,
           2 AS n_keys
    FROM events e
    WHERE e.event_id % 10 = 0
    """,
)
def q_map_funcs(spark, sf_dir):
    """F10: map family — build a map from columns, extract by key,
    count keys. The oracle states the expected *values* directly (the
    map is an internal representation; DuckDB's MAP type differences
    are irrelevant to the semantics being checked)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    m = F.create_map(
        F.lit("type"), F.col("event_type").cast("string"),
        F.lit("value"), F.col("value").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("k_type"),
        F.element_at(m, "value").cast("double").alias("v_value"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def q_json_extract(spark, sf_dir):
    """F11: JSON extraction from events.props ('{"k": <int>}' —
    FIXTURES.md §A) via get_json_object; no UDF, no full parse."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.when(k > 50, "high").otherwise("low").alias("k_band"),
    )


@query(
    "q_case_when_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_alias,
           CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END AS nation_missing
    FROM customer
    """,
)
def q_case_when_null(spark, sf_dir):
    """Conditional / null-handling family: CASE, COALESCE, NULLIF,
    IS NULL — the expression surface Catalyst constant-folds and
    null-propagates through."""
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high").alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER"))
        .alias("segment_alias"),
        F.when(F.col("c_nationkey").isNull(), 1).otherwise(0).alias("nation_missing"),
    )


@query(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(QUARTER(o_orderdate) AS INT) AS qtr,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(isodow(o_orderdate) - 1 AS INT) AS weekday_mon0,
           CAST(dayofyear(o_orderdate) AS INT) AS doy
    FROM orders
    """,
)
def q_date_arith(spark, sf_dir):
    """F7 breadth: calendar arithmetic — add_months, last_day, quarter,
    Monday-start week truncation, Monday=0 weekday, day-of-year.
    Weekday numbering normalized (Spark weekday() is Mon=0; DuckDB
    isodow is Mon=1)."""
    orders = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("int").alias("qtr"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.weekday(d).cast("int").alias("weekday_mon0"),
        F.dayofyear(d).cast("int").alias("doy"),
    )


@query(
    "q_string_pad",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '.') AS brand_lpad,
           rpad(p_brand, 12, '.') AS brand_rpad,
           repeat('-', CAST(p_size % 5 AS INT)) AS dashes,
           reverse(p_brand) AS brand_rev,
           left(p_name, 8) AS name_left,
           right(p_name, 8) AS name_right,
           split_part(p_type, ' ', 1) AS type_first_word
    FROM part
    """,
)
def q_string_pad(spark, sf_dir):
    """F6 breadth: padding / repetition / reversal / slicing /
    split_part."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lpad("p_brand", 12, ".").alias("brand_lpad"),
        F.rpad("p_brand", 12, ".").alias("brand_rpad"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("dashes"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 1, 8).alias("name_left"),
        F.substring(F.col("p_name"), -8, 8).alias("name_right"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
    )


@query(
    "q_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(l_orderkey | 7 AS BIGINT) AS or7,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS key_xor,
           CAST(l_linenumber << 4 AS BIGINT) AS shl4,
           CAST(l_orderkey >> 2 AS BIGINT) AS shr2
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def q_bitwise(spark, sf_dir):
    """F8 breadth: bitwise and/or/xor/shifts on keys."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        F.col("l_orderkey").bitwiseOR(F.lit(7)).cast("bigint").alias("or7"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).cast("bigint").alias("key_xor"),
        F.shiftleft(F.col("l_linenumber"), 4).cast("bigint").alias("shl4"),
        F.shiftright(F.col("l_orderkey"), 2).cast("bigint").alias("shr2"),
    )


@query(
    "q_try_arith",
    oracle="""
    WITH n AS (
        SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS qty_c
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS total_cents,
               COALESCE(n.n_items, 0) AS n_items,
               COALESCE(n.qty_c, 0) AS qty_c
        FROM orders o LEFT JOIN n ON o.o_orderkey = n.k
    )
    SELECT o_orderkey, n_items,
           CAST(CASE WHEN n_items = 0 THEN NULL
                     ELSE FLOOR(CAST(total_cents AS DOUBLE) / n_items)
                END AS BIGINT) AS price_per_item_cents,
           CAST(CASE WHEN qty_c = 0 THEN NULL
                     ELSE FLOOR(CAST(total_cents AS DOUBLE) * 100
                                / qty_c)
                END AS BIGINT) AS price_per_unit_cents
    FROM j
    """,
)
def q_try_arith(spark, sf_dir):
    """Error-safe arithmetic with Spark's ``try_*`` family: per-order
    price-per-item and price-per-unit where 257 fixture orders have NO
    line items — ``try_divide`` yields NULL instead of the
    DIVIDE_BY_ZERO error that kills a 100 TB job under ANSI mode
    (Spark 4's default); the null-on-zero contract lives in the
    expression, not in upstream filters that can drift. Hash
    discipline: money enters as exact BIGINT cents and the quotient
    exits through FLOOR (engine-exact on the identical IEEE division
    of exact operands) as integer cents — the ROUND(double,4) form of
    this query mismatched on 18 four-decimal .5 boundaries (the
    q_cohort_ltv lesson, FIXTURES.md §C)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("bigint")
    n = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum(cents("l_quantity")).cast("bigint").alias("qty_c"),
    )
    j = orders.join(n, orders["o_orderkey"] == n["k"], "left").select(
        "o_orderkey",
        cents("o_totalprice").alias("total_cents"),
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        F.coalesce("qty_c", F.lit(0)).alias("qty_c"),
    )
    return j.select(
        "o_orderkey", "n_items",
        F.floor(
            F.try_divide(
                F.col("total_cents").cast("double"),
                F.nullif(F.col("n_items"), F.lit(0)),
            )
        ).cast("bigint").alias("price_per_item_cents"),
        F.floor(
            F.try_divide(
                F.col("total_cents").cast("double") * 100,
                F.nullif(F.col("qty_c"), F.lit(0)),
            )
        ).cast("bigint").alias("price_per_unit_cents"),
    )
