"""Completion queries: the remaining relational surface a reference
user would expect — full/right outer joins, union-distinct, global
sort, posexplode (ordinality), regex extraction, sort_within /
distribution ops.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import run_dir, t


@query(
    "q_join_full",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS k, a.n_en, b.n_fr
    FROM (SELECT source AS k, COUNT(*) AS n_en FROM documents
          WHERE lang = 'en' GROUP BY source) a
    FULL OUTER JOIN
         (SELECT source AS k, COUNT(*) AS n_fr FROM documents
          WHERE lang = 'fr' GROUP BY source) b
      ON a.k = b.k
    """,
)
def q_join_full(spark, sf_dir):
    """J2: full outer join — rows surviving from either side with
    nulls opposite."""
    docs = t(spark, sf_dir, "documents")
    a = (
        docs.filter(F.col("lang") == "en")
        .groupBy(F.col("source").alias("k"))
        .agg(F.count("*").alias("n_en"))
    )
    b = (
        docs.filter(F.col("lang") == "fr")
        .groupBy(F.col("source").alias("k"))
        .agg(F.count("*").alias("n_fr"))
    )
    return (
        a.join(b, a.k == b.k, "full_outer")
        .select(F.coalesce(a.k, b.k).alias("k"), "n_en", "n_fr")
    )


@query(
    "q_join_right",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark, sf_dir):
    """J2: right outer join — every customer, order keys nullable."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_name"
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT source FROM documents WHERE lang = 'en'
    UNION
    SELECT source FROM documents WHERE lang = 'fr'
    """,
)
def q_union_distinct(spark, sf_dir):
    """M2 variant: UNION (distinct) vs UNION ALL — union + distinct."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("lang") == "en").select("source")
        .union(docs.filter(F.col("lang") == "fr").select("source"))
        .distinct()
    )


@query(
    "q_sort_global",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    """,
)
def q_sort_global(spark, sf_dir):
    """W3 companion: full global sort (range-partitioned exchange +
    per-partition sort — Spark's distributed ORDER BY). The driver
    hash is order-insensitive, but the sort must still be computed."""
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
    )


@query(
    "q_posexplode",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(u.s['pos'] AS INT) AS pos,
           CAST(u.s['token'] AS VARCHAR) AS token
    FROM toks,
         UNNEST(list_transform(range(1, len(tk) + 1),
                i -> struct_pack(pos := i - 1, token := tk[i]))) AS u(s)
    """,
)
def q_posexplode(spark, sf_dir):
    """F9: positional explode (token with its offset); the oracle
    builds (pos, token) structs and unnests them (DuckDB 1.0 has no
    UNNEST WITH ORDINALITY)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")


@query(
    "q_regex_extract",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CASE WHEN regexp_matches(p_name, '[aeiou]{2}') THEN 1 ELSE 0 END
               AS has_double_vowel,
           CAST(LENGTH(regexp_replace(p_name, '[aeiou]', '', 'g')) AS INT)
               AS n_consonants
    FROM part
    """,
)
def q_regex_extract(spark, sf_dir):
    """F6 regex family: extract group, boolean match, global replace."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.when(F.col("p_name").rlike("[aeiou]{2}"), 1).otherwise(0)
        .alias("has_double_vowel"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).cast("int")
        .alias("n_consonants"),
    )


@query(
    "q_conditional_agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_conditional_agg_pivot(spark, sf_dir):
    """A2: conditional aggregation (manual pivot) — the shape the
    reference's confusion matrix generalizes to."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        *[
            F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0))
            .cast("bigint").alias(f"n_{s.lower()}")
            for s in ("F", "O", "P")
        ]
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """A4 via the SQL front-end: arbitrary GROUPING SETS through
    spark.sql on a registered temp view — the engine's second user API
    (every DataFrame query here could equally be written as SQL)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query(
    "q_json_roundtrip",
    oracle="SELECT event_id, event_type, value FROM events",
)
def q_json_roundtrip(spark, sf_dir):
    """S-format breadth: JSON-lines sink -> schema'd JSON scan
    round-trip (the landing-file format for the REST/stream sources).
    Oracle = the source projection: doubles survive the text round
    trip exactly (shortest-repr printing is lossless)."""
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = run_dir(spark, "json_roundtrip")
    ev.write.mode("overwrite").json(out)
    return (
        spark.read.schema("event_id long, event_type string, value double")
        .json(out)
    )


@query(
    "q_xml_roundtrip",
    oracle="SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
)
def q_xml_roundtrip(spark, sf_dir):
    """S-format breadth: Spark 4 built-in XML sink -> schema'd XML
    scan round-trip (rowTag records), the partner-feed format next to
    the JSONL lane above. Oracle = the source projection: doubles
    survive the text round trip exactly (shortest-repr printing), and
    the schema'd read keeps the types engine-stable."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = run_dir(spark, "xml_roundtrip")
    orders.write.mode("overwrite").format("xml").option(
        "rowTag", "order"
    ).save(out)
    return (
        spark.read.schema(
            "o_orderkey long, o_orderstatus string, o_totalprice double"
        )
        .format("xml")
        .option("rowTag", "order")
        .load(out)
    )


@query(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join(spark, sf_dir):
    """J breadth: explicit cross join (tiny × small only — the engine
    never cross-joins two large relations; LSH buckets replace that)."""
    region = t(spark, sf_dir, "region").select("r_name")
    nation = t(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


@query(
    "q_summary_stats",
    oracle="""
    SELECT 'l_quantity' AS col,
           COUNT(l_quantity) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS mean,
           ROUND(SQRT(GREATEST(
               (CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DOUBLE)
                - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity))
               / (COUNT(l_quantity) - 1), 0.0)), 6) AS std,
           MIN(l_quantity) AS min_v,
           MAX(l_quantity) AS max_v
    FROM lineitem
    """,
)
def q_summary_stats(spark, sf_dir):
    """describe()-style summary profile, made cross-engine-exact: the
    sample stddev is computed from decimal-exact sum and sum-of-squares
    (the builtin STDDEV streams doubles in partition order — not
    reproducible across engines), rounded to 6dp."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    n = F.count(q)
    s1 = F.sum(q.cast("decimal(18,4)")).cast("double")
    s2 = F.sum((q * q).cast("decimal(28,8)")).cast("double")
    var = F.greatest((s2 - s1 * s1 / n) / (n - 1), F.lit(0.0))
    return li.agg(
        F.lit("l_quantity").alias("col"),
        n.alias("n"),
        (s1 / n).alias("mean"),
        F.round(F.sqrt(var), 6).alias("std"),
        F.min(q).alias("min_v"),
        F.max(q).alias("max_v"),
    )


@query(
    "q_correlation",
    oracle="""
    SELECT ROUND(
        (COUNT(*) * CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE)
         - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
           * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE))
        / SQRT(
            (COUNT(*) * CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DOUBLE)
             - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE))
            * (COUNT(*) * CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE)
               - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE))
        ), 6) AS corr_qty_price,
        COUNT(*) AS n
    FROM lineitem
    """,
)
def q_correlation(spark, sf_dir):
    """Pearson correlation from decimal-exact moment sums (builtin
    corr() streams doubles in partition order — not cross-engine-
    reproducible; the closed form from exact sums is)."""
    li = t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    n = F.count(F.lit(1))
    sq = F.sum(q.cast("decimal(18,4)")).cast("double")
    sp = F.sum(p.cast("decimal(18,4)")).cast("double")
    sqq = F.sum((q * q).cast("decimal(28,8)")).cast("double")
    spp = F.sum((p * p).cast("decimal(28,8)")).cast("double")
    sqp = F.sum((q * p).cast("decimal(28,8)")).cast("double")
    corr = (n * sqp - sq * sp) / F.sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))
    return li.agg(F.round(corr, 6).alias("corr_qty_price"), n.alias("n"))


@query(
    "q_zip_index",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
                AS BIGINT) AS row_idx
    FROM documents
    """,
)
def q_zip_index(spark, sf_dir):
    """J1 replacement: deterministic 0-based row-id assignment (the
    engine's answer to the reference's positional indexing,
    src/main.py:151-157 — ids derived from content order, never from
    partition layout like monotonically_increasing_id)."""
    docs = t(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return docs.select(
        "doc_id", (F.row_number().over(w) - 1).cast("bigint").alias("row_idx")
    )


@query(
    "q_sample_bernoulli",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|bern'), 1, 8)
          < CASE WHEN lang = 'en' THEN '4ccccccc'             -- 0.3 * 16^8
                 WHEN lang IN ('de','es','fr','zh')
                      THEN '19999999'                         -- 0.1 * 16^8
                 ELSE NULL END   -- unknown stratum: dropped (sampleBy)
    """,
)
def q_sample_bernoulli(spark, sf_dir):
    """M1 approximate path: per-stratum Bernoulli sampling as a
    map-side filter (no shuffle) — the sampler used when exact-N is
    not required. Was rows-only (Spark sampleBy RNG has no DuckDB
    twin); now the DETERMINISTIC md5-gate Bernoulli
    (operators/relational.bernoulli_sample_deterministic, the
    q_temperature_mix construction), which selects the same rows on
    any engine, run, or partitioning — so the driver hash-checks it.
    English keeps 30%, every other stratum 10%."""
    from team_02_spark.operators.relational import (
        bernoulli_sample_deterministic,
    )

    docs = t(spark, sf_dir, "documents")
    fractions = {l: (0.3 if l == "en" else 0.1)
                 for l in ("de", "en", "es", "fr", "zh")}
    return bernoulli_sample_deterministic(
        docs, "lang", fractions, key="doc_id"
    ).select("doc_id", "lang")


@query(
    "q_string_agg",
    oracle="""
    SELECT lang,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def q_string_agg(spark, sf_dir):
    """Collect-style aggregation exported deterministically: distinct
    values sorted then joined (collect_set order is undefined — the
    sort is what makes it declarable)."""
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
                     WHEN o_totalprice >= 500000.0 THEN 11
                     ELSE CAST(FLOOR(o_totalprice / 50000.0) AS INT) + 1
                END AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY bucket
    """,
)
def q_histogram(spark, sf_dir):
    """Distribution profiling: fixed-width histogram via width_bucket —
    a single map-side bucketing + small agg (how you profile a 100 TB
    column without sorting it). DuckDB 1.0 has no width_bucket; the
    oracle states its arithmetic definition."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(10)).alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "q_upsert",
    oracle="""
    WITH updates AS (
        SELECT c_custkey, 'UPDATED' AS c_name, c_nationkey,
               c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT 900000 + r_regionkey AS c_custkey, 'NEW' AS c_name,
               CAST(0 AS INT) AS c_nationkey, 0.0 AS c_acctbal,
               'NONE' AS c_mktsegment
        FROM region
    )
    SELECT COALESCE(b.c_custkey, u.c_custkey) AS c_custkey,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE b.c_name END
               AS c_name,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE b.c_acctbal END
               AS c_acctbal,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE b.c_mktsegment END
               AS c_mktsegment
    FROM customer b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
    """,
)
def q_upsert(spark, sf_dir):
    """Merge/upsert (full-outer-join pattern): a deterministic update
    batch (every 10th customer modified + 5 inserts) merged into the
    customer table — update wins, inserts appear, others carry."""
    from team_02_spark.operators.upsert import upsert

    cust = t(spark, sf_dir, "customer")
    mods = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.lit("UPDATED").alias("c_name"), "c_nationkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"), "c_mktsegment",
    )
    inserts = t(spark, sf_dir, "region").select(
        (F.col("r_regionkey") + 900000).cast("long").alias("c_custkey"),
        F.lit("NEW").alias("c_name"),
        F.lit(0).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NONE").alias("c_mktsegment"),
    )
    merged = upsert(cust, mods.unionByName(inserts), "c_custkey")
    return merged.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")


@query(
    "q_date_spine",
    oracle="""
    WITH spine AS (
        SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                           INTERVAL 1 DAY)) AS DATE) AS day
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s.day, COALESCE(d.n, 0) AS n_orders
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def q_date_spine(spark, sf_dir):
    """Date-spine pattern: a generated contiguous calendar left-joined
    to event counts so zero-activity days appear — the gap-free
    time-series every dashboard needs. The spine is sequence()+explode
    (one tiny generated relation, no driver loop)."""
    orders = t(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n_orders")
    )


@query(
    "q_min_max_by",
    oracle="""
    SELECT c_mktsegment,
           arg_min(c_name, c_acctbal) AS poorest,
           arg_max(c_name, c_acctbal) AS richest,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_min_max_by(spark, sf_dir):
    """A2 breadth: argmin/argmax aggregates (min_by/max_by) — fetch
    the row attribute AT the extremum in one pass, no self-join.
    (Balances are distinct in the fixture, so ties don't arise.)"""
    cust = t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.min_by("c_name", "c_acctbal").alias("poorest"),
        F.max_by("c_name", "c_acctbal").alias("richest"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@query(
    "q_struct_funcs",
    oracle="""
    SELECT e.event_id,
           struct_pack(t := e.event_type, v := e.value)['t'] AS s_type,
           struct_pack(t := e.event_type, v := e.value)['v'] AS s_value,
           CAST(struct_pack(a := 1, b := 2)['b'] AS INT) AS s_lit
    FROM events e
    WHERE e.event_id % 25 = 0
    """,
)
def q_struct_funcs(spark, sf_dir):
    """F-breadth: struct build + field access (+ withField update path
    exercised in multimodal resize); structs exit as scalars."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    s = F.struct(F.col("event_type").alias("t"), F.col("value").alias("v"))
    lit_s = F.struct(F.lit(1).alias("a"), F.lit(2).alias("b"))
    return ev.select(
        "event_id",
        s.getField("t").alias("s_type"),
        s.getField("v").alias("s_value"),
        lit_s.getField("b").cast("int").alias("s_lit"),
    )


@query(
    "q_schema_drift_union",
    oracle="""
    SELECT * FROM (
        SELECT event_id, event_type, value, 'v1' AS src
        FROM events WHERE event_id % 3 = 0
        UNION ALL BY NAME
        SELECT event_id, event_type, value, props, 'v2' AS src
        FROM events WHERE event_id % 3 = 1
    )
    """,
)
def q_schema_drift_union(spark, sf_dir):
    """Schema-evolution union: an old extract (no `props` column) and
    a new extract union BY NAME, with the missing column null-filled —
    the ingest pattern when upstream schemas drift mid-corpus. Spark's
    unionByName(allowMissingColumns=True) is the exact counterpart of
    ANSI UNION ALL BY NAME; both resolve columns positionally-never,
    by name-always."""
    ev = t(spark, sf_dir, "events")
    v1 = ev.filter(F.col("event_id") % 3 == 0).select(
        "event_id", "event_type", "value", F.lit("v1").alias("src")
    )
    v2 = ev.filter(F.col("event_id") % 3 == 1).select(
        "event_id", "event_type", "value", "props", F.lit("v2").alias("src")
    )
    return v1.unionByName(v2, allowMissingColumns=True)


@query(
    "q_file_provenance",
    oracle="""
    SELECT tbl, file_name,
           COUNT(*) AS n_rows,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key
    FROM (
        SELECT 'orders' AS tbl, 'orders.parquet' AS file_name,
               o_orderkey AS k FROM orders
        UNION ALL
        SELECT 'lineitem', 'lineitem.parquet', l_orderkey FROM lineitem
        UNION ALL
        SELECT 'documents', 'documents.parquet', doc_id FROM documents
    ) GROUP BY tbl, file_name
    """,
)
def q_file_provenance(spark, sf_dir):
    """Per-FILE ingest provenance via Spark's hidden ``_metadata``
    struct (the modern replacement for input_file_name()): every scan
    row carries its source file's name for free — no extra I/O, no
    UDF — so the lineage report (rows + key bounds per physical file)
    is one grouped aggregate per table. This is the audit that pins a
    bad ingest batch to the exact files that delivered it; at 100 TB
    it runs per partition directory and feeds the compaction planner
    (sinks/writers.compact_parquet). The oracle runs on the driver's
    registered views (no filename function there), so it encodes the
    fixture's one-file-per-table layout as the expected file_name —
    which makes Spark's _metadata.file_name itself the thing under
    test: report the wrong file and the hash mismatches."""
    parts = []
    for tbl, key in (
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("documents", "doc_id"),
    ):
        parts.append(
            t(spark, sf_dir, tbl).select(
                F.lit(tbl).alias("tbl"),
                F.col("_metadata.file_name").alias("file_name"),
                F.col(key).cast("long").alias("k"),
            )
        )
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return u.groupBy("tbl", "file_name").agg(
        F.count("*").alias("n_rows"),
        F.min("k").cast("bigint").alias("min_key"),
        F.max("k").cast("bigint").alias("max_key"),
    )
