"""LLM training-data pipeline operators, round 2: chunking, vocab
coverage, deterministic source mixing, stage-yield observability, and
incremental (mergeable-state) aggregation.

These extend the curation lane (pipeline_data.py, text_queries.py)
with the steps between "curated corpus" and "training batches":

- chunking: split documents into overlapping fixed-token windows —
  the tokenize-and-pack precursor (companion to q_pack_sequences);
- vocab coverage: what fraction of token occurrences a top-K corpus
  vocabulary covers — the OOV-rate metric for tokenizer sizing;
- source mixing: down/up-weight sources to a target mixture with a
  DETERMINISTIC per-row keep decision (Knuth multiplicative hash of
  the id — reproducible in any engine, auditable, re-runnable);
- pipeline yield: per-stage survivor counts through the cumulative
  filter chain — the observability table every curation run reports;
- incremental agg: merge partial aggregates from a base corpus and a
  delta batch WITHOUT rescanning the base — the mergeable-state
  pattern (count + decimal sum) behind incremental materialized
  views; the oracle proves merge ≡ full recompute.

At 100 TB: chunking/coverage are one explode-shuffle each (the
explode is map-side; the shuffle is only the vocab/doc aggregation);
source mixing is a pure map (no shuffle at all — the hash decision is
row-local); incremental agg reads ONLY the delta plus tiny partial
state.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import t
from team_02_spark.util import shared_pass

# Whitespace tokens, empty-free — the house tokenization
# (text_queries.py q_token_count uses the same split on both engines).
_TOKS_SQL = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"


def _toks(col):
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


@query(
    "q_chunk_text",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(range(1, len(toks) + 1, 15)) AS start
      FROM tok
      WHERE len(toks) >= 1
    )
    SELECT doc_id,
           CAST((start - 1) // 15 AS INT) AS chunk_id,
           array_to_string(list_slice(toks, start, start + 19), ' ') AS chunk,
           CAST(least(20, len(toks) - start + 1) AS INT) AS n_chunk_tokens
    FROM s
    """,
)
def q_chunk_text(spark, sf_dir):
    """Chunk each document into 20-token windows with stride 15 (5
    tokens of overlap) — the context-window preprocessing step before
    tokenize/embed. The token array is built ONCE per document and the
    chunk explosion is map-side (no shuffle at all: chunking is
    embarrassingly parallel); at scale the output is written
    partitioned by source so downstream embedding jobs stream it."""
    from team_02_spark.operators.chunking import chunk_documents

    docs = t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=20, stride=15)


@query(
    "q_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS r
        FROM tok GROUP BY tok
      ) WHERE r <= 500
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_covered,
           ROUND(CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS coverage
    FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id
    """,
)
def q_vocab_coverage(spark, sf_dir):
    """Per-document coverage of the corpus top-500 vocabulary (by
    occurrence): the OOV-rate report used to size tokenizer vocabs.
    Two aggregations share one exploded-token pass; the vocab (tiny by
    construction) broadcasts back onto the token stream, so the only
    big shuffle is the token-frequency count — and that one is
    map-side combined. Rank ties at the K boundary break on the token
    string, so the vocab set is deterministic on both engines."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(_toks(F.col("text"))).alias("tok")
    )
    wr = Window.orderBy(F.desc("cnt"), "tok")
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") <= 500)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("__in_vocab"), F.lit(0)))
            .cast("bigint").alias("n_covered"),
            F.round(
                F.sum(F.coalesce(F.col("__in_vocab"), F.lit(0))).cast("double")
                / F.count("*"), 6
            ).alias("coverage"),
        )
    )


# Deterministic uniform draw in (0,1) from an integer id — the Knuth
# multiplicative hash in exact decimal arithmetic (same construction
# as operators/relational.weighted_sample_exact; HUGEINT on the
# DuckDB side). Engine-reproducible, overflow-safe under ANSI mode.
_U_SQL = (
    "(CAST(((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296) + 1 AS DOUBLE)"
    " / 4294967297.0)"
)


def _u(key):
    from team_02_spark.util import knuth_uniform

    return knuth_uniform(key)


_RATE_SQL = """CASE
      WHEN source IN ('src0','src1','src2','src3','src4') THEN 0.9
      WHEN source IN ('src5','src6','src7','src8','src9') THEN 0.5
      ELSE 0.2 END"""


@query(
    "q_source_mix",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_U_SQL} < {_RATE_SQL}
    """,
)
def q_source_mix(spark, sf_dir):
    """Deterministic source mixing: keep each document with a
    per-source target rate (high-quality sources at 0.9, mid at 0.5,
    tail at 0.2) decided by a hash of the doc id — not an RNG — so the
    mixture is exactly reproducible across runs, engines, and
    retries. A pure map over the corpus: no shuffle, no state; at 100
    TB this composes with the scan (predicate evaluated next to the
    parquet reader)."""
    docs = t(spark, sf_dir, "documents")
    rate = (
        F.when(
            F.col("source").isin("src0", "src1", "src2", "src3", "src4"),
            F.lit(0.9),
        )
        .when(
            F.col("source").isin("src5", "src6", "src7", "src8", "src9"),
            F.lit(0.5),
        )
        .otherwise(F.lit(0.2))
    )
    return docs.filter(_u("doc_id") < rate).select("doc_id", "source")


@query(
    "q_pipeline_yield",
    oracle=f"""
    WITH annotated AS (
      SELECT n_chars, lang,
             len({_TOKS_SQL}) AS n_toks
      FROM documents
    )
    SELECT COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN n_chars >= 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after_length,
           CAST(SUM(CASE WHEN n_chars >= 50 AND lang = 'en' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_after_lang,
           CAST(SUM(CASE WHEN n_chars >= 50 AND lang = 'en' AND n_toks >= 10
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_after_tokens,
           ROUND(CAST(SUM(CASE WHEN n_chars >= 50 AND lang = 'en' AND n_toks >= 10
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS yield_pct
    FROM annotated
    """,
)
def q_pipeline_yield(spark, sf_dir):
    """Curation observability: survivor counts through the cumulative
    filter chain (length → language → token budget) plus the final
    yield fraction — ONE pass with conditional aggregates, not one
    count() job per stage (the difference between a report and four
    full corpus scans at 100 TB)."""
    docs = t(spark, sf_dir, "documents")
    n_toks = F.size(_toks(F.col("text")))
    s1 = F.col("n_chars") >= 50
    s2 = s1 & (F.col("lang") == "en")
    s3 = s2 & (n_toks >= 10)
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return docs.agg(
        F.count("*").alias("n_total"),
        one_if(s1).cast("bigint").alias("n_after_length"),
        one_if(s2).cast("bigint").alias("n_after_lang"),
        one_if(s3).cast("bigint").alias("n_after_tokens"),
        F.round(one_if(s3).cast("double") / F.count("*"), 6).alias("yield_pct"),
    )


@query(
    "q_dedup_incremental",
    oracle="""
    WITH base AS (
        SELECT DISTINCT md5(text) AS fp
        FROM documents WHERE doc_id % 10 < 8
    ),
    delta AS (
        SELECT doc_id, md5(text) AS fp,
               ROW_NUMBER() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM documents WHERE doc_id % 10 >= 8
    )
    SELECT d.doc_id FROM delta d
    WHERE d.rn = 1
      AND NOT EXISTS (SELECT 1 FROM base b WHERE b.fp = d.fp)
    """,
)
def q_dedup_incremental(spark, sf_dir):
    """Incremental dedup — the PRODUCTION shape of exact dedup at
    100 TB: a new delta batch (doc_id % 10 >= 8 stands in for "newly
    crawled") is deduped (a) within itself keep-first and (b) against
    the fingerprint INDEX of the already-ingested base corpus
    (DISTINCT md5(text) — a stored, fingerprint-only table in
    production; here derived in-query). Only the delta is text-scanned
    and window-shuffled; the base contributes one fingerprint read +
    an anti-join. Re-running full dedup over base+delta every batch is
    the O(corpus) anti-pattern this replaces (same argument as
    q_incremental_agg's merge ≡ recompute)."""
    docs = t(spark, sf_dir, "documents")
    base_fp = (
        docs.filter(F.col("doc_id") % 10 < 8)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    delta = (
        docs.filter(F.col("doc_id") % 10 >= 8)
        .select("doc_id", F.md5("text").alias("fp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return delta.join(base_fp, "fp", "left_anti").select("doc_id")


@query(
    "q_dup_cluster_stats",
    oracle="""
    WITH c AS (
        SELECT md5(text) AS fp, COUNT(*) AS n
        FROM documents GROUP BY md5(text)
    )
    SELECT n AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(n * COUNT(*) AS BIGINT) AS n_docs
    FROM c GROUP BY n
    """,
)
def q_dup_cluster_stats(spark, sf_dir):
    """Duplicate-cluster size histogram: how many exact-dup clusters
    of each size, and the rows they account for — the observability
    sheet that decides whether dedup is worth a full pass (a corpus
    that is 99% singletons dedups cheaply; one giant cluster signals
    boilerplate). Two cheap aggregates: the md5-keyed count is the
    same single shuffle q_dedup_exact pays, the histogram is
    cluster-cardinality-sized."""
    docs = t(spark, sf_dir, "documents")
    clusters = docs.groupBy(F.md5("text").alias("fp")).agg(
        F.count("*").alias("n")
    )
    return clusters.groupBy(F.col("n").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*")).cast("bigint").alias("n_docs"),
    )


@query(
    "q_incremental_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def q_incremental_agg(spark, sf_dir):
    """Incremental aggregation via mergeable partial state: the base
    corpus (events before Jan 15) and the delta batch (after) are
    aggregated SEPARATELY into (count, decimal-sum) partials, then
    merged by re-summing — and the oracle is the full recompute over
    everything, proving merge ≡ recompute. This is the maintenance
    step of an incremental materialized view: at 100 TB the base
    partials are a tiny stored table and only the delta is scanned.
    Counts merge by summing; sums merge EXACTLY because the partial
    state is decimal, not double (FIXTURES.md §C)."""
    ev = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("__n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("__s"),
        )

    base = partial(ev.filter(F.col("ts") < cutoff))
    delta = partial(ev.filter(F.col("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("__n").alias("n_events"),
            F.sum("__s").cast("double").alias("total_value"),
        )
    )


@query(
    "q_table_diff",
    oracle="""
    WITH old_v AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 10 <> 0
    ),
    new_v AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 9 <> 0
    ),
    diff AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                   AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                       THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM old_v o FULL OUTER JOIN new_v n ON o.o_orderkey = n.o_orderkey
    )
    SELECT status, COUNT(*) AS n
    FROM diff GROUP BY status
    """,
)
def q_table_diff(spark, sf_dir):
    """Snapshot diff audit: two deterministic 'versions' of the orders
    table (a simulated delete set and a simulated price-bump update
    set) classified added/removed/changed/unchanged in ONE full-outer
    join, NULL-safe on every compared column — the pre-promotion audit
    every rewrite job should emit. At scale both snapshots are
    key-bucketed and the join is shuffle-free."""
    from team_02_spark.operators.upsert import table_diff

    orders = t(spark, sf_dir, "orders")
    old_v = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new_v = orders.filter(F.col("o_orderkey") % 9 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus",
    )
    return (
        table_diff(old_v, new_v, "o_orderkey")
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


# ------------------------------------------------- round-3 additions

@query(
    "q_lm_perplexity",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    big AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                      i -> [toks[i], toks[i + 1]])) AS bg
        FROM tok WHERE len(toks) >= 2
    ),
    inst AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM big),
    hist AS (SELECT w1, COUNT(*) AS c_hist FROM inst GROUP BY w1),
    pair AS (SELECT w1, w2, COUNT(*) AS c_pair FROM inst GROUP BY w1, w2),
    voc AS (
        SELECT COUNT(DISTINCT tok) AS v
        FROM (SELECT unnest(toks) AS tok FROM tok)
    )
    SELECT i.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(SUM(-LN(CAST(p.c_pair + 1 AS DOUBLE)
                         / (h.c_hist + voc.v))) / COUNT(*), 4) AS avg_nll
    FROM inst i
    JOIN pair p ON i.w1 = p.w1 AND i.w2 = p.w2
    JOIN hist h ON i.w1 = h.w1
    CROSS JOIN voc
    GROUP BY i.doc_id
    """,
)
def q_lm_perplexity(spark, sf_dir):
    """Count-based bigram language-model scoring — the KenLM-style
    quality filter of LLM data pipelines, fully relational: train the
    LM (bigram + history counts, one exploded pass) and score every
    document (average negative log-likelihood under add-1 smoothing,
    P(w2|w1) = (c(w1,w2)+1)/(c(w1,·)+|V|)) in the same job. High
    avg_nll = improbable text = quality-filter candidate.

    Scale: counts tables are vocabulary-sized and shuffle by token
    key (never all-pairs); the scoring joins are plain distributed
    equi-joins on w1/(w1,w2); |V| rides in as a 1-row broadcast cross
    join. Cross-engine: the LN family differs in the last ulp between
    engines, so avg_nll is rounded to 4dp AFTER the per-doc average
    (accumulated ulp error ~1e-13 << the 5e-5 rounding boundary)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", _toks(F.col("text")).alias("toks"))
    n = F.size("toks")
    inst = (
        tok.filter(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, n - 1),
                    F.slice("toks", 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    hist = inst.groupBy("w1").agg(F.count("*").alias("c_hist"))
    pair = inst.groupBy("w1", "w2").agg(F.count("*").alias("c_pair"))
    voc = tok.select(F.explode("toks").alias("tok")).agg(
        F.count_distinct("tok").alias("v")
    )
    nll = -F.log(
        (F.col("c_pair") + 1).cast("double") / (F.col("c_hist") + F.col("v"))
    )
    return (
        inst.join(pair, ["w1", "w2"])
        .join(hist, "w1")
        .crossJoin(F.broadcast(voc))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum(nll) / F.count("*"), 4).alias("avg_nll"),
        )
    )


@query(
    "q_temperature_mix",
    oracle=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
    ),
    tot AS (
        SELECT SUM(SQRT(CAST(n_s AS DOUBLE))) AS z,
               SUM(n_s) AS n FROM counts
    ),
    rates AS (
        SELECT c.source,
               LEAST(1.0, (0.5 * t.n) * (SQRT(CAST(c.n_s AS DOUBLE)) / t.z)
                          / c.n_s) AS f_s
        FROM counts c CROSS JOIN tot t
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {_U_SQL} < r.f_s
    """,
)
def q_temperature_mix(spark, sf_dir):
    """Temperature-scaled source mixing (T=2, i.e. sqrt weighting):
    target mixture w_s ∝ sqrt(n_s) up-weights tail sources and
    down-weights dominant ones — the standard multilingual/multi-domain
    rebalancing move — at a fixed total budget of half the corpus.
    Per-source keep rate f_s = min(1, M·w_s/n_s); the per-row decision
    is the same deterministic Knuth-hash gate as q_source_mix, so the
    sample is reproducible across runs, engines, and retries.

    Scale: one tiny per-source count aggregate (broadcast back), then
    a pure map gate next to the scan. sqrt (not pow) on purpose:
    engines agree on sqrt bit-for-bit, while pow/LN differ in the
    last ulp (FIXTURES.md §C discipline)."""
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = counts.agg(
        F.sum(F.sqrt(F.col("n_s").cast("double"))).alias("z"),
        F.sum("n_s").alias("n"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            (0.5 * F.col("n"))
            * (F.sqrt(F.col("n_s").cast("double")) / F.col("z"))
            / F.col("n_s"),
        ).alias("f_s"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(_u("doc_id") < F.col("f_s"))
        .select("doc_id", "source")
    )


@query(
    "q_shard_plan",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id,
               CAST(FLOOR({_U_SQL} * 16) AS INT) AS shard,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                   AS n_tok
        FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM assigned GROUP BY shard
    """,
)
def q_shard_plan(spark, sf_dir):
    """Training-data export sharding: assign every document to one of
    16 shards by the deterministic Knuth-hash uniform (reproducible in
    any engine — the same gate family as q_source_mix), and report the
    per-shard manifest (doc count, token budget, id bounds) that a
    shard-balanced writer needs BEFORE writing anything. At 100 TB
    this report is the cheap dry-run that catches shard skew; the
    write itself is df.repartition(shard).write.partitionBy(shard) —
    one shuffle keyed exactly like this aggregate."""
    docs = t(spark, sf_dir, "documents")
    shard = F.floor(_u("doc_id") * 16).cast("int")
    n_tok = F.size(_toks(F.col("text")))
    return (
        docs.select("doc_id", shard.alias("shard"), n_tok.alias("n_tok"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@query(
    "q_token_budget_sample",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                        x -> x <> '')) AS BIGINT) AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS ord
        FROM documents
    ),
    running AS (
        SELECT doc_id, source, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY ord, doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
        FROM sized
    )
    SELECT doc_id, source, n_tok, cum_tok
    FROM running WHERE cum_tok <= 20000
    """,
)
def q_token_budget_sample(spark, sf_dir):
    """Token-budget sampling: fill a fixed per-source token budget
    (20k) with documents in deterministic md5-of-id order — the
    "give me N tokens per domain" selection every training-mix
    recipe needs, reproducible across runs and engines (same md5
    ordering trick as the stratified sampler, SURVEY §2.3 M1).
    One window pass per source partition: the running token sum is a
    cumulative frame over the per-source ordering, and the budget cut
    is a filter on it — no iteration, no driver state. At 100 TB each
    source's window rides one hashpartitioning(source) exchange."""
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    sized = docs.select(
        "doc_id",
        "source",
        F.size(_toks(F.col("text"))).cast("bigint").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("ord", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        sized.withColumn("cum_tok", F.sum("n_tok").over(w))
        .filter(F.col("cum_tok") <= 20000)
        .select("doc_id", "source", "n_tok", "cum_tok")
    )


# ------------------------------------------------- round-4 additions

_DSIR_TGT = "('src0', 'src1', 'src2', 'src3')"

# The DSIR per-token weight table as named CTEs — shared between the
# q_dsir_select oracle and the gate-clearance fixture guard
# (tests/test_fixture_invariants.py), so the guard can never drift
# into measuring a stale formula.
DSIR_CTES_SQL = f"""tok AS (
        SELECT doc_id, source, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    raw_cnt AS (SELECT tok, COUNT(*) AS c_raw FROM tok GROUP BY tok),
    tgt_cnt AS (
        SELECT tok, COUNT(*) AS c_tgt FROM tok
        WHERE source IN {_DSIR_TGT} GROUP BY tok
    ),
    tot AS (
        SELECT COUNT(*) AS t_raw,
               CAST(SUM(CASE WHEN source IN {_DSIR_TGT}
                             THEN 1 ELSE 0 END) AS BIGINT) AS t_tgt,
               COUNT(DISTINCT tok) AS v
        FROM tok
    ),
    llr AS (
        SELECT r.tok,
               LN(CAST(COALESCE(g.c_tgt, 0) + 1 AS DOUBLE)
                  / (tot.t_tgt + tot.v))
               - LN(CAST(r.c_raw + 1 AS DOUBLE) / (tot.t_raw + tot.v))
                 AS w
        FROM raw_cnt r LEFT JOIN tgt_cnt g ON r.tok = g.tok, tot
    )"""


@query(
    "q_dsir_select",
    oracle=f"""
    WITH {DSIR_CTES_SQL}
    SELECT t.doc_id,
           COUNT(*) AS n_toks,
           ROUND(SUM(l.w) / COUNT(*), 4) AS dsir_score,
           CAST(SUM(l.w) / COUNT(*) > 0 AS BOOLEAN) AS selected
    FROM tok t JOIN llr l ON t.tok = l.tok
    GROUP BY t.doc_id
    """,
)
def q_dsir_select(spark, sf_dir):
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    NeurIPS 2023, arXiv:2302.03169) re-expressed Spark-first: score
    every raw document by its average unigram log-likelihood ratio
    between a target-domain LM (here the src0-src3 slice as the
    quality proxy) and the raw-corpus LM, both add-1 smoothed over
    the shared vocabulary; `selected` keeps docs that look more
    target-like than raw-like (score > 0 — a row-local decision, so
    selection needs NO global sort). One exploded-token pass feeds
    both LMs (the target count is a filtered re-aggregation of the
    same shuffle key), the 1-row totals broadcast, and the per-token
    weight table joins back on the token key — three token-keyed
    shuffles total, all map-side combined. The 4dp rounding absorbs
    LN ulp + summation-order drift across engines (q_lm_perplexity
    precedent)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(_toks(F.col("text"))).alias("tok")
    )
    tgt_srcs = ["src0", "src1", "src2", "src3"]
    is_tgt = F.col("source").isin(tgt_srcs)
    raw_cnt = tok.groupBy("tok").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.when(is_tgt, 1).otherwise(0)).cast("bigint").alias("c_tgt"),
    )
    tot = tok.agg(
        F.count("*").alias("t_raw"),
        F.sum(is_tgt.cast("int")).cast("bigint").alias("t_tgt"),
        F.countDistinct("tok").alias("v"),
    )
    llr = raw_cnt.crossJoin(F.broadcast(tot)).select(
        "tok",
        (
            F.log((F.col("c_tgt") + 1).cast("double")
                  / (F.col("t_tgt") + F.col("v")))
            - F.log((F.col("c_raw") + 1).cast("double")
                    / (F.col("t_raw") + F.col("v")))
        ).alias("w"),
    )
    score = F.sum("w") / F.count("*")
    return (
        tok.join(llr, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.round(score, 4).alias("dsir_score"),
            (score > 0).alias("selected"),
        )
    )


@query(
    "q_source_overlap",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT source, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    sizes AS (SELECT source, COUNT(*) AS sz FROM tok GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_inter
        FROM tok a JOIN tok b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           CAST(x.sz + y.sz - i.n_inter AS BIGINT) AS n_union,
           ROUND(CAST(i.n_inter AS DOUBLE)
                 / (x.sz + y.sz - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes x ON i.source_a = x.source
    JOIN sizes y ON i.source_b = y.source
    """,
)
def q_source_overlap(spark, sf_dir):
    """Corpus diagnostics: pairwise vocabulary Jaccard between
    sources — the overlap matrix that informs mixing weights (near-
    identical sources are dedup candidates; disjoint ones diversify).
    Distinct (source, token) FIRST (one map-side-combined shuffle
    collapses the corpus to vocab-sized sets, materialized once via
    lazy localCheckpoint), then the pair
    intersection is a token equi-join whose fan-out per token is
    bounded by the SOURCE alphabet, never corpus size — candidate
    pairs are O(|vocab| x |sources|), the q_cooccurrence discipline.
    At 100 TB swap the exact sets for per-source MinHash signatures
    (operators/dedup.py) when the alphabet itself grows."""
    docs = t(spark, sf_dir, "documents")
    # lazily checkpointed: tok feeds sizes AND both self-join sides —
    # without materialization each consumer would re-run the corpus
    # tokenize+distinct (the r4 plan audit found 4 scans); the
    # checkpointed frame is vocab-sized, not corpus-sized
    tok = docs.select(
        "source", F.explode(_toks(F.col("text"))).alias("tok")
    ).distinct().transform(shared_pass)
    sizes = tok.groupBy("source").agg(F.count("*").alias("sz"))
    a = tok.select(F.col("source").alias("source_a"), "tok")
    b = tok.select(F.col("source").alias("source_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_inter"))
    )
    uni = F.col("sza") + F.col("szb") - F.col("n_inter")
    return (
        inter.join(sizes.withColumnRenamed("source", "source_a")
                   .withColumnRenamed("sz", "sza"), "source_a")
        .join(sizes.withColumnRenamed("source", "source_b")
              .withColumnRenamed("sz", "szb"), "source_b")
        .select(
            "source_a", "source_b",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            uni.cast("bigint").alias("n_union"),
            F.round(F.col("n_inter").cast("double") / uni, 6)
            .alias("jaccard"),
        )
    )
