"""Advanced relational patterns: as-of join, pivot/unpivot, scalar
subqueries, CSV round-trip, multimodal plumbing.

The as-of join and pivot are the operators a user of the reference
would next reach for at scale (time-series alignment, wide reports);
each is expressed with the shuffle-minimal Spark idiom and an exact
ANSI oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from team_02_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthesize_media,
)
from team_02_spark.queries.registry import query
from team_02_spark.queries._util import run_dir, t


@query(
    "q_join_asof",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id,
           p.user_id,
           CAST(FLOOR(epoch(MAX(c.ts))) AS BIGINT) AS last_click_s
    FROM purchases p LEFT JOIN clicks c
      ON c.user_id = p.user_id AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: for each purchase, the most recent click by the
    same user at-or-before it. Implemented with the union+window trick
    — tag both streams, ONE shuffle on (user_id, ts order), running
    last_value(click_ts, ignorenulls) — instead of the naive range
    join whose per-user candidate set explodes at scale."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_p")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
        F.lit(0).alias("is_p"),
    )
    merged = purchases.unionByName(clicks)
    # Clicks sort before purchases at identical ts (is_p ascending) so
    # a same-instant click counts as "at-or-before" — matches c.ts <= p.ts.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("is_p") == 0, F.col("ts"))
    return (
        merged.withColumn("last_click", F.last(click_ts, ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_timestamp("last_click").alias("last_click_s"),
        )
    )


@query(
    "q_pivot",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0,
           CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1,
           CAST(SUM(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2,
           CAST(SUM(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS BIGINT) AS src3
    FROM documents
    GROUP BY lang
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot: lang × source count matrix. Explicit value list → one
    hash agg, no second pass to discover columns (the two-phase
    auto-discovery pivot is an anti-pattern at scale)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
        .groupBy("lang")
        .pivot("source", ["src0", "src1", "src2", "src3"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["src0", "src1", "src2", "src3"])
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
    FROM customer
    """,
)
def q_unpivot(spark, sf_dir):
    """Unpivot (melt): wide → long via the native unpivot operator
    (no join, a generate-style narrow transform)."""
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey", "c_acctbal", F.col("c_nationkey").cast("double")
    ).unpivot(
        "c_custkey",
        ["c_acctbal", "c_nationkey"],
        "metric",
        "val",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "c_acctbal", "acctbal").otherwise("nationkey"),
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def q_scalar_subquery(spark, sf_dir):
    """Scalar subquery: orders above the global mean. Spark: the
    aggregate is a 1-row broadcast crossJoin (what Catalyst rewrites
    scalar subqueries to anyway) — no driver collect."""
    orders = t(spark, sf_dir, "orders")
    avg_df = orders.agg(F.avg("o_totalprice").alias("__avg"))
    return (
        orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_correlated_agg",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    JOIN (SELECT o_custkey, MAX(o_totalprice) AS mx
          FROM orders GROUP BY o_custkey) m
      ON o.o_custkey = m.o_custkey AND o.o_totalprice = m.mx
    """,
)
def q_correlated_agg(spark, sf_dir):
    """Correlated-subquery pattern (each customer's priciest orders)
    decorrelated to a window max — ONE shuffle instead of the
    self-join's two."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("__mx", F.max("o_totalprice").over(w))
        .filter(F.col("o_totalprice") == F.col("__mx"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_csv_scan",
    oracle="SELECT doc_id, lang, text FROM documents",
)
def q_csv_scan(spark, sf_dir):
    """S1/S3: CSV sink → CSV scan round-trip with explicit schema
    (the reference's read path, src/main.py:64-65, with quoted-field
    and header handling). Oracle = the source table itself: the
    round-trip must be lossless, which IS the property being checked."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = run_dir(spark, "csv_roundtrip")
    docs.write.mode("overwrite").option("header", True).csv(out)
    return (
        spark.read.schema("doc_id long, lang string, text string")
        .options(header=True)
        .csv(out)
    )


@query(
    "q_multimodal_features",
    # Full ANSI oracle (r9): every exit column of the fake-codec
    # feature pass is exact arithmetic on the payload bytes —
    # content_sha = sha256 of the UTF-8 text (DuckDB sha256(VARCHAR)
    # hashes the same bytes Python's hashlib sees), byte values
    # recovered per position from hex(payload), byte_mean = one exact
    # integer sum / n (bit-identical fl(S/n) on both engines: the sum
    # of <=553 bytes is an exact f64 integer under ANY summation
    # order, so 4dp boundaries are either exactly representable — both
    # engines round the identical double — or >=9e-4 away by the
    # rational-denominator bound), byte_std rounded 4dp with measured
    # >=2e-4 boundary margin on both fixtures vs ~1e-13 engine noise.
    # Empty payload decodes as one zero byte (the codec contract).
    oracle="""
    WITH b AS (
      SELECT doc_id, text, encode(COALESCE(text, '')) AS payload
      FROM documents
    ),
    hx AS (
      SELECT doc_id, text, payload,
             CASE WHEN octet_length(payload) = 0 THEN '00'
                  ELSE hex(payload) END AS h
      FROM b
    ),
    bytes AS (
      SELECT doc_id,
             ('0x' || substr(h, CAST(2*u - 1 AS BIGINT), 2))::BIGINT AS v
      FROM (SELECT doc_id, h, unnest(range(1, length(h)//2 + 1)) AS u
            FROM hx)
    ),
    stats AS (
      SELECT doc_id, AVG(CAST(v AS DOUBLE)) AS m, COUNT(*) AS n
      FROM bytes GROUP BY doc_id
    ),
    dev AS (
      SELECT y.doc_id,
             SQRT(SUM((CAST(y.v AS DOUBLE) - s.m)
                      * (CAST(y.v AS DOUBLE) - s.m)) / s.n) AS sd
      FROM bytes y JOIN stats s ON y.doc_id = s.doc_id
      GROUP BY y.doc_id, s.n
    )
    SELECT h.doc_id,
           sha256(COALESCE(h.text, '')) AS content_sha,
           CAST(octet_length(h.payload) AS BIGINT) AS n_bytes,
           ROUND(s.m, 4) AS byte_mean,
           ROUND(d.sd, 4) AS byte_std,
           CAST(8 AS INT) AS feature_dim
    FROM hx h JOIN stats s ON h.doc_id = s.doc_id
    JOIN dev d ON h.doc_id = d.doc_id
    """,
)
def q_multimodal_features(spark, sf_dir):
    """North-star multimodal lane: binary payload + typed metadata →
    mapInPandas decode('fake' codec) → per-item features. The Spark
    plumbing (binary columns, Arrow batches, stable feature schema) is
    real; the codec is the documented stub seam. Since r9 the exit
    columns are pinned by a full DuckDB oracle (decorator above) —
    the fake-codec features are exact byte arithmetic."""
    docs = t(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    feats = extract_features(media, decode_stub="fake")
    return feats.select(
        "doc_id", "content_sha", "n_bytes",
        F.round("byte_mean", 4).alias("byte_mean"),
        F.round("byte_std", 4).alias("byte_std"),
        F.size("feature").cast("int").alias("feature_dim"),
    )


@query(
    "q_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id, LENGTH(text) AS nb, (LENGTH(text) % 8) + 1 AS nf
        FROM documents
    )
    SELECT doc_id, CAST(u.i AS INT) AS frame_idx,
           CAST(FLOOR(CAST(nb AS DOUBLE) * u.i / nf) AS BIGINT) AS frame_offset
    FROM m, UNNEST(range(0, CAST(nf AS BIGINT))) AS u(i)
    WHERE u.i % 2 = 0
    """,
)
def q_frame_sample(spark, sf_dir):
    """Multimodal: video frame-sampling plumbing (explode n_frames,
    keep every 2nd, compute byte offsets) — pure JVM; the synthetic
    metadata is arithmetic on text length, so the oracle restates it
    exactly."""
    docs = t(spark, sf_dir, "documents")
    media = synthesize_media(docs, kind="video")
    return sample_frames(media, every_n=2).select(
        "doc_id", F.col("frame_idx").cast("int").alias("frame_idx"), "frame_offset"
    )


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           sha256(text) AS content_sha,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes,
           ROUND(CAST(list_sum(list_transform(range(1, LENGTH(text) + 1),
                 i -> ascii(text[i]))) AS DOUBLE) / LENGTH(text), 4) AS byte_mean
    FROM documents
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Multimodal lane, ORACLE-CHECKED: the mapInPandas feature
    extractor's deterministic outputs (sha256 of the payload, byte
    count, byte mean) verified by SQL that recomputes them from the
    source text — an exact cross-engine check THROUGH the Python
    lane (integer byte sums are exact in float64, so numpy and SQL
    agree bitwise; the histogram feature stays in
    q_multimodal_features)."""
    docs = t(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    feats = extract_features(media, decode_stub="fake")
    return feats.select(
        "doc_id", "content_sha", "n_bytes",
        F.round("byte_mean", 4).alias("byte_mean"),
    )
