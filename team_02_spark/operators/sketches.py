"""Mergeable distinct-count sketches — the 100 TB counting pattern.

At scale you never count distinct users/tokens/urls in one pass over
raw data per question: each ingest shard persists a small HLL sketch
(Apache DataSketches, built into Spark: ``hll_sketch_agg``), and any
later rollup — per day, per source, global — is a cheap merge of
sketch bytes (``hll_union_agg``), never a rescan. This module wraps
that two-phase shape:

    sketches = shard_sketches(df, keys=["source"], value="user_id")
    sketches.write.parquet(...)        # bytes column, kilobytes/shard
    rollup = merge_sketches(spark.read.parquet(...), keys=["source"])

Estimates are deterministic for fixed input (DataSketches is
seed-stable), but engine-specific — DuckDB has no DataSketches HLL —
so correctness is pinned by tests (merge-of-shards == single-pass
sketch EXACTLY, and both within HLL error of the exact count), not a
driver oracle (same policy as q_approx_distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# lgConfigK=12 → 4 KiB sketches, ~1.6% standard error; plenty for
# rollup analytics and small enough to keep one per (shard, key).
DEFAULT_LG_K = 12


def shard_sketches(df: DataFrame, *, keys: list[str], value: str,
                   shard_col: str | None = None,
                   lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """Phase 1 (per ingest shard): one HLL sketch of ``value`` per
    (shard, *keys) group. ``shard_col=None`` derives a shard id from
    the input partition — the natural unit a writer would persist."""
    shard = (F.col(shard_col) if shard_col
             else F.spark_partition_id().alias("__shard"))
    return (
        df.withColumn("__shard", shard)
        .groupBy("__shard", *keys)
        .agg(F.hll_sketch_agg(F.col(value), F.lit(lg_k)).alias("hll"))
    )


def merge_sketches(sketches: DataFrame, *, keys: list[str]) -> DataFrame:
    """Phase 2 (any rollup, any time later): union the sketch bytes
    per key group and estimate. No raw-data rescan."""
    return (
        sketches.groupBy(*keys)
        .agg(F.hll_union_agg("hll").alias("hll"))
        .select(*keys,
                F.hll_sketch_estimate("hll").cast("bigint").alias("approx_distinct"))
    )



def shard_kll(df: DataFrame, *, keys: list[str], value: str,
              shard_col: str | None = None, k: int = 2048) -> DataFrame:
    """Phase 1 for QUANTILE sketches: one KLL sketch of ``value`` per
    (shard, *keys) group (Spark's built-in DataSketches KLL:
    ``kll_sketch_agg_double``). The mergeable-percentile companion to
    the HLL distinct sketches above — persist kilobyte sketches per
    ingest shard, answer any later "p99 latency per source per month"
    rollup by merging bytes, never rescanning raw data. k=2048 bounds
    rank error at ~0.6%."""
    shard = (F.col(shard_col) if shard_col
             else F.spark_partition_id().alias("__shard"))
    return (
        df.withColumn("__shard", shard)
        .groupBy("__shard", *keys)
        .agg(
            F.expr(
                f"kll_sketch_agg_double({value}, {k})"
            ).alias("kll"),
            F.count(value).alias("n_rows"),
        )
    )


def merge_kll(sketches: DataFrame, *, keys: list[str],
              quantiles: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
    """Phase 2: lossless rollup — the binary
    ``kll_sketch_merge_double`` folded over each key group's shard
    sketches (collect_list is safe: the list is SHARD-cardinality,
    kilobyte entries, never row-cardinality), then the requested
    quantiles are read straight off the merged sketch. Merge ≡
    single-pass is pinned by tests at the estimate level."""
    merged = sketches.groupBy(*keys).agg(
        F.expr(
            "aggregate(slice(collect_list(kll), 2, "
            "size(collect_list(kll)) - 1), collect_list(kll)[0], "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("kll"),
        F.sum("n_rows").alias("n_rows"),
    )
    cols = [
        F.expr(f"kll_sketch_get_quantile_double(kll, {q})").alias(
            f"q{str(q).replace('0.', '')}"
        )
        for q in quantiles
    ]
    return merged.select(*keys, "n_rows", *cols)


def audience_overlap(df: DataFrame, *, group_col: str,
                     value: str) -> DataFrame:
    """Pairwise audience-overlap estimates via THETA sketches — the
    set-operation sketch family (HLL unions but cannot intersect;
    theta does both): one sketch of distinct ``value`` per
    ``group_col``, then every group pair's |A|, |B|, |A∩B|, |A\\B|
    estimated from sketch bytes alone. The production question this
    answers at 100 TB: "how many purchase users also clicked" across
    every segment pair, WITHOUT a distinct-join per pair — sketches
    are built in one corpus pass and the pair matrix is
    alphabet-sized driver-free work. Below the sketch's nominal
    entries (2^12 default) theta runs in exact mode, so small-corpus
    tests can assert equality with exact counts, not just error
    bounds."""
    sk = df.groupBy(group_col).agg(
        F.expr(f"theta_sketch_agg({value})").alias("sk")
    )
    a = sk.select(F.col(group_col).alias("grp_a"), F.col("sk").alias("sa"))
    b = sk.select(F.col(group_col).alias("grp_b"), F.col("sk").alias("sb"))
    pairs = a.join(b, F.col("grp_a") < F.col("grp_b"))
    return pairs.select(
        "grp_a", "grp_b",
        F.expr("theta_sketch_estimate(sa)").cast("long").alias("n_a"),
        F.expr("theta_sketch_estimate(sb)").cast("long").alias("n_b"),
        F.expr("theta_sketch_estimate(theta_intersection(sa, sb))")
        .cast("long").alias("n_both"),
        F.expr("theta_sketch_estimate(theta_difference(sa, sb))")
        .cast("long").alias("n_only_a"),
    )


# ------------------------------------------------- count-min sketch

# Count-min parameters: depth d independent hash rows of width w;
# estimate(x) = min over rows of counter[h_i(x)]. Overestimates only;
# error <= e*N/w with prob 1 - e^-d (Cormode & Muthukrishnan 2005).
CMS_DEPTH = 5
CMS_WIDTH = 8192  # 16-bit md5 chunks bound width at 65536


def cms_bucket_cols(value: F.Column, depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH) -> list[F.Column]:
    """The d bucket indexes of a value: ONE md5 per value, hex sliced
    into d disjoint 16-bit chunks (4 nibbles each, d <= 8), each mod
    width. Engine-portable by construction — any engine with md5 and
    hex-to-int reproduces the sketch bit-for-bit (the same trade the
    portable SimHash makes: md5-derived bits over engine xxhash64),
    which is what lets q_cms_topk be DuckDB-oracle-checked. Spark's
    own `count_min_sketch` SQL aggregate is the opaque-binary
    alternative; its bytes have no SQL-level estimate/merge functions
    in Spark 4.1, so this table form IS the repo's mergeable path."""
    if depth > 8:
        raise ValueError("depth > 8 exceeds the 32 md5 nibbles")
    if width > 1 << 16:
        raise ValueError("width > 65536 exceeds a 16-bit chunk")
    mh = F.md5(value.cast("string"))
    return [
        (F.conv(F.substring(mh, 4 * i + 1, 4), 16, 10).cast("bigint")
         % width).alias(f"__b{i}")
        for i in range(depth)
    ]


def shard_cms(df: DataFrame, *, keys: list[str], value: str,
              shard_col: str | None = None, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> DataFrame:
    """Phase 1 (per ingest shard): a count-min sketch of the ``value``
    stream per (shard, *keys) group, as a TABLE of (depth, bucket,
    cnt) rows — at most d*w rows per group regardless of stream size
    (the sketch property), map-side combined by the hash aggregate.
    Persist these kilobyte-scale partials like the HLL/KLL shards."""
    shard = (F.col(shard_col) if shard_col
             else F.spark_partition_id().alias("__shard"))
    # pre-aggregate the raw stream to per-shard DISTINCT values first
    # (map-side combined): the md5 hashing and the d-way explode then
    # run on vocab-sized rows with a weight column, not on every
    # occurrence — at corpus scale that is |vocab| hashes instead of
    # N, and 1/d-th the explode volume feeding the counter aggregate.
    per_value = (
        df.withColumn("__shard", shard)
        .groupBy("__shard", *keys, F.col(value).alias("__v"))
        .agg(F.count("*").alias("__w"))
    )
    buckets = F.array(*cms_bucket_cols(F.col("__v"), depth, width))
    return (
        per_value.select(
            "__shard", *keys, "__w",
            F.posexplode(buckets).alias("depth", "bucket"),
        )
        .groupBy("__shard", *keys, "depth", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def merge_cms(sketches: DataFrame, *, keys: list[str]) -> DataFrame:
    """Phase 2: counter-wise SUM per key group — count-min sketches
    with identical (depth, width, hash) merge by adding counters, a
    plain re-aggregation here because the sketch is a table, not
    bytes. No raw-data rescan; output stays <= d*w rows per group."""
    return (
        sketches.groupBy(*keys, "depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def estimate_cms(cms: DataFrame, items: DataFrame, *, value: str,
                 keys: list[str] | None = None, depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """Point-query the sketch: for each item row, est = min over the d
    rows of its counter (0 when a bucket was never touched). The
    sketch side is parameter-bounded (d*w rows per key group, never
    data-sized), so Spark's planner broadcasts it under AQE — the
    probe is a map-side join plus a d-row min per item."""
    keys = keys or []
    clash = {"depth", "bucket", "cnt", "est"} & set(items.columns)
    if clash:
        raise ValueError(
            f"estimate_cms: rename item columns {sorted(clash)} — they "
            "collide with the sketch-table schema"
        )
    buckets = F.array(*cms_bucket_cols(F.col(value), depth, width))
    probes = items.select(
        *items.columns, F.posexplode(buckets).alias("depth", "bucket")
    )
    joined = probes.join(cms, [*keys, "depth", "bucket"], "left")
    return (
        joined.groupBy(*items.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est"))
    )


def cms_heavy_hitters(df: DataFrame, *, value: str, k: int = 20,
                      depth: int = CMS_DEPTH,
                      width: int = CMS_WIDTH) -> DataFrame:
    """Top-k heavy hitters by CMS estimate: build the sketch in one
    stream pass, then probe it for every DISTINCT value (vocab-sized,
    the classic candidate set when the domain is enumerable) and keep
    the k largest estimates. Returns (value, est, exact, overestimate)
    so callers can see the sketch error directly; ties broken by the
    value for determinism."""
    cms = merge_cms(
        shard_cms(df, keys=[], value=value, depth=depth, width=width),
        keys=[],
    )
    exact = df.groupBy(value).agg(F.count("*").cast("bigint").alias("exact"))
    est = estimate_cms(cms, exact, value=value, depth=depth, width=width)
    return (
        est.select(
            value, "est", "exact",
            (F.col("est") - F.col("exact")).cast("bigint").alias("overestimate"),
        )
        .orderBy(F.desc("est"), F.col(value))
        .limit(k)
    )


def cms_join_size(cms_a: DataFrame, cms_b: DataFrame,
                  *, keys: list[str] | None = None) -> DataFrame:
    """Equi-join CARDINALITY estimate from two count-min sketches of
    the join-key streams — the classic sketch inner product (Cormode &
    Muthukrishnan 2005 §4.2): per depth row, sum over buckets of
    cntA * cntB; the estimate is the min over depths. One-sided like
    the point query: collisions only ADD cross terms, so est >= true
    |A JOIN B| always. This is the planner-grade question — "how big
    is this join going to be?" — answered from kilobyte sketch tables
    WITHOUT running the join or rescanning either side; sketches built
    once per ingest shard serve every later pairing."""
    keys = keys or []
    a = cms_a.withColumnRenamed("cnt", "cnt_a")
    b = cms_b.withColumnRenamed("cnt", "cnt_b")
    per_depth = (
        a.join(b, [*keys, "depth", "bucket"])
        .groupBy(*keys, "depth")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("s"))
    )
    # depth SPINE: a depth whose rows share no bucket at all has inner
    # product 0 and must dominate the min — an inner-join-only form
    # silently drops it and overestimates disjoint-key joins
    depths = cms_a.select(*keys, "depth").distinct()
    return (
        depths.join(per_depth, [*keys, "depth"], "left")
        .groupBy(*keys)
        .agg(F.min(F.coalesce("s", F.lit(0))).cast("bigint")
             .alias("est_pairs"))
    )


# -------------------------------------------- exact bitmap distinct

def shard_bitmaps(df: DataFrame, *, keys: list[str], value: str,
                  shard_col: str | None = None) -> DataFrame:
    """EXACT mergeable distinct-count structure — Spark 3.5+ bitmap
    aggregates (`bitmap_bucket_number` / `bitmap_bit_position` /
    `bitmap_construct_agg`): integer keys set bits in 32k-bit bucket
    bitmaps, one bitmap per (shard, *keys, bucket). Where HLL trades
    exactness for constant size, bitmaps stay EXACT and still merge
    by OR — the right tool when the key domain is dense integers
    (user ids, order keys) and audits demand exact numbers. Size is
    O(domain/8) bytes per key group, vs HLL's fixed KBs — the
    documented trade."""
    shard = (F.col(shard_col) if shard_col
             else F.spark_partition_id().alias("__shard"))
    return (
        df.withColumn("__shard", shard)
        .groupBy(
            "__shard", *keys,
            F.expr(f"bitmap_bucket_number({value})").alias("bucket"),
        )
        .agg(
            F.expr(f"bitmap_construct_agg(bitmap_bit_position({value}))")
            .alias("bm")
        )
    )


def merge_bitmaps(bitmaps: DataFrame, *, keys: list[str]) -> DataFrame:
    """Lossless rollup: OR the shard bitmaps per (keys, bucket), count
    bits, sum across buckets — EXACT distinct counts with no raw-data
    rescan, composable across any later grouping of the same shards."""
    return (
        bitmaps.groupBy(*keys, "bucket")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("nd"))
        .groupBy(*keys)
        .agg(F.sum("nd").cast("bigint").alias("exact_distinct"))
    )
