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
